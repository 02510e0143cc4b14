"""Physics-engine correctness tests: free fall, standing equilibrium, energy,
momentum sanity, terrain contact, structured solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.sim import engine
from go2_rl_gym_tpu.sim.model import go2_model

DEFAULT_Q = jnp.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                       0.1, 1.0, -1.5, -0.1, 1.0, -1.5])
KP, KD = 20.0, 0.5


@pytest.fixture(scope="module")
def model():
    return go2_model()


@pytest.fixture(scope="module")
def setup(model):
    params = engine.SimParams()
    terrain = engine.flat_terrain()
    layout = engine.quad_layout(model)
    dyn = engine.default_dyn_params(model)
    return params, terrain, layout, dyn


def make_state(z=0.42, q=DEFAULT_Q):
    return engine.SimState(
        base_pos=jnp.array([0.0, 0.0, z]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        q=q,
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        qd=jnp.zeros(12),
    )


def test_model_parse(model):
    assert model.nb == 13
    assert model.num_joints == 12
    np.testing.assert_allclose(model.mass.sum(), 15.019, atol=1e-3)
    assert model.dof_names[0] == "FL_hip_joint"
    assert model.dof_names[3] == "FR_hip_joint"
    np.testing.assert_allclose(
        model.dof_effort_limit, [23.7, 23.7, 35.55] * 4, atol=1e-6)
    assert len(model.foot_geom_idx) == 4


def test_free_fall(model, setup):
    params, terrain, layout, dyn = setup
    state = make_state(z=3.0)
    si, bias, R = engine.mass_matrix_and_bias(
        model and layout, params, dyn, state, jnp.zeros(12))
    du = engine.structured_solve(si, -bias)
    # base linear acceleration in base frame == gravity, joints ~0
    # (small armature causes a tiny deviation)
    np.testing.assert_allclose(du[3:6], [0.0, 0.0, -9.81], atol=5e-3)
    np.testing.assert_allclose(du[:3], 0.0, atol=5e-3)
    np.testing.assert_allclose(du[6:], 0.0, atol=5e-2)


def test_mass_matrix_symmetric_pd(model, setup):
    params, terrain, layout, dyn = setup
    key = jax.random.PRNGKey(0)
    q = DEFAULT_Q + 0.3 * jax.random.normal(key, (12,))
    state = make_state(z=1.0, q=q)
    si, _, _ = engine.mass_matrix_and_bias(layout, params, dyn, state, jnp.zeros(12))
    H = np.array(engine.dense_mass_matrix(si))
    np.testing.assert_allclose(H, H.T, atol=1e-4)
    eigs = np.linalg.eigvalsh(H)
    assert eigs.min() > 0, f"H not PD: min eig {eigs.min()}"
    # total mass appears in the linear-linear block
    np.testing.assert_allclose(H[3:6, 3:6], 15.019 * np.eye(3), atol=1e-3)


def test_structured_solve_matches_dense(model, setup):
    params, terrain, layout, dyn = setup
    state = make_state(z=1.0, q=DEFAULT_Q + 0.1)
    si, bias, _ = engine.mass_matrix_and_bias(layout, params, dyn, state, jnp.zeros(12))
    H = np.array(engine.dense_mass_matrix(si), np.float64)
    rhs = np.array(jax.random.normal(jax.random.PRNGKey(1), (18, 5)), np.float64)
    x_struct = np.array(engine.structured_solve(si, jnp.asarray(rhs, jnp.float32)))
    x_dense = np.linalg.solve(H, rhs)
    np.testing.assert_allclose(x_struct, x_dense, atol=1e-3, rtol=1e-3)


def test_standing_equilibrium(model, setup):
    """Drop from 0.42 m with PD hold -> settles; total Fz == weight."""
    params, terrain, layout, dyn = setup
    effort = jnp.asarray(model.dof_effort_limit, jnp.float32)

    @jax.jit
    def step(s):
        tau = jnp.clip(KP * (DEFAULT_Q - s.q) - KD * s.qd, -effort, effort)
        return engine.substep(model, layout, params, dyn, terrain, s, tau,
                              jnp.full(12, KD))

    s = make_state()
    for _ in range(600):
        s, out = step(s)
    assert bool(jnp.isfinite(s.base_pos).all())
    # ground reaction = foot forces + non-foot body contact (foot geoms are
    # excluded from contact_forces, matching the reference's separate foot
    # rigid bodies)
    fz = float(out.foot_forces[:, 2].sum() + out.contact_forces[:, 2].sum())
    np.testing.assert_allclose(fz, 15.019 * 9.81, rtol=0.02)
    # feet-only stance must report ZERO per-body contact force — a foot
    # force leaking into the calf body fires the collision penalty on every
    # stance step and makes standing negative-reward (the round-3 learning
    # collapse; reference keeps feet as separate bodies via dont_collapse)
    assert float(jnp.abs(out.contact_forces).max()) < 1e-3
    assert float(jnp.abs(s.qd).max()) < 0.1
    assert 0.2 < float(s.base_pos[2]) < 0.35
    assert float(jnp.abs(s.base_quat[:3]).max()) < 0.05
    assert bool(jnp.all(out.foot_forces[:, 2] > 5.0))


def test_energy_conservation_no_contact(model, setup):
    """Zero gravity + no contact + no torque: kinetic energy ~ conserved."""
    params, terrain, layout, dyn = setup
    params0 = params._replace(gravity=0.0, armature=0.0)
    key = jax.random.PRNGKey(3)
    s = make_state(z=5.0)
    s = s._replace(qd=0.5 * jax.random.normal(key, (12,)),
                   base_ang_vel=jnp.array([0.2, -0.1, 0.3]),
                   base_lin_vel=jnp.array([0.1, 0.2, 0.0]))

    def energy(s):
        si, _, _ = engine.mass_matrix_and_bias(layout, params0, dyn, s, jnp.zeros(12))
        H = engine.dense_mass_matrix(si)
        Rb = engine.maths.quat_to_matrix(s.base_quat)
        u = jnp.concatenate([Rb.T @ s.base_ang_vel, Rb.T @ s.base_lin_vel, s.qd])
        return 0.5 * u @ H @ u

    @jax.jit
    def step(s):
        return engine.substep(model, layout, params0, dyn, terrain, s,
                              jnp.zeros(12), jnp.zeros(12))

    e0 = float(energy(s))
    for _ in range(200):
        s, _ = step(s)
    e1 = float(energy(s))
    assert abs(e1 - e0) / (abs(e0) + 1e-9) < 0.05, (e0, e1)


def test_linear_momentum_free_flight(model, setup):
    """In free flight, COM acceleration == g regardless of joint flailing."""
    params, terrain, layout, dyn = setup
    s = make_state(z=10.0)
    s = s._replace(qd=jnp.ones(12) * 2.0)

    @jax.jit
    def step(s):
        return engine.substep(model, layout, params, dyn, terrain, s,
                              jnp.zeros(12), jnp.zeros(12))

    def com(s):
        R, p, w, v, _, _ = engine.forward_kinematics(layout, s)
        masses = jnp.asarray(model.mass, jnp.float32)
        coms = p + jnp.einsum("bij,bj->bi", R, jnp.asarray(model.com, jnp.float32))
        return jnp.sum(masses[:, None] * coms, 0) / masses.sum()

    c0 = com(s)
    n = 100
    for _ in range(n):
        s, _ = step(s)
    c1 = com(s)
    t = n * params.dt
    np.testing.assert_allclose(float(c0[2] - c1[2]), 0.5 * 9.81 * t * t, rtol=0.05)


def test_fk_leg_batched_consistency(model, setup):
    """FK body order/positions: feet below base at default pose, symmetric y."""
    params, terrain, layout, dyn = setup
    s = make_state(z=0.42)
    R, p, w, v, axis_w, jpos = engine.forward_kinematics(layout, s)
    # FL hip at +0.1934 x, +0.0465 y; FL thigh adds 0.0955*cos(q_hip) in y
    np.testing.assert_allclose(p[1][:2], [0.1934, 0.0465], atol=1e-6)
    np.testing.assert_allclose(
        p[2][:2], [0.1934, 0.0465 + 0.0955 * np.cos(0.1)], atol=1e-5)
    # FL/FR symmetric in y
    np.testing.assert_allclose(p[1][0], p[4][0], atol=1e-6)
    np.testing.assert_allclose(p[1][1], -p[4][1], atol=1e-6)
    # feet (calf末端): gather foot geom positions
    gpos, gvel = engine.geom_positions(model, R, p, w, v)
    feet = gpos[model.foot_geom_idx]
    assert bool(jnp.all(feet[:, 2] < 0.15))
    np.testing.assert_allclose(feet[0, 1], -feet[1, 1], atol=1e-5)


def test_sloped_terrain_standing(model, setup):
    """Robot dropped on a 15-deg ramp holds position under friction."""
    params, _, layout, dyn = setup
    n = 256
    xs = np.arange(n) * 0.1
    hf = np.tile((-np.tan(0.26) * xs)[:, None], (1, n)).astype(np.float32)
    terrain = engine.TerrainData(height=jnp.asarray(hf), horizontal_scale=0.1,
                                 border_offset=0.0, is_flat=False)
    effort = jnp.asarray(model.dof_effort_limit, jnp.float32)

    @jax.jit
    def step(s):
        tau = jnp.clip(KP * (DEFAULT_Q - s.q) - KD * s.qd, -effort, effort)
        return engine.substep(model, layout, params, dyn, terrain, s, tau,
                              jnp.full(12, KD))

    z0 = float(engine.terrain_height(terrain, jnp.array([12.8, 12.8])))
    s = engine.SimState(jnp.array([12.8, 12.8, z0 + 0.42]),
                        jnp.array([0.0, 0.0, 0.0, 1.0]), DEFAULT_Q,
                        jnp.zeros(3), jnp.zeros(3), jnp.zeros(12))
    for _ in range(400):
        s, out = step(s)
    assert bool(jnp.isfinite(s.base_pos).all())
    assert float(jnp.linalg.norm(s.base_pos[:2] - jnp.array([12.8, 12.8]))) < 0.5
    assert float(out.foot_forces[:, 2].sum()
                 + out.contact_forces[:, 2].sum()) > 100.0


def test_heightfield_min_of_three():
    hf = jnp.array([[0.0, 1.0], [2.0, 3.0]], jnp.float32)
    terrain = engine.TerrainData(height=hf, horizontal_scale=1.0,
                                 border_offset=0.0, is_flat=False)
    h = engine.terrain_height(terrain, jnp.array([0.5, 0.5]))
    assert float(h) == 0.0


def test_batched_substep_matches_single(model, setup):
    params, terrain, layout, dyn = setup
    bstep = engine.make_batched_substep(model, params, terrain)
    s = make_state()
    tau = jnp.ones(12) * 0.5
    single, _ = engine.substep(model, layout, params, dyn, terrain, s, tau,
                               jnp.full(12, KD))
    N = 4
    bs = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), s)
    bdyn = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), dyn)
    batched, _ = bstep(bdyn, bs, jnp.broadcast_to(tau, (N, 12)),
                       jnp.broadcast_to(jnp.full(12, KD), (N, 12)))
    np.testing.assert_allclose(batched.base_pos[2], single.base_pos, atol=1e-5)
    np.testing.assert_allclose(batched.q[1], single.q, atol=1e-5)


def test_joint_limits_respected(model, setup):
    """Strong constant torque cannot push joints far past URDF limits."""
    params, terrain, layout, dyn = setup
    s = make_state(z=5.0)

    @jax.jit
    def step(s):
        tau = jnp.full(12, 23.0)
        return engine.substep(model, layout, params, dyn, terrain, s, tau,
                              jnp.zeros(12))

    for _ in range(400):
        s, _ = step(s)
    hi = jnp.asarray(go2_model().dof_upper, jnp.float32)
    assert bool(jnp.all(s.q < hi + 0.5)), np.array(s.q - hi)
