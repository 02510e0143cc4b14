"""T-layout engine must match the reference N-major engine bit-for-nearly-bit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.sim import engine, tengine
from go2_rl_gym_tpu.sim.model import go2_model

DEFAULT_Q = jnp.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                       0.1, 1.0, -1.5, -0.1, 1.0, -1.5])


@pytest.fixture(scope="module")
def setup():
    model = go2_model()
    params = engine.SimParams()
    terrain = engine.flat_terrain()
    layout = engine.quad_layout(model)
    return model, params, terrain, layout


def rand_states(key, N):
    ks = jax.random.split(key, 6)
    pos = jnp.array([0.0, 0.0, 0.34]) + 0.05 * jax.random.normal(ks[0], (N, 3))
    quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1))
    quat = quat + 0.05 * jax.random.normal(ks[1], (N, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = DEFAULT_Q + 0.2 * jax.random.normal(ks[2], (N, 12))
    return engine.SimState(
        base_pos=pos, base_quat=quat, q=q,
        base_lin_vel=0.3 * jax.random.normal(ks[3], (N, 3)),
        base_ang_vel=0.3 * jax.random.normal(ks[4], (N, 3)),
        qd=0.5 * jax.random.normal(ks[5], (N, 12)))


def test_physics_step_matches_vmap_engine(setup):
    """One decimated step: T-layout batch path vs per-env vmap path."""
    model, params, terrain, layout = setup
    # deep solver: with enough iterations both paths converge to the same
    # contact solution, making warm-starting (T path only) irrelevant
    params = params._replace(solver_iters=30)
    N, DEC = 8, 4
    key = jax.random.PRNGKey(0)
    state = rand_states(key, N)
    dyn = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N,) + x.shape) + 0.0,
        engine.default_dyn_params(model))
    targets = jnp.broadcast_to(DEFAULT_Q, (DEC, N, 12)) + 0.05
    kp = jnp.full((N, 12), 20.0)
    kd = jnp.full((N, 12), 0.5)
    ones = jnp.ones((N, 12))
    zeros = jnp.zeros((N, 12))

    step_t = jax.jit(tengine.make_physics_step(model, params, terrain, DEC))
    s_t, out_t, tau_t, _ = step_t(dyn, state, targets, kp, kd, ones, zeros)

    # reference path: vmapped substep with identical torque law
    effort = jnp.asarray(model.dof_effort_limit, jnp.float32)
    bsub = engine.make_batched_substep(model, params, terrain)

    s_r = state
    for i in range(DEC):
        tau = jnp.clip(kp * (targets[i] - s_r.q) - kd * s_r.qd,
                       -effort, effort)
        s_r, out_r = bsub(dyn, s_r, tau, kd)

    np.testing.assert_allclose(np.asarray(s_t.base_pos),
                               np.asarray(s_r.base_pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_t.q), np.asarray(s_r.q),
                               atol=2e-3)
    # qd is the most divergence-amplified quantity (f32, 4 contact-rich
    # substeps); 0.1 rad/s on O(5 rad/s) values
    np.testing.assert_allclose(np.asarray(s_t.qd), np.asarray(s_r.qd),
                               atol=0.1)
    np.testing.assert_allclose(np.asarray(s_t.base_quat),
                               np.asarray(s_r.base_quat), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_t.contact_forces),
                               np.asarray(out_r.contact_forces),
                               atol=2.0, rtol=0.05)
    np.testing.assert_allclose(np.asarray(out_t.foot_pos),
                               np.asarray(out_r.foot_pos), atol=1e-3)


def test_tlayout_standing(setup):
    """Drop + PD hold through the T path: settles with Fz == weight."""
    model, params, terrain, layout = setup
    N, DEC = 4, 4
    state = engine.SimState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.42]), (N, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        q=jnp.tile(DEFAULT_Q, (N, 1)),
        base_lin_vel=jnp.zeros((N, 3)), base_ang_vel=jnp.zeros((N, 3)),
        qd=jnp.zeros((N, 12)))
    dyn = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N,) + x.shape) + 0.0,
        engine.default_dyn_params(model))
    kp = jnp.full((N, 12), 20.0)
    kd = jnp.full((N, 12), 0.5)
    ones = jnp.ones((N, 12))
    zeros = jnp.zeros((N, 12))
    targets = jnp.broadcast_to(DEFAULT_Q, (DEC, N, 12))

    step_t = jax.jit(tengine.make_physics_step(model, params, terrain, DEC))
    s = state
    for _ in range(150):   # 3 s
        s, out, tau, _ = step_t(dyn, s, targets, kp, kd, ones, zeros)
    assert bool(jnp.isfinite(s.base_pos).all())
    fz = np.asarray(out.contact_forces[:, :, 2].sum(axis=1)
                    + out.foot_forces[:, :, 2].sum(axis=1))
    np.testing.assert_allclose(fz, 15.019 * 9.81, rtol=0.03)
    assert np.all(np.asarray(s.base_pos[:, 2]) > 0.2)


def test_patch_path_matches_global_gather(setup):
    """Rough terrain: the patch-based fast path must reproduce the
    global-gather path (same hmin/slope semantics)."""
    model, params, _, layout = setup
    import numpy as _np
    from go2_rl_gym_tpu.sim.engine import make_terrain_data, TerrainData

    rng = _np.random.default_rng(0)
    hf = (rng.normal(0, 0.02, (256, 256))
          + 0.1 * _np.sin(_np.arange(256) * 0.2)[:, None]).astype(_np.float32)
    t_patch = make_terrain_data(hf, 0.1, 0.0, with_channels=True)
    t_gather = TerrainData(height=t_patch.height, horizontal_scale=0.1,
                           border_offset=0.0, is_flat=False, channels=None)

    N, DEC = 8, 4
    state = rand_states(jax.random.PRNGKey(5), N)
    state = state._replace(
        base_pos=state.base_pos + jnp.array([12.0, 12.0, 0.0]))
    dyn = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N,) + x.shape) + 0.0,
        engine.default_dyn_params(model))
    targets = jnp.broadcast_to(DEFAULT_Q, (DEC, N, 12)) + 0.0
    kp = jnp.full((N, 12), 20.0)
    kd = jnp.full((N, 12), 0.5)
    ones = jnp.ones((N, 12))
    zeros = jnp.zeros((N, 12))

    s_p, out_p, _, pd = jax.jit(tengine.make_physics_step(
        model, params, t_patch, DEC))(dyn, state, targets, kp, kd, ones, zeros)
    assert pd is not None
    s_g, out_g, _, pdg = jax.jit(tengine.make_physics_step(
        model, params, t_gather, DEC))(dyn, state, targets, kp, kd, ones, zeros)
    assert pdg is None

    np.testing.assert_allclose(np.asarray(s_p.base_pos),
                               np.asarray(s_g.base_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_g.q),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_p.foot_pos),
                               np.asarray(out_g.foot_pos), atol=1e-2)
