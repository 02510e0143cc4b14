"""Go2 environment tests: obs layout, reward semantics, resets, commands,
curricula, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.env.config import Go2Cfg
from go2_rl_gym_tpu.env.go2_env import Go2Env


def small_cfg(plane=True, num_envs=8):
    cfg = Go2Cfg()
    cfg.env.num_envs = num_envs
    if plane:
        cfg.terrain.mesh_type = "plane"
        cfg.terrain.measure_heights = False
        cfg.terrain.curriculum = False
    else:
        cfg.terrain.num_rows = 3
        cfg.terrain.num_cols = 9
        cfg.terrain.border_size = 3.0
    return cfg


@pytest.fixture(scope="module")
def plane_env():
    return Go2Env(small_cfg(plane=True))


@pytest.fixture(scope="module")
def rough_env():
    return Go2Env(small_cfg(plane=False))


@pytest.fixture(scope="module")
def plane_rollout(plane_env):
    env = plane_env
    key = jax.random.PRNGKey(0)
    s = env.init_state(key)
    step = jax.jit(env.step)
    outs = []
    for i in range(8):
        s, out = step(s, jnp.zeros((env.num_envs, 12)))
        outs.append(out)
    return s, outs


def test_obs_dimensions(plane_rollout, plane_env):
    s, outs = plane_rollout
    assert outs[-1].obs.shape == (plane_env.num_envs, 45)
    assert outs[-1].privileged_obs.shape == (plane_env.num_envs, 263)
    assert bool(jnp.isfinite(outs[-1].obs).all())
    assert bool(jnp.isfinite(outs[-1].privileged_obs).all())


def test_obs_layout(plane_env):
    """Privileged obs embeds the actor obs at [3:48] (go2_env.py:26-47):
    priv = [lin_vel*2 | obs(45) | foot_f(4) | torques(12) | acc(12) | h(187)].
    Actor obs carries noise, so compare the noise-free command slice."""
    env = plane_env
    s = env.init_state(jax.random.PRNGKey(1))
    s, out = jax.jit(env.step)(s, jnp.zeros((env.num_envs, 12)))
    # commands slice is noise-free in both (noise vec zero there)
    np.testing.assert_allclose(out.obs[:, 6:9], out.privileged_obs[:, 9:12],
                               atol=1e-6)
    # actions slice (zero actions, zero noise)
    np.testing.assert_allclose(out.obs[:, 33:45],
                               out.privileged_obs[:, 36:48], atol=1e-6)


def test_determinism(plane_env):
    env = plane_env
    step = jax.jit(env.step)

    def run(seed):
        s = env.init_state(jax.random.PRNGKey(seed))
        for i in range(5):
            s, out = step(s, jnp.full((env.num_envs, 12), 0.1))
        return out.obs

    o1, o2 = run(7), run(7)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = run(8)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_timeout_termination(plane_env):
    env = plane_env
    s = env.init_state(jax.random.PRNGKey(2))
    # push all envs to the brink of timeout
    s = s._replace(episode_length=jnp.full((env.num_envs,),
                                           env.max_episode_length, jnp.int32))
    s, out = jax.jit(env.step)(s, jnp.zeros((env.num_envs, 12)))
    assert bool(out.done.all())
    assert bool(out.time_outs.all())
    # lengths reset
    assert bool((s.episode_length == 0).all())


def test_reset_zeroes_buffers(plane_env):
    env = plane_env
    s = env.init_state(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for i in range(3):
        s, _ = step(s, jnp.ones((env.num_envs, 12)))
    s = s._replace(episode_length=jnp.full((env.num_envs,),
                                           env.max_episode_length, jnp.int32))
    s, out = step(s, jnp.ones((env.num_envs, 12)))
    assert bool((jnp.abs(s.actions) < 1e-9).all())
    assert bool((jnp.abs(s.commands_xy_accum)
                 <= jnp.abs(s.commands[:, :2]) + 1e-6).all())
    # dof positions re-randomized around default * U(0.5, 1.5)
    ratio = s.sim.q / env.default_dof_pos
    assert bool(((ratio > 0.45) & (ratio < 1.55)).all())


def test_commands_within_ranges(rough_env):
    env = rough_env
    s = env.init_state(jax.random.PRNGKey(4))
    # initial ranges (pre-curriculum) are +-0.5 x/y, +-1.0 yaw; terrain caps
    # can only shrink them
    assert bool((jnp.abs(s.commands[:, 0]) <= 0.5 + 1e-5).all())
    assert bool((jnp.abs(s.commands[:, 1]) <= 0.5 + 1e-5).all())
    assert bool((jnp.abs(s.commands[:, 2]) <= 1.0 + 1e-5).all())


def test_command_range_curriculum(rough_env):
    env = rough_env
    it0 = jnp.asarray(0)
    r0 = env._command_ranges(it0, jnp.asarray([-0.5, 0.5]))
    np.testing.assert_allclose(r0[0], [-0.5, 0.5])
    r1 = env._command_ranges(jnp.asarray(20000), jnp.asarray([-0.5, 0.5]))
    np.testing.assert_allclose(r1[0], [-1.0, 1.0])
    r2 = env._command_ranges(jnp.asarray(50000), jnp.asarray([-0.5, 0.5]))
    np.testing.assert_allclose(r2[0], [-2.0, 2.0])
    np.testing.assert_allclose(r2[2], [-2.0, 2.0])


def test_reward_curriculum_interp(rough_env):
    env = rough_env
    # lin_vel_z: 1.0 -> 0.0 over 1500 iters (go2_config.py:162)
    s0 = env._reward_curriculum_scale("lin_vel_z", jnp.asarray(0))
    s750 = env._reward_curriculum_scale("lin_vel_z", jnp.asarray(750))
    s2000 = env._reward_curriculum_scale("lin_vel_z", jnp.asarray(2000))
    assert float(s0) == pytest.approx(1.0)
    assert float(s750) == pytest.approx(0.5)
    assert float(s2000) == pytest.approx(0.0)
    # correct_base_height: 1 -> 10 over 5000
    c = env._reward_curriculum_scale("correct_base_height", jnp.asarray(5000))
    assert float(c) == pytest.approx(10.0)


def test_zero_command_curriculum(rough_env):
    env = rough_env
    assert float(env._zero_command_proba(jnp.asarray(0))) == pytest.approx(0.0)
    assert float(env._zero_command_proba(jnp.asarray(1500))) == pytest.approx(0.1)


def test_reward_scales_dt_multiplied(plane_env):
    assert plane_env.reward_scales["tracking_lin_vel"] == pytest.approx(
        1.0 * plane_env.dt)
    assert "termination" not in plane_env.reward_scales


def test_terrain_levels_and_types(rough_env):
    env = rough_env
    s = env.init_state(jax.random.PRNGKey(5))
    assert bool((s.terrain_levels <= env.cfg.terrain.max_init_terrain_level).all())
    assert bool((s.terrain_types < env.cfg.terrain.num_cols).all())
    # per-terrain command caps applied: stairs columns cap lin_vel_x at 1.0
    caps = np.asarray(env.terrain_cmd_caps)
    assert caps[3, 0, 1] == 1.0 and caps[8, 0, 1] == 2.0


def test_metrics_structure(plane_rollout, plane_env):
    s, outs = plane_rollout
    m = outs[-1].metrics
    assert "done_count" in m
    assert any(k.startswith("rew_") for k in m)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_standing_with_pd_yields_positive_tracking(plane_env):
    """Zero actions (= PD to default pose) on a standing robot should earn
    tracking reward when commands are ~0 and penalties stay bounded."""
    env = plane_env
    s = env.init_state(jax.random.PRNGKey(6))
    # zero commands for a clean check
    s = s._replace(commands=jnp.zeros_like(s.commands))
    step = jax.jit(env.step)
    total = 0.0
    for i in range(25):
        s, out = step(s, jnp.zeros((env.num_envs, 12)))
        total += float(out.rew.mean())
    assert np.isfinite(total)
    # standing still with zero commands: tracking_lin_vel ~ exp(0) each step
    sums = s.episode_sums["tracking_lin_vel"]
    assert float(sums.mean()) > 0.0


def test_per_terrain_command_caps_clip(rough_env):
    """Curriculum-mode per-terrain-type caps (legged_robot.py:861-907) must
    clip the late-curriculum global ranges per type: at iteration 60k the
    global lin_vel_x range is [-2, 2], but stairs/obstacle/gap types cap at
    [-1, 1] and wave/slope at [-1.5, 1.5] (config terrain_max_command_ranges).
    Both the computed per-env ranges AND freshly resampled commands must obey
    the caps."""
    env = rough_env
    caps = np.asarray(env.terrain_cmd_caps)          # (n_types, 4, 2)
    s = env.init_state(jax.random.PRNGKey(7))
    it = jnp.asarray(60000)
    ranges = env._command_ranges(it, s.cmd_range_x)
    assert float(ranges[0, 1]) == 2.0                # global opened up
    env_ranges = np.asarray(env._env_command_ranges(ranges, s.terrain_ids))
    tid = np.asarray(s.terrain_ids)
    # per-env ranges equal min(global, cap) per type
    np.testing.assert_allclose(env_ranges[:, 0, 1],
                               np.minimum(2.0, caps[tid, 0, 1]), atol=1e-6)
    np.testing.assert_allclose(env_ranges[:, 0, 0],
                               np.maximum(-2.0, caps[tid, 0, 0]), atol=1e-6)
    # sampled commands at that iteration respect the caps per terrain type
    s = s._replace(common_step_counter=jnp.asarray(
        60000 * env.num_steps_per_env, jnp.int32))
    s2 = env._resample_commands(s, jnp.ones(env.num_envs, bool),
                                jax.random.PRNGKey(8))
    cmd = np.asarray(s2.commands)
    assert (np.abs(cmd[:, 0]) <= caps[tid, 0, 1] + 1e-5).all()
    assert (np.abs(cmd[:, 1]) <= caps[tid, 1, 1] + 1e-5).all()


def test_velocity_failsafe_below_engine_clamps(plane_env):
    """A solver blow-up is CLAMPED by the engine at SimParams.max_*_velocity,
    so the env's bad-state failsafe must trip strictly BELOW those clamps —
    otherwise a runaway env cruises at the clamp forever, never terminates,
    and poisons the batch with unbounded correct_base_height penalties (the
    r5 flagship reward-collapse incident)."""
    env = plane_env
    key = jax.random.PRNGKey(3)
    s = env.init_state(key)
    s, _ = env.step(s, jnp.zeros((env.num_envs, 12)))
    # inject a base velocity AT the engine clamp into env 0
    clamp_v = env.sim_params.max_linear_velocity
    lin = s.sim.base_lin_vel.at[0, 0].set(clamp_v)
    s = s._replace(sim=s.sim._replace(base_lin_vel=lin))
    s2, out = env.step(s, jnp.zeros((env.num_envs, 12)))
    assert bool(out.done[0]), (
        f"env at the engine velocity clamp ({clamp_v} m/s) must hit the "
        "bad-state failsafe and terminate")
