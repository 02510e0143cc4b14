"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.distributed import mesh as mesh_lib
from go2_rl_gym_tpu.env.config import Go2Cfg, go2_cts_train_cfg, go2_ppo_train_cfg
from go2_rl_gym_tpu.env.go2_env import Go2Env
from go2_rl_gym_tpu.train.runner import OnPolicyRunner


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return jax.devices()[:8]


def _tiny_setup(train_cfg, num_envs=16):
    cfg = Go2Cfg()
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    train_cfg.runner.num_steps_per_env = 4
    env = Go2Env(cfg, num_steps_per_env=4)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    return env, runner, rs


def test_sharded_ppo_train_step(eight_devices):
    env, runner, rs = _tiny_setup(go2_ppo_train_cfg())
    mesh = mesh_lib.make_mesh(8)
    rs = mesh_lib.shard_runner_state(mesh, rs, env.num_envs)
    # env-batch leaves really are sharded over 8 devices
    assert len(rs.obs.sharding.device_set) == 8
    step = mesh_lib.make_sharded_train_step(runner, mesh, rs)
    rs2, metrics = step(rs)
    jax.block_until_ready(rs2.train_state)
    for k, v in metrics.items():
        if hasattr(v, "ndim") and v.ndim == 0:
            assert np.isfinite(float(v)), k
    # params stay replicated
    p = jax.tree.leaves(rs2.train_state.params)[0]
    assert len(p.sharding.device_set) in (1, 8)


def test_sharded_cts_train_step(eight_devices):
    env, runner, rs = _tiny_setup(go2_cts_train_cfg())
    mesh = mesh_lib.make_mesh(8)
    rs = mesh_lib.shard_runner_state(mesh, rs, env.num_envs)
    step = mesh_lib.make_sharded_train_step(runner, mesh, rs)
    rs2, metrics = step(rs)
    jax.block_until_ready(rs2.train_state)
    assert np.isfinite(float(metrics["latent_loss"]))


def test_sharded_matches_single_device(eight_devices):
    """The sharded train step must compute the same result as unsharded
    (same program, different partitioning)."""
    env, runner, rs = _tiny_setup(go2_ppo_train_cfg())
    rs_single, m_single = jax.jit(runner._build_train_step())(rs)

    mesh = mesh_lib.make_mesh(8)
    rs_sh = mesh_lib.shard_runner_state(mesh, rs, env.num_envs)
    step = mesh_lib.make_sharded_train_step(runner, mesh, rs_sh)
    rs_multi, m_multi = step(rs_sh)

    np.testing.assert_allclose(float(m_single["value_loss"]),
                               float(m_multi["value_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(m_single["surrogate_loss"]),
                               float(m_multi["surrogate_loss"]),
                               rtol=1e-3, atol=1e-4)
    # parameters after one update agree
    p1 = jax.tree.leaves(rs_single.train_state.params)[0]
    p2 = jax.tree.leaves(rs_multi.train_state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               atol=5e-5, rtol=1e-4)
