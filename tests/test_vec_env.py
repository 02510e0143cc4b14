"""VecEnv adapter: reference-style stateful interface over the pure env."""
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.env.config import Go2Cfg
from go2_rl_gym_tpu.env.go2_env import Go2Env
from go2_rl_gym_tpu.env.vec_env import VecEnvAdapter


def test_vec_env_contract():
    cfg = Go2Cfg()
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    env = VecEnvAdapter(Go2Env(cfg), seed=0)

    assert env.num_obs == 45
    assert env.num_privileged_obs == 263
    assert env.num_actions == 12
    obs = env.get_observations()
    priv = env.get_privileged_observations()
    assert obs.shape == (4, 45) and priv.shape == (4, 263)

    obs2, priv2, rew, done, extras = env.step(jnp.zeros((4, 12)))
    assert obs2.shape == (4, 45)
    assert rew.shape == (4,) and done.shape == (4,)
    assert "time_outs" in extras and "episode" in extras
    assert bool(jnp.isfinite(obs2).all())
    # episode length advances and is settable (init_at_random_ep_len pattern)
    assert int(env.episode_length_buf.max()) >= 1
    env.episode_length_buf = jnp.zeros(4, jnp.int32)
    assert int(env.episode_length_buf.max()) == 0
