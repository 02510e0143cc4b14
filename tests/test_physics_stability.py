"""Contact-solver stability soak (regression for the Jacobi divergence).

Pre-fix, this exact seed/config reached the 1000 m/s velocity clamp at step
90 (random-action rollout, rough terrain, N=256: a stair-edge contact
pile-up made the fixed-omega Jacobi solve diverge). The mass-splitting
relaxation (sim/tengine.py, sim/engine.py) keeps clustered-contact states
contractive; the env additionally terminates any env whose base exceeds
physical velocity bounds (go2_env bad_state) so one pathological env can
never poison batch rewards again.
"""
import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.env.config import Go2Cfg
from go2_rl_gym_tpu.env.go2_env import Go2Env


def test_random_action_soak_stays_physical():
    N = 256
    cfg = Go2Cfg()
    cfg.env.num_envs = N
    env = Go2Env(cfg, num_steps_per_env=24)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.init_state)(key)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.normal(k, (N, 12))
            state, out = env.step(state, a)
            stats = jnp.stack([jnp.max(jnp.abs(state.sim.base_lin_vel)),
                               jnp.max(jnp.abs(out.rew))])
            return (state, key), stats
        (state, key), stats = jax.lax.scan(body, (state, key), None, length=100)
        return state, stats

    state, stats = run(state, key)
    s = np.asarray(stats)
    # pre-fix: 194.8 m/s at step 90 (then 1000 at the clamp)
    assert s[:, 0].max() < 30.0, f"base velocity blew up: {s[:, 0].max()}"
    assert np.isfinite(s).all()
    assert s[:, 1].max() < 50.0, f"per-step reward magnitude: {s[:, 1].max()}"
