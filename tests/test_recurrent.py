"""Recurrent actor-critic + trajectory padding utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.agents import recurrent


def test_lstm_actor_critic_forward():
    model = recurrent.ActorCriticRecurrent(
        num_actions=12, actor_hidden_dims=(32,), critic_hidden_dims=(32,),
        rnn_hidden_size=64)
    state_a = recurrent.Memory.zero_state(4, 64)
    state_c = recurrent.Memory.zero_state(4, 64)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 45)),
                        jnp.zeros((4, 263)), state_a, state_c)
    mu, std, v, sa, sc = model.apply(params, jnp.ones((4, 45)),
                                     jnp.ones((4, 263)), state_a, state_c)
    assert mu.shape == (4, 12) and v.shape == (4,)
    # memory actually evolves
    mu2, _, _, sa2, _ = model.apply(params, jnp.ones((4, 45)),
                                    jnp.ones((4, 263)), sa, sc)
    assert not np.allclose(np.asarray(mu), np.asarray(mu2))
    # reset zeroes state for done envs
    dones = jnp.array([True, False, False, True])
    sr = recurrent.ActorCriticRecurrent.reset_state(sa2, dones)
    assert float(jnp.abs(sr.h[0]).max()) == 0.0
    assert float(jnp.abs(sr.h[1]).max()) > 0.0


def test_split_and_pad_roundtrip():
    T, N = 6, 3
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, N, 4))
    dones = jnp.zeros((T, N), bool).at[2, 0].set(True).at[4, 2].set(True)
    padded, mask = recurrent.split_and_pad_trajectories(x, dones)
    # every original sample lands exactly once
    assert int(mask.sum()) == T * N
    back = recurrent.unpad_trajectories(padded, dones)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)
    # env 0's first trajectory has length 3 (steps 0..2)
    lens = np.asarray(mask.sum(0))
    assert 3 in lens and 5 in lens


def test_padded_trajectories_are_contiguous():
    T, N = 5, 2
    x = jnp.arange(T * N, dtype=jnp.float32).reshape(T, N, 1)
    dones = jnp.zeros((T, N), bool).at[1, 0].set(True)
    padded, mask = recurrent.split_and_pad_trajectories(x, dones)
    m = np.asarray(mask)
    for j in range(m.shape[1]):
        col = m[:, j]
        if col.any():
            first_false = np.argmin(col) if not col.all() else len(col)
            assert not col[first_false:].any(), "non-contiguous padding"


# ---------------------------------------------------------------------------
# Recurrent PPO training path (agents/recurrent_ppo.py + runner wiring)
# ---------------------------------------------------------------------------


def test_replay_reproduces_rollout():
    """The update's sequence replay must regenerate the rollout's exact
    mu/std/values at unchanged params — the invariant that makes the
    TPU-first replay equivalent to the reference's stored-hidden-state
    padded minibatching (rollout_storage.py:186-235)."""
    from go2_rl_gym_tpu.agents.recurrent_ppo import RecurrentPPO
    from go2_rl_gym_tpu.env.config import AlgorithmCfg, PolicyCfg

    T, N, num_obs, num_priv = 7, 5, 9, 11
    pc = PolicyCfg(actor_hidden_dims=(32,), critic_hidden_dims=(32,),
                   rnn_hidden_size=16)
    alg = RecurrentPPO(num_obs, num_priv, 3, pc, AlgorithmCfg())
    key = jax.random.PRNGKey(0)
    ts = alg.init(key)

    mem0 = alg.zero_memory(N)
    obs = jax.random.normal(jax.random.PRNGKey(1), (T, N, num_obs))
    priv = jax.random.normal(jax.random.PRNGKey(2), (T, N, num_priv))
    dones = (jax.random.uniform(jax.random.PRNGKey(3), (T, N)) < 0.2)

    # rollout-style loop with per-step reset (as the runner does)
    mem = mem0
    mus, stds, vals = [], [], []
    for t in range(T):
        _, v, _, mu, std, mem = alg.act(ts.params, jax.random.PRNGKey(9),
                                        obs[t], priv[t], mem)
        mus.append(mu); stds.append(std); vals.append(v)
        mem = alg.reset_memory(mem, dones[t])

    mu_r, std_r, v_r = alg._replay(ts.params, obs, priv,
                                   dones.astype(jnp.float32), mem0)
    np.testing.assert_allclose(np.asarray(mu_r), np.stack(mus), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_r), np.stack(vals), atol=1e-5)


def test_go2_lstm_task_trains():
    """go2_lstm end-to-end: fused train step runs, losses finite, and the
    carried LSTM state is live (non-zero) after training."""
    from go2_rl_gym_tpu.env.config import Go2Cfg, go2_lstm_train_cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env
    from go2_rl_gym_tpu.train.runner import OnPolicyRunner

    cfg = Go2Cfg()
    cfg.env.num_envs = 16
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    tc = go2_lstm_train_cfg()
    tc.runner.num_steps_per_env = 4
    tc.algorithm.num_mini_batches = 2
    env = Go2Env(cfg, num_steps_per_env=4)
    runner = OnPolicyRunner(env, tc, log_dir=None)
    assert runner.is_recurrent
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    for _ in range(3):
        rs, metrics = runner._train_step(rs)
    assert np.isfinite(float(metrics["value_loss"]))
    assert np.isfinite(float(metrics["surrogate_loss"]))
    assert float(jnp.abs(rs.memory.a.h).max()) > 0.0
    # jit cache stays at one entry (no weak-type recompiles)
    assert runner._train_step._cache_size() == 1
