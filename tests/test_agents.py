"""RL algorithm unit tests: GAE vs. manual recursion, gaussian log-probs,
surrogate/value losses, CTS teacher-student split invariants, update smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.agents import common, cts as cts_lib, ppo as ppo_lib
from go2_rl_gym_tpu.agents import networks
from go2_rl_gym_tpu.env.config import AlgorithmCfg, PolicyCfg


def test_gae_matches_manual():
    T, N = 6, 3
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rewards = jax.random.normal(k1, (T, N))
    values = jax.random.normal(k2, (T, N))
    dones = jax.random.bernoulli(k3, 0.2, (T, N))
    last_values = jax.random.normal(k4, (N,))
    gamma, lam = 0.99, 0.95
    returns, _ = common.compute_gae(rewards, values, dones, last_values,
                                    gamma, lam)
    # manual backward recursion (reference rollout_storage.py:123-137)
    adv = np.zeros(N)
    rets = np.zeros((T, N))
    r, v, d = map(np.asarray, (rewards, values, dones))
    for t in reversed(range(T)):
        nv = np.asarray(last_values) if t == T - 1 else v[t + 1]
        nt = 1.0 - d[t]
        delta = r[t] + nt * gamma * nv - v[t]
        adv = delta + nt * gamma * lam * adv
        rets[t] = adv + v[t]
    np.testing.assert_allclose(returns, rets, atol=1e-5)


def test_gae_advantage_normalized():
    T, N = 8, 16
    key = jax.random.PRNGKey(1)
    rewards = jax.random.normal(key, (T, N))
    values = jnp.zeros((T, N))
    dones = jnp.zeros((T, N), bool)
    _, adv = common.compute_gae(rewards, values, dones, jnp.zeros(N), 0.99, 0.95)
    assert abs(float(adv.mean())) < 1e-5
    np.testing.assert_allclose(float(adv.std()), 1.0, atol=1e-3)


def test_gaussian_log_prob_matches_scipy():
    from scipy.stats import norm
    mu = jnp.array([[0.5, -1.0]])
    std = jnp.array([[1.5, 0.3]])
    a = jnp.array([[0.0, -1.2]])
    got = float(common.gaussian_log_prob(mu, std, a)[0])
    want = (norm.logpdf(0.0, 0.5, 1.5) + norm.logpdf(-1.2, -1.0, 0.3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_entropy():
    std = jnp.array([[1.0] * 12])
    got = float(common.gaussian_entropy(std)[0])
    want = 12 * (0.5 + 0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_adaptive_kl_lr():
    mu = jnp.zeros((4, 2))
    # big KL -> lr down
    lr, kl = common.adaptive_kl_lr(jnp.asarray(1e-3), mu, jnp.ones((4, 2)),
                                   mu + 3.0, jnp.ones((4, 2)), 0.01)
    assert float(lr) == pytest.approx(1e-3 / 1.5)
    # tiny KL -> lr up
    lr, kl = common.adaptive_kl_lr(jnp.asarray(1e-3), mu, jnp.ones((4, 2)),
                                   mu + 1e-4, jnp.ones((4, 2)), 0.01)
    assert float(lr) == pytest.approx(1e-3 * 1.5)


def test_surrogate_clipping():
    adv = jnp.array([1.0])
    old_logp = jnp.array([0.0])
    # ratio far above 1+clip: gradient-free region -> clipped value used
    loss_hi = common.surrogate_loss(jnp.array([1.0]), old_logp, adv, 0.2)
    assert float(loss_hi[0]) == pytest.approx(-1.2)
    loss_in = common.surrogate_loss(jnp.array([0.0]), old_logp, adv, 0.2)
    assert float(loss_in[0]) == pytest.approx(-1.0)


def test_cts_env_split_matches_reference_rule():
    """Stride split (reference cts.py:93-101): student iff i % 4 == 0 at
    teacher ratio 0.75."""
    alg = cts_lib.CTS("CTS", 45, 263, 12, 16, 5, PolicyCfg(), AlgorithmCfg())
    assert list(alg.student_envs) == [0, 4, 8, 12]
    assert alg.num_teacher == 12 and alg.num_student == 4
    assert not set(alg.student_envs) & set(alg.teacher_envs)


def test_cts_param_split_roundtrip():
    alg = cts_lib.CTS("MoECTS", 45, 263, 12, 8, 5,
                      PolicyCfg(student_encoder_hidden_dims=(512, 256, 256)),
                      AlgorithmCfg())
    ts = alg.init(jax.random.PRNGKey(0))
    assert set(ts.params2["params"].keys()) == {"student_encoder"}
    assert "teacher_encoder" in ts.params1["params"]
    assert "std" in ts.params1["params"]
    merged = cts_lib.merge_params(ts.params1, ts.params2)
    assert set(merged["params"]) == (set(ts.params1["params"])
                                     | set(ts.params2["params"]))


def test_mcp_has_no_std_param():
    pc = PolicyCfg(obs_no_goal_mask=tuple([True] * 6 + [False] * 3 + [True] * 36))
    alg = cts_lib.CTS("MCPCTS", 45, 263, 12, 8, 5, pc, AlgorithmCfg())
    ts = alg.init(jax.random.PRNGKey(0))
    assert "std" not in ts.params1["params"]


def test_cts_flat_indices_partition():
    """Teacher/student flat positions exactly partition env-major storage."""
    alg = cts_lib.CTS("CTS", 45, 263, 12, 8, 5, PolicyCfg(), AlgorithmCfg())
    T = 4
    t_idx, s_idx = alg._flat_indices(T)
    allpos = sorted(np.concatenate([np.asarray(t_idx), np.asarray(s_idx)]))
    assert allpos == list(range(8 * T))
    # each env's samples are contiguous in env-major layout
    env_of = np.asarray(t_idx) // T
    assert set(env_of) == set(alg.teacher_envs)


@pytest.mark.parametrize("algo", ["CTS", "MoECTS", "ACMoECTS", "MCPCTS",
                                  "DualMoECTS", "MoENGCTS"])
def test_cts_update_runs_all_variants(algo):
    N, T = 8, 4
    pc = PolicyCfg(
        actor_hidden_dims=(32, 32), critic_hidden_dims=(32, 16),
        teacher_encoder_hidden_dims=(32,), student_encoder_hidden_dims=(32, 16),
        obs_no_goal_mask=tuple([True] * 6 + [False] * 3 + [True] * 36))
    ac = AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1)
    alg = cts_lib.CTS(algo, 45, 263, 12, N, 5, pc, ac)
    ts = alg.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    batch = cts_lib.Transition(
        obs=jax.random.normal(ks[0], (T, N, 45)),
        critic_obs=jax.random.normal(ks[1], (T, N, 263)),
        history=jax.random.normal(ks[2], (T, N, 225)),
        actions=jax.random.normal(ks[3], (T, N, 12)),
        rewards=jax.random.normal(ks[4], (T, N)),
        dones=jnp.zeros((T, N), bool),
        values=jax.random.normal(ks[5], (T, N)),
        log_probs=jax.random.normal(ks[6], (T, N)) - 15.0,
        mu=jnp.zeros((T, N, 12)),
        sigma=jnp.ones((T, N, 12)))
    returns, adv = common.compute_gae(
        batch.rewards, batch.values, batch.dones, jnp.zeros(N), 0.99, 0.95)
    ts2, metrics = jax.jit(alg.update)(ts, batch, returns, adv, ks[7])
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # student params changed in pass 2, teacher-side in pass 1
    d1 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      ts.params1, ts2.params1)
    d2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      ts.params2, ts2.params2)
    assert max(jax.tree.leaves(d1)) > 0
    assert max(jax.tree.leaves(d2)) > 0


def test_ppo_update_reduces_value_error():
    """PPO value head fits a constant-return toy problem."""
    N, T = 16, 8
    pc = PolicyCfg(actor_hidden_dims=(32,), critic_hidden_dims=(32,))
    # clipped value loss would pin predictions to +-clip around the stale
    # batch values; disable it for this static-batch fitting check
    ac = AlgorithmCfg(num_mini_batches=2, num_learning_epochs=2,
                      schedule="fixed", learning_rate=5e-3,
                      use_clipped_value_loss=False)
    alg = ppo_lib.PPO(10, 10, 4, pc, ac)
    ts = alg.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    obs = jax.random.normal(key, (T, N, 10))
    batch = ppo_lib.Transition(
        obs=obs, critic_obs=obs,
        actions=jnp.zeros((T, N, 4)),
        rewards=jnp.ones((T, N)),
        dones=jnp.zeros((T, N), bool),
        values=jnp.zeros((T, N)),
        log_probs=common.gaussian_log_prob(
            jnp.zeros((T, N, 4)), jnp.ones((T, N, 4)), jnp.zeros((T, N, 4))),
        mu=jnp.zeros((T, N, 4)), sigma=jnp.ones((T, N, 4)))
    returns = jnp.full((T, N), 5.0)
    adv = jnp.zeros((T, N))
    upd = jax.jit(alg.update)
    losses = []
    for i in range(30):
        ts, m = upd(ts, batch, returns, adv, jax.random.fold_in(key, i))
        losses.append(float(m["value_loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
