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
