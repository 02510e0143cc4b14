"""Recurrent actor-critic (LSTM/GRU memory) + trajectory padding utilities.

Counterparts of reference rsl_rl/modules/actor_critic_recurrent.py:40-116 and
rsl_rl/utils/utils.py:33-71 (split_and_pad_trajectories / unpad_trajectories).
Like the reference, no registered task uses recurrence — it is part of the
framework surface for custom tasks. The memory is carried explicitly in the
rollout (functional), not hidden module state.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from go2_rl_gym_tpu.agents.networks import MLP


class LSTMState(NamedTuple):
    h: jax.Array   # (N, hidden)
    c: jax.Array


class Memory(nn.Module):
    """Single-layer LSTM/GRU front-end (reference Memory, :92-116)."""
    hidden_size: int = 256
    rnn_type: str = "lstm"

    @nn.compact
    def __call__(self, x, state: LSTMState):
        if self.rnn_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_size, name="cell")
            (c, h), out = cell((state.c, state.h), x)
            return out, LSTMState(h=h, c=c)
        cell = nn.GRUCell(self.hidden_size, name="cell")
        h, out = cell(state.h, x)
        return out, LSTMState(h=h, c=state.c)

    @staticmethod
    def zero_state(batch: int, hidden_size: int) -> LSTMState:
        return LSTMState(h=jnp.zeros((batch, hidden_size)),
                         c=jnp.zeros((batch, hidden_size)))


class ActorCriticRecurrent(nn.Module):
    """LSTM memory before the actor and critic MLPs
    (reference actor_critic_recurrent.py:40-91)."""
    num_actions: int
    actor_hidden_dims: Sequence[int] = (256, 256, 128)
    critic_hidden_dims: Sequence[int] = (256, 256, 128)
    rnn_hidden_size: int = 256
    rnn_type: str = "lstm"
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.memory_a = Memory(self.rnn_hidden_size, self.rnn_type)
        self.memory_c = Memory(self.rnn_hidden_size, self.rnn_type)
        self.actor = MLP(list(self.actor_hidden_dims) + [self.num_actions],
                         self.activation)
        self.critic = MLP(list(self.critic_hidden_dims) + [1], self.activation)
        # explicit dtype: a weak-typed f32 leaf changes abstract signature
        # after one optimizer step and forces a jit recompile
        self.std = self.param("std",
                              lambda k, s: jnp.full(s, self.init_noise_std,
                                                    dtype=jnp.float32),
                              (self.num_actions,))

    def __call__(self, obs, critic_obs, state_a: LSTMState, state_c: LSTMState):
        mu, std, state_a = self.actor_dist(obs, state_a)
        v, state_c = self.value(critic_obs, state_c)
        return mu, std, v, state_a, state_c

    def actor_dist(self, obs, state: LSTMState):
        feat, state = self.memory_a(obs, state)
        mu = self.actor(feat)
        return mu, jnp.broadcast_to(self.std, mu.shape), state

    def value(self, critic_obs, state: LSTMState):
        feat, state = self.memory_c(critic_obs, state)
        return self.critic(feat)[..., 0], state

    @staticmethod
    def reset_state(state: LSTMState, dones) -> LSTMState:
        mask = (~dones)[:, None].astype(jnp.float32)
        return LSTMState(h=state.h * mask, c=state.c * mask)


def _traj_indices(dones: jax.Array):
    T, N = dones.shape[:2]
    dones = dones.astype(bool)
    starts = jnp.concatenate([jnp.ones((1, N), bool), dones[:-1]], axis=0)
    traj_id_within = jnp.cumsum(starts.astype(jnp.int32), axis=0) - 1
    env_ids = jnp.broadcast_to(jnp.arange(N)[None, :], (T, N))
    global_id = env_ids * T + traj_id_within
    step_in_traj = jnp.arange(T)[:, None] - jnp.maximum.accumulate(
        jnp.where(starts, jnp.arange(T)[:, None], 0), axis=0)
    return step_in_traj, global_id


def split_and_pad_trajectories(tensor: jax.Array, dones: jax.Array):
    """Split (T, N, ...) rollouts at episode boundaries and pad to length T.

    Functional counterpart of reference rsl_rl/utils/utils.py:33-62: returns
    (padded (T, n_traj, ...), mask (T, n_traj)) where n_traj = N * T in the
    worst case; here we use the fixed upper bound n_traj = N * T with unused
    slots masked out (static shapes for jit).
    """
    T, N = dones.shape[:2]
    step_in_traj, global_id = _traj_indices(dones)
    n_traj = N * T
    padded = jnp.zeros((T, n_traj) + tensor.shape[2:], tensor.dtype)
    mask = jnp.zeros((T, n_traj), bool)
    padded = padded.at[step_in_traj.reshape(-1),
                       global_id.reshape(-1)].set(
        tensor.reshape((T * N,) + tensor.shape[2:]))
    mask = mask.at[step_in_traj.reshape(-1), global_id.reshape(-1)].set(True)
    return padded, mask


def unpad_trajectories(padded: jax.Array, dones: jax.Array):
    """Inverse of split_and_pad_trajectories: gather back to (T, N, ...)
    (reference utils.py:64-71)."""
    step_in_traj, global_id = _traj_indices(dones)
    return padded[step_in_traj, global_id]
