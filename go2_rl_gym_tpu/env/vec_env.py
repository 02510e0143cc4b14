"""Stateful VecEnv adapter over the functional Go2Env.

Counterpart of the reference's abstract batched-env contract
(rsl_rl/rsl_rl/env/vec_env.py:36-60): `step(actions) -> (obs, priv_obs, rew,
reset, extras)`, `reset()`, `get_observations`, `get_privileged_observations`,
attrs num_envs/num_obs/num_privileged_obs/num_actions/max_episode_length/
episode_length_buf/extras. The native training path uses the pure-functional
API directly (it fuses into the train step); this wrapper exists for users
porting reference-style runners or custom eval loops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from go2_rl_gym_tpu.env.go2_env import Go2Env


class VecEnvAdapter:
    def __init__(self, env: Go2Env, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self.num_obs = env.num_obs
        self.num_privileged_obs = env.num_privileged_obs
        self.num_actions = env.num_actions
        self.max_episode_length = env.max_episode_length
        self.extras = {}
        self._step = jax.jit(env.step)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._obs = None
        self._priv = None
        self.reset()

    @property
    def episode_length_buf(self):
        return self._state.episode_length

    @episode_length_buf.setter
    def episode_length_buf(self, value):
        self._state = self._state._replace(episode_length=value)

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state = jax.jit(self.env.init_state)(k)
        zero = jnp.zeros((self.num_envs, self.num_actions))
        self._state, out = self._step(self._state, zero)
        self._obs, self._priv = out.obs, out.privileged_obs
        return self._obs, self._priv

    def step(self, actions):
        self._state, out = self._step(self._state, jnp.asarray(actions))
        self._obs, self._priv = out.obs, out.privileged_obs
        self.extras = {"episode": out.metrics, "time_outs": out.time_outs}
        return out.obs, out.privileged_obs, out.rew, out.done, self.extras

    def get_observations(self):
        return self._obs

    def get_privileged_observations(self):
        return self._priv
