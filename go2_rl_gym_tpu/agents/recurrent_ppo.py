"""Recurrent PPO: LSTM/GRU actor-critic trained with sequence replay.

Counterpart of the reference's recurrent path (rsl_rl
actor_critic_recurrent.py:40-116 + rollout_storage.py:186-235
recurrent_mini_batch_generator + ppo.py with hidden-state plumbing) —
redesigned TPU-first:

* The reference splits rollouts at episode boundaries, pads every trajectory
  to T, and replays padded batches with a mask. Here the update instead
  replays each env's FULL T-step window through the RNN with a `lax.scan`,
  zeroing the carried state at done flags — the same computation on the same
  valid samples (the concatenation of an env's trajectories IS its rollout
  window), with static shapes and no scatter/pad step.
* Hidden state is functional: the rollout-start state is carried in the
  runner's RunnerState and snapshotted once per iteration for the update's
  replay (the reference stores per-step hidden states in the rollout buffer;
  replaying from the window-start state reproduces them exactly because the
  rollout applies the same scan).
* Minibatches are ENV slices (sequences stay whole), shuffled once per
  update, exactly as the reference's trajectory minibatcher keeps
  trajectories whole.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from go2_rl_gym_tpu.agents import common
from go2_rl_gym_tpu.agents.ppo import PPOTrainState, Transition
from go2_rl_gym_tpu.agents.recurrent import ActorCriticRecurrent, LSTMState
from go2_rl_gym_tpu.env.config import AlgorithmCfg, PolicyCfg


class Memory(NamedTuple):
    """Carried RNN state for both heads."""
    a: LSTMState
    c: LSTMState


class RecurrentPPO:
    """Stateless algorithm object; same surface as agents.ppo.PPO plus
    memory threading."""

    def __init__(self, num_obs: int, num_critic_obs: int, num_actions: int,
                 policy_cfg: PolicyCfg, alg_cfg: AlgorithmCfg):
        self.cfg = alg_cfg
        self.model = ActorCriticRecurrent(
            num_actions=num_actions,
            actor_hidden_dims=tuple(policy_cfg.actor_hidden_dims),
            critic_hidden_dims=tuple(policy_cfg.critic_hidden_dims),
            rnn_hidden_size=policy_cfg.rnn_hidden_size,
            rnn_type=policy_cfg.rnn_type,
            activation=policy_cfg.activation,
            init_noise_std=policy_cfg.init_noise_std)
        self.num_obs = num_obs
        self.num_critic_obs = num_critic_obs
        self.num_actions = num_actions
        self.hidden = policy_cfg.rnn_hidden_size
        self.optimizer = common.make_optimizer(alg_cfg.max_grad_norm,
                                               alg_cfg.learning_rate)

    def zero_memory(self, batch: int) -> Memory:
        z = LSTMState(h=jnp.zeros((batch, self.hidden)),
                      c=jnp.zeros((batch, self.hidden)))
        return Memory(a=z, c=z)

    def init(self, key) -> PPOTrainState:
        mem = self.zero_memory(1)
        params = self.model.init(key, jnp.zeros((1, self.num_obs)),
                                 jnp.zeros((1, self.num_critic_obs)),
                                 mem.a, mem.c)
        opt_state = self.optimizer.init(params)
        return PPOTrainState(params=params, opt_state=opt_state,
                             lr=jnp.asarray(self.cfg.learning_rate,
                                            dtype=jnp.float32))

    # -- rollout-side ------------------------------------------------------

    def act(self, params, key, obs, critic_obs, mem: Memory):
        mu, std, sa = self.model.apply(params, obs, mem.a,
                                       method="actor_dist")
        actions = mu + std * jax.random.normal(key, mu.shape)
        logp = common.gaussian_log_prob(mu, std, actions)
        values, sc = self.model.apply(params, critic_obs, mem.c,
                                      method="value")
        return actions, values, logp, mu, std, Memory(a=sa, c=sc)

    def reset_memory(self, mem: Memory, dones) -> Memory:
        return Memory(a=ActorCriticRecurrent.reset_state(mem.a, dones),
                      c=ActorCriticRecurrent.reset_state(mem.c, dones))

    def value(self, params, critic_obs, mem: Memory):
        v, _ = self.model.apply(params, critic_obs, mem.c, method="value")
        return v

    def process_rewards(self, rewards, values, time_outs, gamma):
        return rewards + gamma * values * time_outs.astype(jnp.float32)

    # -- update-side -------------------------------------------------------

    def _replay(self, params, obs, critic_obs, dones, mem0: Memory):
        """Scan the whole (T, n, ...) window through both RNNs from the
        window-start state, zeroing at dones — reproduces the rollout's
        features exactly for the same params."""
        def step(mem, inp):
            o, co, d = inp
            mu, std, sa = self.model.apply(params, o, mem.a,
                                           method="actor_dist")
            v, sc = self.model.apply(params, co, mem.c, method="value")
            nxt = self.reset_memory(Memory(a=sa, c=sc), d.astype(bool))
            return nxt, (mu, std, v)

        _, (mu, std, values) = jax.lax.scan(
            step, mem0, (obs, critic_obs, dones))
        return mu, std, values

    def update(self, ts: PPOTrainState, batch: Transition, returns,
               advantages, key, mem0: Memory):
        """Epochs x env-sliced minibatches of clipped PPO with sequence
        replay (reference ppo.py:120-187 over the recurrent generator)."""
        cfg = self.cfg
        T, N = batch.rewards.shape
        nmb = cfg.num_mini_batches
        mb_envs = N // nmb

        perm = jax.random.permutation(key, N)[: nmb * mb_envs]
        def env_slice(x):
            # (T, N, ...) -> (nmb, T, mb_envs, ...)
            sh = x[:, perm].reshape((T, nmb, mb_envs) + x.shape[2:])
            return jnp.moveaxis(sh, 1, 0)
        sh_batch = jax.tree.map(env_slice, batch)
        sh_ret = env_slice(returns)
        sh_adv = env_slice(advantages)
        sh_mem = jax.tree.map(
            lambda x: x[perm].reshape((nmb, mb_envs) + x.shape[1:]), mem0)
        mb_slots = jnp.tile(jnp.arange(nmb), cfg.num_learning_epochs)

        def minibatch_step(carry, slot):
            params, opt_state, lr = carry
            mb = jax.tree.map(lambda x: x[slot], sh_batch)
            mb_ret = sh_ret[slot]
            mb_adv = sh_adv[slot]
            mb_mem = jax.tree.map(lambda x: x[slot], sh_mem)

            def loss_fn(p):
                mu, std, values = self._replay(p, mb.obs, mb.critic_obs,
                                               mb.dones, mb_mem)
                logp = common.gaussian_log_prob(mu, std, mb.actions)
                entropy = common.gaussian_entropy(std)
                surr = common.surrogate_loss(logp, mb.log_probs, mb_adv,
                                             cfg.clip_param).mean()
                vloss = common.clipped_value_loss(
                    values, mb.values, mb_ret, cfg.clip_param,
                    cfg.use_clipped_value_loss).mean()
                loss = (surr + cfg.value_loss_coef * vloss
                        - cfg.entropy_coef * entropy.mean())
                return loss, (surr, vloss, mu, std, entropy.mean())

            (_, (surr, vloss, mu, std, ent)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
                lr, _ = common.adaptive_kl_lr(
                    lr, mu.reshape(-1, mu.shape[-1]),
                    std.reshape(-1, std.shape[-1]),
                    mb.mu.reshape(-1, mu.shape[-1]),
                    mb.sigma.reshape(-1, std.shape[-1]), cfg.desired_kl)
            opt_state = common.set_lr(opt_state, lr)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, lr), jnp.stack([vloss, surr, ent])

        (params, opt_state, lr), stats = jax.lax.scan(
            minibatch_step, (ts.params, ts.opt_state, ts.lr), mb_slots)
        metrics = {
            "value_loss": stats[:, 0].mean(),
            "surrogate_loss": stats[:, 1].mean(),
            "entropy": stats[:, 2].mean(),
            "learning_rate": lr,
        }
        return PPOTrainState(params, opt_state, lr), metrics
