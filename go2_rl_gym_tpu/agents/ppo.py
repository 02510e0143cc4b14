"""PPO (clipped surrogate, GAE, adaptive-KL LR) — pure-functional.

Counterpart of reference rsl_rl/rsl_rl/algorithms/ppo.py:38-187, restructured
as act/update pure functions so the whole rollout+update loop fuses into one
jitted train step (SURVEY.md §7.6).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from go2_rl_gym_tpu.agents import common
from go2_rl_gym_tpu.agents.networks import ActorCritic
from go2_rl_gym_tpu.env.config import AlgorithmCfg, PolicyCfg


class PPOTrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr: jax.Array


class Transition(NamedTuple):
    """One rollout step, batched (N, ...) (reference rollout_storage.py:37-51)."""
    obs: jax.Array
    critic_obs: jax.Array
    actions: jax.Array
    rewards: jax.Array
    dones: jax.Array
    values: jax.Array
    log_probs: jax.Array
    mu: jax.Array
    sigma: jax.Array


class PPO:
    """Stateless algorithm object: holds static config + model."""

    def __init__(self, num_obs: int, num_critic_obs: int, num_actions: int,
                 policy_cfg: PolicyCfg, alg_cfg: AlgorithmCfg):
        self.cfg = alg_cfg
        self.model = ActorCritic(
            num_actions=num_actions,
            actor_hidden_dims=tuple(policy_cfg.actor_hidden_dims),
            critic_hidden_dims=tuple(policy_cfg.critic_hidden_dims),
            activation=policy_cfg.activation,
            init_noise_std=policy_cfg.init_noise_std)
        self.num_obs = num_obs
        self.num_critic_obs = num_critic_obs
        self.num_actions = num_actions
        self.optimizer = common.make_optimizer(alg_cfg.max_grad_norm,
                                               alg_cfg.learning_rate)

    def init(self, key) -> PPOTrainState:
        params = self.model.init(key, jnp.zeros((1, self.num_obs)),
                                 jnp.zeros((1, self.num_critic_obs)))
        opt_state = self.optimizer.init(params)
        return PPOTrainState(params=params, opt_state=opt_state,
                             lr=jnp.asarray(self.cfg.learning_rate, dtype=jnp.float32))

    # -- rollout-side ------------------------------------------------------

    def act(self, params, key, obs, critic_obs):
        """Sample actions; returns (actions, partial Transition fields)."""
        mu, std = self.model.apply(params, obs, method="actor_dist")
        actions = mu + std * jax.random.normal(key, mu.shape)
        logp = common.gaussian_log_prob(mu, std, actions)
        values = self.model.apply(params, critic_obs, method="value")
        return actions, values, logp, mu, std

    def value(self, params, critic_obs):
        return self.model.apply(params, critic_obs, method="value")

    def process_rewards(self, rewards, values, time_outs, gamma):
        """Timeout bootstrapping (reference ppo.py:104-110)."""
        return rewards + gamma * values * time_outs.astype(jnp.float32)

    # -- update-side -------------------------------------------------------

    def update(self, ts: PPOTrainState, batch: Transition, returns, advantages,
               key):
        """5 epochs x 4 shuffled minibatches of clipped-PPO updates
        (reference ppo.py:120-187). batch fields are (T, N, ...)."""
        cfg = self.cfg
        T, N = batch.rewards.shape
        total = T * N
        nmb = cfg.num_mini_batches
        mb_size = total // nmb

        flat = jax.tree.map(lambda x: x.reshape((total,) + x.shape[2:]), batch)
        flat_returns = returns.reshape(total)
        flat_adv = advantages.reshape(total)

        # one shuffle reused across epochs (reference rollout_storage.py:150
        # draws randperm once and replays the same minibatches per epoch);
        # gather once, then minibatches are contiguous slices (cheap on TPU)
        perm = jax.random.permutation(key, total)[: nmb * mb_size]
        shuffled = jax.tree.map(
            lambda x: x[perm].reshape((nmb, mb_size) + x.shape[1:]), flat)
        sh_ret = flat_returns[perm].reshape(nmb, mb_size)
        sh_adv = flat_adv[perm].reshape(nmb, mb_size)
        mb_slots = jnp.tile(jnp.arange(nmb), cfg.num_learning_epochs)

        def minibatch_step(carry, slot):
            params, opt_state, lr = carry
            mb = jax.tree.map(lambda x: x[slot], shuffled)
            mb_ret = sh_ret[slot]
            mb_adv = sh_adv[slot]

            def loss_fn(p):
                mu, std = self.model.apply(p, mb.obs, method="actor_dist")
                logp = common.gaussian_log_prob(mu, std, mb.actions)
                values = self.model.apply(p, mb.critic_obs, method="value")
                entropy = common.gaussian_entropy(std)
                surr = common.surrogate_loss(logp, mb.log_probs, mb_adv,
                                             cfg.clip_param).mean()
                vloss = common.clipped_value_loss(
                    values, mb.values, mb_ret, cfg.clip_param,
                    cfg.use_clipped_value_loss).mean()
                loss = (surr + cfg.value_loss_coef * vloss
                        - cfg.entropy_coef * entropy.mean())
                return loss, (surr, vloss, mu, std, entropy.mean())

            (loss, (surr, vloss, mu, std, ent)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)

            if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
                lr, kl = common.adaptive_kl_lr(lr, mu, std, mb.mu, mb.sigma,
                                               cfg.desired_kl)
            opt_state = common.set_lr(opt_state, lr)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
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
