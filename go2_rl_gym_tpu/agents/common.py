"""Shared RL machinery: GAE, gaussian log-probs, adaptive-KL LR, optimizers.

Counterparts of reference rsl_rl pieces: GAE backward scan
(rollout_storage.py:123-137) as a `lax.scan`; the adaptive-KL learning-rate
schedule (ppo.py:139-151) carried as a TrainState scalar and injected into
optax hyperparams (the reference mutates torch param groups imperatively).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def make_optimizer(max_grad_norm: float, lr: float):
    """clip-by-global-norm -> adam, with runtime-injectable learning rate."""
    def _make(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        )
    return optax.inject_hyperparams(_make)(learning_rate=lr)


def set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def gaussian_log_prob(mu, std, actions):
    """Diagonal normal log prob summed over action dim (torch Normal semantics,
    actor_critic.py:159-160)."""
    var = std * std
    logp = (-0.5 * jnp.square(actions - mu) / var
            - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi))
    return jnp.sum(logp, axis=-1)


def gaussian_entropy(std):
    """Sum over action dim (actor_critic.py:143-144)."""
    return jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std), axis=-1)


def compute_gae(rewards, values, dones, last_values, gamma, lam):
    """Generalized advantage estimation, reverse scan over T.

    Args: rewards/values/dones (T, N); last_values (N,).
    Returns (returns (T,N), advantages_normalized (T,N)).
    Matches reference rollout_storage.py:123-137 (advantages normalized over
    the whole batch; under pjit the mean/std become global collectives).
    """
    T = rewards.shape[0]
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)
    not_terminal = 1.0 - dones.astype(jnp.float32)
    deltas = rewards + not_terminal * gamma * next_values - values

    def body(adv, t):
        adv = deltas[t] + not_terminal[t] * gamma * lam * adv
        return adv, adv

    _, advs = jax.lax.scan(body, jnp.zeros_like(last_values),
                           jnp.arange(T - 1, -1, -1))
    advs = advs[::-1]
    returns = advs + values
    norm_advs = (advs - advs.mean()) / (advs.std() + 1e-8)
    return returns, norm_advs


def adaptive_kl_lr(lr, mu, sigma, old_mu, old_sigma, desired_kl):
    """KL-driven LR update (reference ppo.py:139-151)."""
    kl = jnp.sum(
        jnp.log(sigma / old_sigma + 1e-5)
        + (jnp.square(old_sigma) + jnp.square(old_mu - mu))
        / (2.0 * jnp.square(sigma)) - 0.5, axis=-1)
    kl_mean = jnp.mean(kl)
    lr = jnp.where(kl_mean > desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5), lr)
    lr = jnp.where((kl_mean < desired_kl / 2.0) & (kl_mean > 0.0),
                   jnp.minimum(1e-2, lr * 1.5), lr)
    return lr, kl_mean


def surrogate_loss(logp, old_logp, advantages, clip_param):
    """Per-sample clipped surrogate (reference ppo.py:154-159), not reduced."""
    ratio = jnp.exp(logp - old_logp)
    surr = -advantages * ratio
    surr_clipped = -advantages * jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param)
    return jnp.maximum(surr, surr_clipped)


def clipped_value_loss(values, old_values, returns, clip_param, use_clipped=True):
    """Per-sample clipped value loss (reference ppo.py:162-169), not reduced."""
    if use_clipped:
        clipped = old_values + jnp.clip(values - old_values, -clip_param, clip_param)
        return jnp.maximum(jnp.square(values - returns),
                           jnp.square(clipped - returns))
    return jnp.square(returns - values)
