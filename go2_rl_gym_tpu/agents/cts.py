"""Concurrent Teacher-Student PPO — all six variants in one implementation.

Counterpart of reference rsl_rl/rsl_rl/algorithms/{cts,moe_cts,moe_ng_cts,
mcp_cts,ac_moe_cts,dual_moe_cts}.py. The variant differences (which encoder the
student uses, MoE load-balance terms, MCP's composed sigma, actor-gated expert
critics) live in the model (`CTSFamily`); this file implements the shared
training skeleton:

* Static teacher/student env split by the reference's stride rule
  (env i is a student iff ``i % int(1/(1-teacher_env_ratio)) == 0``,
  cts.py:93-101). Unlike the reference, transitions are stored in natural env
  order — minibatches gather through precomputed *static* teacher/student flat
  index arrays, reproducing the reference's teacher-first minibatch layout
  (rollout_storage_cts.py:153-216) without any act-time permutation/scatter
  (cts.py:123-142's concat + un-permute dance disappears; this kills the
  classic silent-corruption site flagged in SURVEY.md §7).
* Update pass 1 (optimizer1 = teacher encoder + actor + critic [+ std]):
  clipped PPO with surrogate = teacher-mean + student-mean (cts.py:222-231),
  adaptive-KL LR, grad clip.
* Update pass 2 (optimizer2 = student encoder): latent distillation MSE
  against the detached teacher latent (+ MoE load balance, moe_cts.py:205-216)
  over student samples only.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from go2_rl_gym_tpu.agents import common
from go2_rl_gym_tpu.agents.networks import CTSFamily, make_cts_model
from go2_rl_gym_tpu.env.config import AlgorithmCfg, PolicyCfg

STUDENT_PARAM_KEYS = ("student_encoder",)

# which algorithm name maps to which model family + loss extras
ALGO_TO_FAMILY = {
    "CTS": "cts",
    "MoECTS": "moe_cts",
    "MoENGCTS": "moe_ng_cts",
    "MCPCTS": "mcp_cts",
    "ACMoECTS": "ac_moe_cts",
    "DualMoECTS": "dual_moe_cts",
}
# variants whose student encoder is a MoE (load-balance in the distill pass)
STUDENT_MOE = ("moe_cts", "moe_ng_cts", "dual_moe_cts")
# variants with actor-critic MoE (load-balance joins the PPO pass)
ACTOR_MOE = ("ac_moe_cts", "dual_moe_cts")


def split_params(params):
    inner = params["params"]
    p2 = {"params": {k: v for k, v in inner.items() if k in STUDENT_PARAM_KEYS}}
    p1 = {"params": {k: v for k, v in inner.items() if k not in STUDENT_PARAM_KEYS}}
    return p1, p2


def merge_params(p1, p2):
    return {"params": {**p1["params"], **p2["params"]}}


class CTSTrainState(NamedTuple):
    params1: Any          # teacher encoder + actor + critic (+ std)
    params2: Any          # student encoder
    opt1_state: Any
    opt2_state: Any
    lr: jax.Array


class Transition(NamedTuple):
    """(N, ...) per step; stacked to (T, N, ...) by the rollout scan."""
    obs: jax.Array
    critic_obs: jax.Array
    history: jax.Array
    actions: jax.Array
    rewards: jax.Array
    dones: jax.Array
    values: jax.Array
    log_probs: jax.Array
    mu: jax.Array
    sigma: jax.Array


class CTS:
    def __init__(self, algorithm: str, num_obs: int, num_critic_obs: int,
                 num_actions: int, num_envs: int, history_length: int,
                 policy_cfg: PolicyCfg, alg_cfg: AlgorithmCfg):
        self.cfg = alg_cfg
        self.family = ALGO_TO_FAMILY[algorithm]
        self.algorithm = algorithm
        self.model: CTSFamily = make_cts_model(
            self.family, num_obs, num_critic_obs, num_actions, policy_cfg,
            history_length)
        self.num_obs = num_obs
        self.num_critic_obs = num_critic_obs
        self.num_actions = num_actions
        self.num_envs = num_envs
        self.history_length = history_length

        # static env split (reference cts.py:93-101)
        ratio = alg_cfg.teacher_env_ratio
        stride = int(round(1.0 / (1.0 - ratio)))
        self.student_envs = np.array(
            [i for i in range(num_envs) if i % stride == 0], np.int32)
        self.teacher_envs = np.array(
            [i for i in range(num_envs) if i % stride != 0], np.int32)
        self.num_teacher = len(self.teacher_envs)
        self.num_student = len(self.student_envs)
        is_student = np.zeros(num_envs, bool)
        is_student[self.student_envs] = True
        self.is_student = jnp.asarray(is_student)

        self.optimizer1 = common.make_optimizer(alg_cfg.max_grad_norm,
                                                alg_cfg.learning_rate)
        self.optimizer2 = common.make_optimizer(
            alg_cfg.max_grad_norm, alg_cfg.student_encoder_learning_rate)

    def init(self, key) -> CTSTrainState:
        params = self.model.init(
            key, jnp.zeros((1, self.num_obs)),
            jnp.zeros((1, self.num_critic_obs)),
            jnp.zeros((1, self.num_obs * self.history_length)))
        p1, p2 = split_params(params)
        return CTSTrainState(
            params1=p1, params2=p2,
            opt1_state=self.optimizer1.init(p1),
            opt2_state=self.optimizer2.init(p2),
            lr=jnp.asarray(self.cfg.learning_rate, dtype=jnp.float32))

    # ------------------------------------------------------------------
    # Rollout side
    # ------------------------------------------------------------------

    def _latent(self, params, obs, priv, history):
        """Merged latent: teacher envs use the privileged encoder, student
        envs their (detached) history encoder (actor_critic_cts.py:150-157)."""
        t_lat = self.model.apply(params, priv, method="t_latent")
        s_lat, _ = self.model.apply(params, history, method="s_latent")
        return jnp.where(self.is_student[:, None],
                         jax.lax.stop_gradient(s_lat), t_lat)

    def act(self, params1, params2, key, obs, priv, history):
        params = merge_params(params1, params2)
        latent = self._latent(params, obs, priv, history)
        mu, std, _ = self.model.apply(params, latent, obs, method="dist")
        actions = mu + std * jax.random.normal(key, mu.shape)
        logp = common.gaussian_log_prob(mu, std, actions)
        values = self._value(params, latent, priv, obs)
        return actions, values, logp, mu, std

    def _value(self, params, latent, priv, obs):
        latent = jax.lax.stop_gradient(latent)
        if self.family in ACTOR_MOE:
            v, _ = self.model.apply(params, latent, priv, obs, method="val")
        else:
            v, _ = self.model.apply(params, latent, priv, method="val")
        return v

    def value(self, params1, params2, obs, priv, history):
        params = merge_params(params1, params2)
        latent = self._latent(params, obs, priv, history)
        return self._value(params, latent, priv, obs)

    def process_rewards(self, rewards, values, time_outs, gamma):
        return rewards + gamma * values * time_outs.astype(jnp.float32)

    # ------------------------------------------------------------------
    # Update
    # ------------------------------------------------------------------

    def _flat_indices(self, T):
        """Static flat positions of teacher/student samples in env-major
        (N, T) flattened storage."""
        t_idx = (self.teacher_envs[:, None] * T + np.arange(T)[None, :]).reshape(-1)
        s_idx = (self.student_envs[:, None] * T + np.arange(T)[None, :]).reshape(-1)
        return jnp.asarray(t_idx), jnp.asarray(s_idx)

    def update(self, ts: CTSTrainState, batch: Transition, returns, advantages,
               key):
        cfg = self.cfg
        T, N = batch.rewards.shape
        nmb = cfg.num_mini_batches
        tmb = self.num_teacher * T // nmb
        smb = self.num_student * T // nmb

        # env-major flatten (rollout_storage_cts.py:175-192)
        flat = jax.tree.map(
            lambda x: jnp.swapaxes(x, 0, 1).reshape((N * T,) + x.shape[2:]),
            batch)
        flat_ret = jnp.swapaxes(returns, 0, 1).reshape(-1)
        flat_adv = jnp.swapaxes(advantages, 0, 1).reshape(-1)

        t_pos, s_pos = self._flat_indices(T)
        kt, ks = jax.random.split(key)
        t_perm = t_pos[jax.random.permutation(kt, len(self.teacher_envs) * T)]
        s_perm = s_pos[jax.random.permutation(ks, len(self.student_envs) * T)]
        # one shuffle reused across epochs, teacher-first per minibatch
        # (rollout_storage_cts.py:158-159: indices drawn once). Gather the
        # shuffled pools ONCE; minibatches then read contiguous slices —
        # per-minibatch random-row gathers of the 500-float sample vectors
        # are the expensive HBM pattern on TPU.
        shuffled = jax.tree.map(
            lambda x: jnp.concatenate(
                [x[t_perm].reshape((nmb, tmb) + x.shape[1:]),
                 x[s_perm].reshape((nmb, smb) + x.shape[1:])], axis=1),
            flat)
        sh_ret = jnp.concatenate([flat_ret[t_perm].reshape(nmb, tmb),
                                  flat_ret[s_perm].reshape(nmb, smb)], axis=1)
        sh_adv = jnp.concatenate([flat_adv[t_perm].reshape(nmb, tmb),
                                  flat_adv[s_perm].reshape(nmb, smb)], axis=1)
        mb_slots = jnp.tile(jnp.arange(nmb), cfg.num_learning_epochs)

        E = self.model.expert_num

        # ---------------- pass 1: PPO on optimizer1 ----------------
        def ppo_step(carry, slot):
            p1, opt1, lr = carry
            mb = jax.tree.map(lambda x: x[slot], shuffled)
            mb_ret = sh_ret[slot]
            mb_adv = sh_adv[slot]

            def loss_fn(p1_):
                params = merge_params(p1_, ts.params2)
                lat_t = self.model.apply(params, mb.critic_obs[:tmb],
                                         method="t_latent")
                lat_s, _ = self.model.apply(params, mb.history[tmb:],
                                            method="s_latent")
                latent = jnp.concatenate(
                    [lat_t, jax.lax.stop_gradient(lat_s)], axis=0)
                mu, std, _ = self.model.apply(params, latent, mb.obs,
                                              method="dist")
                logp = common.gaussian_log_prob(mu, std, mb.actions)
                lat_sg = jax.lax.stop_gradient(latent)
                if self.family in ACTOR_MOE:
                    values, ac_w = self.model.apply(
                        params, lat_sg, mb.critic_obs, mb.obs, method="val")
                else:
                    values, ac_w = self.model.apply(
                        params, lat_sg, mb.critic_obs, method="val")
                entropy = common.gaussian_entropy(std)
                surr = common.surrogate_loss(logp, mb.log_probs, mb_adv,
                                             cfg.clip_param)
                surr_loss = surr[:tmb].mean() + surr[tmb:].mean()
                vloss = common.clipped_value_loss(
                    values, mb.values, mb_ret, cfg.clip_param,
                    cfg.use_clipped_value_loss).mean()
                loss = (surr_loss + cfg.value_loss_coef * vloss
                        - cfg.entropy_coef * entropy.mean())
                ac_lb = jnp.asarray(0.0)
                if self.family in ACTOR_MOE:
                    mean_usage = jnp.mean(ac_w, axis=0)
                    ac_lb = jnp.mean(jnp.square(mean_usage - 1.0 / E))
                    loss = loss + cfg.load_balance_coef * ac_lb
                return loss, (surr_loss, vloss, mu, std, entropy.mean(), ac_lb)

            (_, (surr, vloss, mu, std, ent, ac_lb)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p1)
            if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
                lr, _ = common.adaptive_kl_lr(lr, mu, std, mb.mu, mb.sigma,
                                              cfg.desired_kl)
            opt1 = common.set_lr(opt1, lr)
            updates, opt1 = self.optimizer1.update(grads, opt1, p1)
            p1 = optax.apply_updates(p1, updates)
            return (p1, opt1, lr), jnp.stack([vloss, surr, ent, ac_lb])

        (p1, opt1, lr), stats1 = jax.lax.scan(
            ppo_step, (ts.params1, ts.opt1_state, ts.lr), mb_slots)

        # ---------------- pass 2: distillation on optimizer2 ----------------
        def distill_step(carry, slot):
            p2, opt2 = carry
            mb_hist = shuffled.history[slot][tmb:]
            mb_priv = shuffled.critic_obs[slot][tmb:]

            def loss_fn(p2_):
                params = merge_params(p1, p2_)
                s_lat, gate = self.model.apply(params, mb_hist,
                                               method="s_latent")
                t_lat = jax.lax.stop_gradient(
                    self.model.apply(params, mb_priv, method="t_latent"))
                latent_loss = jnp.mean(jnp.square(t_lat - s_lat))
                lb = jnp.asarray(0.0)
                loss = latent_loss
                if self.family in STUDENT_MOE:
                    mean_usage = jnp.mean(gate, axis=0)
                    lb = jnp.mean(jnp.square(mean_usage - 1.0 / E))
                    loss = loss + cfg.load_balance_coef * lb
                return loss, (latent_loss, lb)

            (_, (latent_loss, lb)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p2)
            updates, opt2 = self.optimizer2.update(grads, opt2, p2)
            p2 = optax.apply_updates(p2, updates)
            return (p2, opt2), jnp.stack([latent_loss, lb])

        (p2, opt2), stats2 = jax.lax.scan(
            distill_step, (ts.params2, ts.opt2_state), mb_slots)

        metrics = {
            "value_loss": stats1[:, 0].mean(),
            "surrogate_loss": stats1[:, 1].mean(),
            "entropy": stats1[:, 2].mean(),
            "latent_loss": stats2[:, 0].mean(),
            "learning_rate": lr,
        }
        if self.family in STUDENT_MOE:
            metrics["load_balance_loss"] = stats2[:, 1].mean()
        if self.family in ACTOR_MOE:
            metrics["actor_load_balance_loss"] = stats1[:, 3].mean()
        return CTSTrainState(p1, p2, opt1, opt2, lr), metrics
