"""Policy / value network families (flax.linen).

TPU-native counterparts of the reference's torch modules:

* ``ActorCritic``            <- rsl_rl/modules/actor_critic.py:38-136
* ``CTSFamily('cts')``       <- rsl_rl/modules/actor_critic_cts.py:18-223
* ``CTSFamily('moe_cts')``   <- rsl_rl/modules/actor_critic_moe_cts.py:20-141
* ``CTSFamily('moe_ng_cts')``<- rsl_rl/modules/actor_critic_moe_ng_cts.py:18-288
* ``CTSFamily('mcp_cts')``   <- rsl_rl/modules/actor_critic_mcp_cts.py:18-292
* ``CTSFamily('ac_moe_cts')``<- rsl_rl/modules/actor_critic_ac_moe_cts.py:21-146
* ``CTSFamily('dual_moe_cts')`` <- rsl_rl/modules/actor_critic_dual_moe_cts.py:20-149

Key TPU adaptation: the reference computes per-expert heads with a grouped
``Conv1d`` (rsl_rl/modules/utils.py:83-94); here that is an einsum
``(B,E,H),(E,H,O)->(B,E,O)`` which XLA maps straight onto the MXU. Parameter
init mimics torch's Linear default (uniform +-1/sqrt(fan_in)) so learning
curves are comparable.

Param-tree layout is flat by submodule name (teacher_encoder / student_encoder
/ actor / critic / std ...), which is what lets the CTS algorithms partition
the two optimizers without any module surgery (reference cts.py:73-80).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0] if len(shape) == 2 else shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,))
        return x @ kernel + bias


ACTIVATIONS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "crelu": jax.nn.relu,
    "lrelu": jax.nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def simnorm(x, dim=8):
    shp = x.shape
    x = x.reshape(shp[:-1] + (-1, dim))
    x = jax.nn.softmax(x, axis=-1)
    return x.reshape(shp)


def apply_norm(x, norm_type):
    if norm_type == "l2norm":
        return l2norm(x)
    if norm_type == "simnorm":
        return simnorm(x)
    raise ValueError(norm_type)


class MLP(nn.Module):
    """Dense stack: activation between layers; optional trailing activation
    (reference rsl_rl/modules/utils.py:51-67)."""
    dims: Sequence[int]          # hidden dims + output dim
    activation: str = "elu"
    last_activation: bool = False

    @nn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation]
        for i, d in enumerate(self.dims):
            x = Dense(d, name=f"fc{i}")(x)
            if i < len(self.dims) - 1 or self.last_activation:
                x = act(x)
        return x


class Experts(nn.Module):
    """Shared backbone -> per-expert heads via einsum (replaces the grouped
    Conv1d at reference utils.py:83-94). Returns (B, E, out)."""
    expert_num: int
    backbone_hidden_dims: Sequence[int]
    expert_hidden_dim: int
    output_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        E, H, O = self.expert_num, self.expert_hidden_dim, self.output_dim
        feats = MLP(list(self.backbone_hidden_dims) + [E * H],
                    self.activation, last_activation=True, name="backbone")(x)
        feats = feats.reshape(feats.shape[:-1] + (E, H))
        w = self.param("head_kernel",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -1 / np.sqrt(H), 1 / np.sqrt(H)),
                       (E, H, O))
        b = self.param("head_bias",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -1 / np.sqrt(H), 1 / np.sqrt(H)),
                       (E, O))
        return jnp.einsum("...eh,eho->...eo", feats, w) + b


class MoE(nn.Module):
    """Experts + softmax gating (reference utils.py:96-126).

    Returns (output (B, out), weights (B, E))."""
    expert_num: int
    hidden_dims: Sequence[int]   # [...backbone, expert_hidden]
    output_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        experts = Experts(self.expert_num, list(self.hidden_dims[:-1]),
                          self.hidden_dims[-1], self.output_dim,
                          self.activation, name="experts")(x)
        gate_logits = MLP(list(self.hidden_dims[:-1]) + [self.expert_num],
                          self.activation, name="gating")(x)
        weights = jax.nn.softmax(gate_logits, axis=-1)
        out = jnp.sum(weights[..., None] * experts, axis=-2)
        return out, weights


class StudentMoEEncoder(nn.Module):
    """MoE + latent norm (reference utils.py:128-151)."""
    expert_num: int
    hidden_dims: Sequence[int]
    output_dim: int
    activation: str = "elu"
    norm_type: str = "l2norm"

    @nn.compact
    def __call__(self, x):
        latent, weights = MoE(self.expert_num, self.hidden_dims,
                              self.output_dim, self.activation, name="moe")(x)
        return apply_norm(latent, self.norm_type), weights


class StudentMoENGEncoder(nn.Module):
    """Goal-stripped experts + full-history gating
    (reference actor_critic_moe_ng_cts.py:185-242)."""
    expert_num: int
    hidden_dims: Sequence[int]          # backbone dims (e.g. [512, 256])
    expert_hidden_dim: int
    latent_dim: int
    activation: str = "elu"
    norm_type: str = "l2norm"

    @nn.compact
    def __call__(self, full, no_goal):
        experts = Experts(self.expert_num, list(self.hidden_dims),
                          self.expert_hidden_dim, self.latent_dim,
                          self.activation, name="experts")(no_goal)
        gate_logits = MLP(list(self.hidden_dims) + [self.expert_num],
                          self.activation, name="gating")(full)
        weights = jax.nn.softmax(gate_logits, axis=-1)
        latent = jnp.sum(weights[..., None] * experts, axis=-2)
        return apply_norm(latent, self.norm_type), weights


class ActorMCP(nn.Module):
    """Multiplicative compositional policy head
    (reference actor_critic_mcp_cts.py:174-246)."""
    action_dim: int
    hidden_dims: Sequence[int]
    expert_num: int = 8
    expert_hidden_dim: int = 256
    activation: str = "elu"

    @nn.compact
    def __call__(self, x, x_no_goal):
        E, A = self.expert_num, self.action_dim
        gate_logits = MLP(list(self.hidden_dims) + [E], self.activation,
                          name="gating")(x)
        weights = jax.nn.sigmoid(gate_logits)                      # (B,E)
        expert_out = Experts(E, list(self.hidden_dims), self.expert_hidden_dim,
                             2 * A, self.activation, name="experts")(x_no_goal)
        mu, log_std = jnp.split(expert_out, 2, axis=-1)            # (B,E,A)
        log_std = jnp.clip(log_std, -5.0, 2.0)
        var = jnp.exp(2 * log_std) + 1e-9
        w = weights[..., None]
        inv_var_sum = jnp.sum(w / var, axis=-2) + 1e-9
        var_total = 1.0 / inv_var_sum
        sigma = jnp.sqrt(var_total)
        mu_total = var_total * jnp.sum(w * mu / var, axis=-2)
        return mu_total, sigma, weights


# ---------------------------------------------------------------------------
# Plain PPO actor-critic (reference actor_critic.py)
# ---------------------------------------------------------------------------


class ActorCritic(nn.Module):
    num_actions: int
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(list(self.actor_hidden_dims) + [self.num_actions],
                         self.activation)
        self.critic = MLP(list(self.critic_hidden_dims) + [1], self.activation)
        # dtype MUST be explicit: a weak-typed f32 leaf changes abstract
        # signature after one optimizer step and forces a jit recompile.
        self.std = self.param("std",
                              lambda k, s: jnp.full(s, self.init_noise_std,
                                                    dtype=jnp.float32),
                              (self.num_actions,))

    def __call__(self, obs, critic_obs):
        # used only for init
        return self.actor_dist(obs), self.value(critic_obs)

    def actor_dist(self, obs):
        mu = self.actor(obs)
        return mu, jnp.broadcast_to(self.std, mu.shape)

    def value(self, critic_obs):
        return self.critic(critic_obs)[..., 0]


# ---------------------------------------------------------------------------
# CTS family (6 variants via `family` switch)
# ---------------------------------------------------------------------------

CTS_FAMILIES = ("cts", "moe_cts", "moe_ng_cts", "mcp_cts", "ac_moe_cts",
                "dual_moe_cts")


class CTSFamily(nn.Module):
    """One module covering the six concurrent-teacher-student variants.

    Methods mirror the reference model API: encoders produce a latent, the
    actor consumes (latent, obs), the critic consumes (latent.detach, priv).
    Gradient stop/flow policy is handled by the *algorithms*, which call the
    method-level apply functions — this module is pure.
    """
    family: str
    num_obs: int
    num_critic_obs: int
    num_actions: int
    history_length: int = 5
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    teacher_encoder_hidden_dims: Sequence[int] = (512, 256)
    student_encoder_hidden_dims: Sequence[int] = (512, 256)
    activation: str = "elu"
    init_noise_std: float = 1.0
    latent_dim: int = 32
    norm_type: str = "l2norm"
    expert_num: int = 8
    obs_no_goal_mask: Optional[Tuple[bool, ...]] = None

    def setup(self):
        assert self.family in CTS_FAMILIES
        fam = self.family
        self.teacher_encoder = MLP(
            list(self.teacher_encoder_hidden_dims) + [self.latent_dim],
            self.activation)
        if fam in ("moe_cts", "dual_moe_cts"):
            self.student_encoder = StudentMoEEncoder(
                self.expert_num, list(self.student_encoder_hidden_dims),
                self.latent_dim, self.activation, self.norm_type)
        elif fam == "moe_ng_cts":
            self.student_encoder = StudentMoENGEncoder(
                self.expert_num, list(self.student_encoder_hidden_dims),
                256, self.latent_dim, self.activation, self.norm_type)
        else:
            self.student_encoder = MLP(
                list(self.student_encoder_hidden_dims) + [self.latent_dim],
                self.activation)

        if fam == "mcp_cts":
            # reference passes the full actor_hidden_dims to ActorMCP
            # (actor_critic_mcp_cts.py:91-98)
            self.actor = ActorMCP(self.num_actions, list(self.actor_hidden_dims),
                                  self.expert_num, 256, self.activation)
        elif fam in ("ac_moe_cts", "dual_moe_cts"):
            self.actor = MoE(self.expert_num, list(self.actor_hidden_dims),
                             self.num_actions, self.activation)
        else:
            self.actor = MLP(list(self.actor_hidden_dims) + [self.num_actions],
                             self.activation)

        if fam in ("ac_moe_cts", "dual_moe_cts"):
            self.critic = Experts(self.expert_num, list(self.critic_hidden_dims)[:-1],
                                  self.critic_hidden_dims[-1], 1, self.activation)
        else:
            self.critic = MLP(list(self.critic_hidden_dims) + [1], self.activation)

        if fam != "mcp_cts":
            # explicit dtype: weak-typed leaves recompile after the first
            # optimizer step (signature ~float32 -> float32)
            self.std = self.param("std",
                                  lambda k, s: jnp.full(s, self.init_noise_std,
                                                        dtype=jnp.float32),
                                  (self.num_actions,))

    # -- init path --------------------------------------------------------
    def __call__(self, obs, priv, history):
        lat_t = self.t_latent(priv)
        lat_s = self.s_latent(history)[0]
        mu, std, _ = self.dist(lat_t, obs)
        v, _ = self.val(lat_t, priv, obs)
        return mu, std, v, lat_s

    # -- encoders ---------------------------------------------------------
    def t_latent(self, priv):
        """Teacher latent from privileged obs."""
        return apply_norm(self.teacher_encoder(priv), self.norm_type)

    def s_latent(self, history):
        """Student latent from flattened obs history. Returns (latent, gate_w);
        gate_w is None for non-MoE students."""
        fam = self.family
        if fam in ("moe_cts", "dual_moe_cts"):
            return self.student_encoder(history)
        if fam == "moe_ng_cts":
            B = history.shape[:-1]
            hist = history.reshape(B + (self.history_length, self.num_obs))
            # boolean mask with static count -> static-shape gather
            idx = np.nonzero(np.asarray(self.obs_no_goal_mask))[0]
            no_goal = hist[..., idx].reshape(B + (-1,))
            return self.student_encoder(history, no_goal)
        lat = apply_norm(self.student_encoder(history), self.norm_type)
        return lat, None

    # -- actor ------------------------------------------------------------
    def dist(self, latent, obs):
        """Action distribution. Returns (mu, std, actor_gate_w or None)."""
        fam = self.family
        x = jnp.concatenate([latent, obs], axis=-1)
        if fam == "mcp_cts":
            idx = np.nonzero(np.asarray(self.obs_no_goal_mask))[0]
            obs_ng = obs[..., idx]
            x_ng = jnp.concatenate([latent, obs_ng], axis=-1)
            mu, sigma, w = self.actor(x, x_ng)
            return mu, sigma, w
        if fam in ("ac_moe_cts", "dual_moe_cts"):
            mu, w = self.actor(x)
            return mu, jnp.broadcast_to(self.std, mu.shape), w
        mu = self.actor(x)
        return mu, jnp.broadcast_to(self.std, mu.shape), None

    # -- critic -----------------------------------------------------------
    def val(self, latent, priv, obs=None):
        """Value. For ac_moe/dual: gating-weighted expert values where the
        weights come from the actor's gating on (latent, obs). Returns
        (value, gate_w or None)."""
        fam = self.family
        x = jnp.concatenate([latent, priv], axis=-1)
        if fam in ("ac_moe_cts", "dual_moe_cts"):
            xa = jnp.concatenate([latent, obs], axis=-1)
            _, w = self.actor(xa)
            expert_v = self.critic(x)[..., 0]          # (B, E)
            v = jnp.sum(w * expert_v, axis=-1)
            return v, w
        return self.critic(x)[..., 0], None


def make_cts_model(family: str, num_obs: int, num_critic_obs: int,
                   num_actions: int, policy_cfg, history_length: int = 5):
    """Factory from a PolicyCfg (env/config.py)."""
    if family in ("moe_ng_cts", "mcp_cts") and policy_cfg.obs_no_goal_mask is None:
        # without the mask the goal-stripped expert input is zero-width and
        # the latent silently NaNs (fan_in 0) — fail loudly instead
        raise ValueError(f"{family} requires policy_cfg.obs_no_goal_mask")
    kwargs = dict(
        family=family,
        num_obs=num_obs,
        num_critic_obs=num_critic_obs,
        num_actions=num_actions,
        history_length=history_length,
        actor_hidden_dims=tuple(policy_cfg.actor_hidden_dims),
        critic_hidden_dims=tuple(policy_cfg.critic_hidden_dims),
        teacher_encoder_hidden_dims=tuple(policy_cfg.teacher_encoder_hidden_dims),
        student_encoder_hidden_dims=tuple(policy_cfg.student_encoder_hidden_dims),
        activation=policy_cfg.activation,
        init_noise_std=policy_cfg.init_noise_std,
        latent_dim=policy_cfg.latent_dim,
        norm_type=policy_cfg.norm_type,
        expert_num=(policy_cfg.student_expert_num
                    if family in ("moe_ng_cts", "mcp_cts") else policy_cfg.expert_num),
        obs_no_goal_mask=policy_cfg.obs_no_goal_mask,
    )
    return CTSFamily(**kwargs)
