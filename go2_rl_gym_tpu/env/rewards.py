"""Reward term library — all 26 base terms + 2 Go2-specific terms.

Pure functions over a RewardContext, mirroring the reference's
``_reward_*`` methods (reference legged_gym/envs/base/legged_robot.py:
1228-1441 and legged_gym/envs/go2/go2_env.py:55-68). Each returns (N,).
Dispatch is static: the env builds the term list from non-zero config scales
at trace time (the reference's reflection over ``_reward_`` names,
legged_robot.py:909-940, becomes a dict lookup here).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RewardContext(NamedTuple):
    """Everything reward terms may read (all batched (N, ...))."""
    base_pos: jax.Array            # (N,3)
    base_quat: jax.Array           # (N,4)
    base_lin_vel: jax.Array        # (N,3) body frame
    base_ang_vel: jax.Array        # (N,3) body frame
    projected_gravity: jax.Array   # (N,3)
    commands: jax.Array            # (N,4)
    dof_pos: jax.Array             # (N,12)
    dof_vel: jax.Array             # (N,12)
    last_dof_vel: jax.Array        # (N,12)
    actions: jax.Array             # (N,12)
    last_actions: jax.Array        # (N,12)
    last_last_actions: jax.Array   # (N,12)
    torques: jax.Array             # (N,12)
    contact_forces: jax.Array      # (N,nb,3)
    foot_forces: jax.Array         # (N,4,3)
    foot_pos: jax.Array            # (N,4,3) world
    foot_vel: jax.Array            # (N,4,3) world
    feet_air_time: jax.Array       # (N,4) (already incremented this step)
    first_contact: jax.Array       # (N,4) bool
    contact_filt: jax.Array        # (N,4) bool
    measured_heights: jax.Array    # (N,P) or (N,0)
    base_height: jax.Array         # (N,) estimated height above ground
    reset_buf: jax.Array           # (N,) bool
    time_out_buf: jax.Array        # (N,) bool
    # static-ish per-env data
    default_dof_pos: jax.Array     # (12,)
    dof_pos_limits: jax.Array      # (12,2) soft limits
    dof_vel_limits: jax.Array      # (12,)
    torque_limits: jax.Array       # (12,)
    tracking_sigma_lin: jax.Array  # (N,2) per-axis sigma (dynamic-sigma aware)
    tracking_sigma_ang: jax.Array  # (N,)
    dt: float
    cfg: object                    # RewardsCfg (static)
    penalized_bodies: tuple        # body indices with contact penalty
    termination_bodies: tuple
    hip_idx: tuple = (0, 3, 6, 9)


# --- individual terms (names match reference `_reward_<name>`) --------------


def lin_vel_z(c):
    return jnp.square(c.base_lin_vel[:, 2])


def ang_vel_xy(c):
    return jnp.sum(jnp.square(c.base_ang_vel[:, :2]), axis=1)


def orientation(c):
    return jnp.sum(jnp.square(c.projected_gravity[:, :2]), axis=1)


def base_height(c):
    """Feet-contact-referenced base height error (legged_robot.py:1245-1259)."""
    num_contact = jnp.maximum(jnp.sum(c.contact_filt, axis=1), 1.0)
    feet_contact_pos = (jnp.sum(c.foot_pos * c.contact_filt[..., None], axis=1)
                        / num_contact[:, None])
    delta = feet_contact_pos - c.base_pos
    h = jnp.sum(delta * c.projected_gravity, axis=1)
    rew = jnp.square(h - c.cfg.base_height_target)
    return rew * (jnp.sum(c.contact_filt, axis=1) > 0)


def torques(c):
    return jnp.sum(jnp.square(c.torques), axis=1)


def dof_vel(c):
    return jnp.sum(jnp.square(c.dof_vel), axis=1)


def dof_acc(c):
    return jnp.sum(jnp.square((c.last_dof_vel - c.dof_vel) / c.dt), axis=1)


def action_rate(c):
    return jnp.sum(jnp.square(c.last_actions - c.actions), axis=1)


def collision(c):
    f = c.contact_forces[:, jnp.asarray(c.penalized_bodies), :]
    return jnp.sum((jnp.linalg.norm(f, axis=-1) > 0.1).astype(jnp.float32), axis=1)


def termination(c):
    return (c.reset_buf & ~c.time_out_buf).astype(jnp.float32)


def dof_pos_limits(c):
    lo = -jnp.clip(c.dof_pos - c.dof_pos_limits[:, 0], a_max=0.0)
    hi = jnp.clip(c.dof_pos - c.dof_pos_limits[:, 1], a_min=0.0)
    return jnp.sum(lo + hi, axis=1)


def dof_vel_limits(c):
    return jnp.sum(jnp.clip(
        jnp.abs(c.dof_vel) - c.dof_vel_limits * c.cfg.soft_dof_vel_limit,
        0.0, 1.0), axis=1)


def torque_limits(c):
    return jnp.sum(jnp.clip(
        jnp.abs(c.torques) - c.torque_limits * c.cfg.soft_torque_limit,
        a_min=0.0), axis=1)


def tracking_lin_vel(c):
    err_sq = jnp.square(c.commands[:, :2] - c.base_lin_vel[:, :2])
    scaled = err_sq[:, 0] / c.tracking_sigma_lin[:, 0] + err_sq[:, 1] / c.tracking_sigma_lin[:, 1]
    return jnp.exp(-scaled)


def tracking_ang_vel(c):
    err_sq = jnp.square(c.commands[:, 2] - c.base_ang_vel[:, 2])
    return jnp.exp(-err_sq / c.tracking_sigma_ang)


def feet_air_time(c):
    rew = jnp.sum((c.feet_air_time - 0.5) * c.first_contact, axis=1)
    return rew * (jnp.linalg.norm(c.commands[:, :2], axis=1) > 0.1)


def stumble(c):
    fxy = jnp.linalg.norm(c.foot_forces[:, :, :2], axis=2)
    fz = jnp.abs(c.foot_forces[:, :, 2])
    return jnp.any(fxy > 5.0 * fz, axis=1).astype(jnp.float32)


def stand_still(c):
    return (jnp.sum(jnp.abs(c.dof_pos - c.default_dof_pos), axis=1)
            * (jnp.linalg.norm(c.commands[:, :2], axis=1) < 0.1))


def feet_contact_forces(c):
    return jnp.sum(jnp.clip(
        jnp.linalg.norm(c.foot_forces, axis=-1) - c.cfg.max_contact_force,
        a_min=0.0), axis=1)


def action_smoothness(c):
    return jnp.sum(jnp.square(c.actions - 2 * c.last_actions + c.last_last_actions),
                   axis=1)


def dof_power(c):
    return jnp.sum(jnp.abs(c.torques * c.dof_vel), axis=1)


def correct_base_height(c):
    """Height-scan-referenced base height (legged_robot.py:1387-1402)."""
    return jnp.square(c.base_height - c.cfg.base_height_target)


def feet_regulation(c):
    """CTS foot-lift regularization (legged_robot.py:1404-1414)."""
    delta_feet = c.foot_pos - c.base_pos[:, None, :]
    feet2base_h = jnp.sum(delta_feet * c.projected_gravity[:, None, :], axis=-1)
    feet_h = jnp.clip(c.base_height[:, None] - feet2base_h, a_min=0.0)
    vxy_sq = jnp.sum(jnp.square(c.foot_vel[:, :, :2]), axis=-1)
    return jnp.sum(vxy_sq * jnp.exp(-feet_h / (0.025 * c.cfg.base_height_target)),
                   axis=-1)


def similar_to_default(c):
    return jnp.sum(jnp.abs(c.dof_pos - c.default_dof_pos), axis=1)


def upright(c):
    return (-1.0 - c.projected_gravity[:, 2]) / 2.0


def legs_distance(c):
    """Penalize front/rear feet y-distance below min (legged_robot.py:1423-1441)."""
    from go2_rl_gym_tpu.core import maths
    rel = c.foot_pos - c.base_pos[:, None, :]
    local = maths.quat_rotate_inverse(c.base_quat[:, None, :], rel)
    dy_front = local[:, 0, 1] - local[:, 1, 1]
    dy_rear = local[:, 2, 1] - local[:, 3, 1]
    m = c.cfg.min_legs_distance
    return (jnp.square(jnp.clip(m - dy_front, a_min=0.0))
            + jnp.square(jnp.clip(m - dy_rear, a_min=0.0)))


def hip_to_default(c):
    """Go2 extra (go2_env.py:55-60)."""
    idx = jnp.asarray(c.hip_idx)
    return jnp.sum(jnp.abs(c.dof_pos[:, idx] - c.default_dof_pos[idx]), axis=1)


def x_command_hip_regular(c):
    """Go2 extra (go2_env.py:62-68)."""
    idx = jnp.asarray(c.hip_idx)
    hip = c.dof_pos[:, idx]
    ratio = jnp.abs(c.commands[:, 0]) / (jnp.linalg.norm(c.commands[:, :3], axis=1) + 1e-9)
    rew = jnp.abs(hip[:, 0] + hip[:, 1]) + jnp.abs(hip[:, 2] + hip[:, 3])
    return rew * ratio


REWARD_TERMS = {
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "orientation": orientation,
    "base_height": base_height,
    "torques": torques,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "action_rate": action_rate,
    "collision": collision,
    "termination": termination,
    "dof_pos_limits": dof_pos_limits,
    "dof_vel_limits": dof_vel_limits,
    "torque_limits": torque_limits,
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "feet_air_time": feet_air_time,
    "feet_stumble": stumble,
    "stumble": stumble,
    "stand_still": stand_still,
    "feet_contact_forces": feet_contact_forces,
    "action_smoothness": action_smoothness,
    "dof_power": dof_power,
    "correct_base_height": correct_base_height,
    "feet_regulation": feet_regulation,
    "similar_to_default": similar_to_default,
    "upright": upright,
    "legs_distance": legs_distance,
    "hip_to_default": hip_to_default,
    "x_command_hip_regular": x_command_hip_regular,
}
