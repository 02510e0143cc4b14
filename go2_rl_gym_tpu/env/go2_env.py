"""Go2 locomotion environment — pure-functional, fully jittable.

TPU-native counterpart of the reference env stack (reference
legged_gym/envs/base/legged_robot.py + legged_gym/envs/go2/go2_env.py +
base_task.py). One `step(state, actions)` reproduces the reference's
§3.2 pipeline exactly — 4x-decimation PD control against the engine,
post-physics bookkeeping, command machinery (dynamic resampling, limit-vel
combos, zero-command curriculum, per-terrain command caps), terrain / reward /
command curricula, termination, all reward terms, turn-over recovery mode,
pushes, domain randomization, observation + noise — but as a single pure
function on an EnvState pytree, so the whole thing fuses into the jitted
train step.

Reference -> TPU translation notes:
* ``reset_idx(env_ids)`` gather/scatter resets become dense masked
  ``jnp.where`` updates (same math, fixed shapes).
* The imperative command-range curriculum (legged_robot.py:433-446 pops list
  entries) becomes a pure piecewise function of the iteration counter.
* Creation-time DR (friction buckets / masses / CoM,
  legged_robot.py:320-402) is re-rolled at every env reset instead of once at
  creation — a strict superset of the reference's randomization.
* The RNG is a single threaded JAX key; every named randomness site consumes
  a fixed number of subkeys per step regardless of masks, so trajectories are
  reproducible for a fixed seed.
"""
from __future__ import annotations

import math
from itertools import product
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.core import maths
from go2_rl_gym_tpu.env import rewards as reward_lib
from go2_rl_gym_tpu.env.config import Go2Cfg
from go2_rl_gym_tpu.sim import engine
from go2_rl_gym_tpu.sim.model import (GROUP_BASE, GROUP_CALF, GROUP_THIGH,
                                      RobotModel, go2_model)
from go2_rl_gym_tpu.terrain import generator


class EnvState(NamedTuple):
    """Complete batched environment state (the reference's buffer soup,
    legged_robot.py:765-859, as one pytree)."""
    sim: engine.SimState                  # batched (N, ...)
    dyn: engine.DynParams                 # batched
    # reset-time DR (legged_robot.py:195-206)
    motor_strength: jax.Array             # (N,12)
    motor_offset: jax.Array               # (N,12)
    kp_mult: jax.Array                    # (N,12)
    kd_mult: jax.Array                    # (N,12)
    # action / dof bookkeeping
    actions: jax.Array                    # (N,12)
    last_actions: jax.Array
    last_last_actions: jax.Array
    last_dof_vel: jax.Array
    episode_length: jax.Array             # (N,) int32
    # feet
    feet_air_time: jax.Array              # (N,4)
    last_contacts: jax.Array              # (N,4) bool
    last_contacts2: jax.Array             # (N,4) bool
    # commands
    commands: jax.Array                   # (N,4)
    commands_resampling_step: jax.Array   # (N,)
    commands_xy_accum: jax.Array          # (N,2)
    stop_heading: jax.Array               # (N,) bool
    last_is_limit_vel: jax.Array          # (N,) bool
    turn_over_timer: jax.Array            # (N,)
    # performance-based command curriculum (vanilla variant)
    cmd_range_x: jax.Array                # (2,)
    # terrain
    terrain_levels: jax.Array             # (N,) int32
    terrain_types: jax.Array              # (N,) int32
    terrain_ids: jax.Array                # (N,) int32 terrain-type id
    env_origins: jax.Array                # (N,3)
    max_move_distance: jax.Array          # (N,)
    # cached sim outputs (post-physics refresh)
    torques: jax.Array                    # (N,12)
    contact_forces: jax.Array             # (N,13,3)
    foot_forces: jax.Array                # (N,4,3)
    foot_pos: jax.Array                   # (N,4,3)
    foot_vel: jax.Array                   # (N,4,3)
    # episodic reward accumulators
    episode_sums: Dict[str, jax.Array]    # name -> (N,)
    # counters / rng
    common_step_counter: jax.Array        # () int32
    key: jax.Array


class StepOutput(NamedTuple):
    obs: jax.Array
    privileged_obs: jax.Array
    rew: jax.Array
    done: jax.Array
    time_outs: jax.Array
    metrics: Dict[str, jax.Array]


class Go2Env:
    """Builds static tables from cfg and exposes pure init/step functions."""

    def __init__(self, cfg: Go2Cfg, model: Optional[RobotModel] = None,
                 num_steps_per_env: int = 24, terrain_seed: int = 0):
        self.cfg = cfg
        self.model = model or go2_model()
        self.layout = engine.quad_layout(self.model)
        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.dt
        self.max_episode_length = cfg.max_episode_length
        self.max_episode_length_s = cfg.env.episode_length_s
        self.num_steps_per_env = num_steps_per_env

        self.sim_params = engine.SimParams(dt=cfg.sim.dt, gravity=cfg.sim.gravity)

        # ---- terrain ----
        if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            self.grid = generator.build_terrain(cfg.terrain, seed=terrain_seed)
            self.terrain = engine.make_terrain_data(
                self.grid.heights_m, self.grid.horizontal_scale,
                self.grid.border_size)
            self.terrain_origins = jnp.asarray(self.grid.env_origins, jnp.float32)
            # empty in randomized mode -> per-terrain caps/ids disabled
            # (reference legged_robot.py:863-870, 1074-1075)
            self.cols2id = (np.asarray(self.grid.cols2id)
                            if len(self.grid.cols2id) else None)
            self.custom_origins = True
            self.terrain_type_names = {
                name: cols for name, cols in self.grid.name2cols.items()}
        else:
            self.grid = None
            self.terrain = engine.flat_terrain()
            self.custom_origins = False
            self.terrain_type_names = {}
            # grid of robots (legged_robot.py:1081-1091)
            num_cols = int(np.floor(np.sqrt(self.num_envs)))
            num_rows = int(np.ceil(self.num_envs / num_cols))
            xx, yy = np.meshgrid(np.arange(num_rows), np.arange(num_cols),
                                 indexing="ij")
            spacing = cfg.env.env_spacing
            origins = np.zeros((self.num_envs, 3), np.float32)
            origins[:, 0] = spacing * xx.flatten()[: self.num_envs]
            origins[:, 1] = spacing * yy.flatten()[: self.num_envs]
            self.flat_origins = jnp.asarray(origins)

        # ---- joint defaults / gains (legged_robot.py:843-859) ----
        angles = np.zeros(12, np.float32)
        kp = np.zeros(12, np.float32)
        kd = np.zeros(12, np.float32)
        for i, name in enumerate(self.model.dof_names):
            angles[i] = cfg.init_state.default_joint_angles[name]
            for dof_name, val in cfg.control.stiffness.items():
                if dof_name in name:
                    kp[i] = val
                    kd[i] = cfg.control.damping[dof_name]
        self.default_dof_pos = jnp.asarray(angles)
        self.p_gains = jnp.asarray(kp)
        self.d_gains = jnp.asarray(kd)
        self.torque_limits = jnp.asarray(self.model.dof_effort_limit, jnp.float32)
        self.dof_vel_limits = jnp.asarray(self.model.dof_vel_limit, jnp.float32)

        # soft dof limits (legged_robot.py:366-375)
        lo = self.model.dof_lower
        hi = self.model.dof_upper
        mid = (lo + hi) / 2
        rng = hi - lo
        soft = cfg.rewards.soft_dof_pos_limit
        self.soft_dof_limits = jnp.asarray(
            np.stack([mid - 0.5 * rng * soft, mid + 0.5 * rng * soft], 1),
            jnp.float32)

        # ---- height-scan points (legged_robot.py:1172-1186) ----
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y),
                             indexing="ij")
        pts = np.zeros((gx.size, 3), np.float32)
        pts[:, 0] = gx.flatten()
        pts[:, 1] = gy.flatten()
        self.height_points = jnp.asarray(pts)
        self.num_height_points = gx.size
        scan_mask = ((np.abs(pts[:, 0]) <= 0.2) & (np.abs(pts[:, 1]) <= 0.15))
        self.base_scan_mask = jnp.asarray(scan_mask.astype(np.float32))
        self.num_base_scan = float(scan_mask.sum())

        # ---- contact body groups ----
        gb = self.model.geom_body
        gg = self.model.geom_group
        body_group = np.zeros(self.model.nb, np.int32)
        for g, b in zip(gg, gb):
            body_group[b] = max(body_group[b], g) if g != 4 else body_group[b]
        # bodies: 0 base, 1+3l hips, 2+3l thighs, 3+3l calfs
        self.termination_bodies = (0,)
        self.penalized_bodies = tuple(
            b for b in range(self.model.nb)
            if any(n in self.model.body_names[b].lower()
                   for n in cfg.asset.penalize_contacts_on))

        # ---- command machinery tables ----
        c = cfg.commands
        self.limit_vel_comb = jnp.asarray(list(product(
            c.limit_vel["lin_vel_x"], c.limit_vel["lin_vel_y"],
            c.limit_vel["ang_vel_yaw"])), jnp.int32)
        caps = np.zeros((len(c.terrain_max_command_ranges), 4, 2), np.float32)
        for i, entry in enumerate(c.terrain_max_command_ranges):
            caps[i, 0] = entry["lin_vel_x"]
            caps[i, 1] = entry["lin_vel_y"]
            caps[i, 2] = entry["ang_vel_yaw"]
            caps[i, 3] = entry["heading"]
        self.terrain_cmd_caps = jnp.asarray(caps)
        self.cmd_curriculum = sorted(c.command_range_curriculum,
                                     key=lambda e: e["iter"])

        # ---- rewards ----
        scales = {k: v for k, v in cfg.rewards.scales.items() if v != 0.0}
        to_scales = ({k: v for k, v in cfg.rewards.turn_over_scales.items() if v != 0.0}
                     if cfg.init_state.turn_over else {})
        self.reward_scales = {k: v * self.dt for k, v in scales.items()}
        self.turn_over_scales = {k: v * self.dt for k, v in to_scales.items()}
        names = set(self.reward_scales) | set(self.turn_over_scales)
        self.termination_scale = self.reward_scales.pop("termination", None)
        names.discard("termination")
        self.reward_names = sorted(names)
        self.curriculum_rewards = {e["reward_name"]: e
                                   for e in (cfg.rewards.curriculum_rewards or [])}
        ds = cfg.rewards.dynamic_sigma
        self.terrain_max_sigmas = (jnp.asarray(ds["max_sigma"], jnp.float32)
                                   if ds else None)

        # ---- noise vector (go2_env.py:9-21) ----
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        os_ = cfg.normalization.obs_scales
        nv = np.zeros(self.num_obs, np.float32)
        nv[0:3] = ns.ang_vel * lvl * os_.ang_vel
        nv[3:6] = ns.gravity * lvl
        nv[6:9] = 0.0
        nv[9:21] = ns.dof_pos * lvl * os_.dof_pos
        nv[21:33] = ns.dof_vel * lvl * os_.dof_vel
        nv[33:45] = 0.0
        self.noise_vec = jnp.asarray(nv)
        self.commands_scale = jnp.asarray(
            [os_.lin_vel, os_.lin_vel, os_.ang_vel], jnp.float32)

        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
        from go2_rl_gym_tpu.sim import tengine
        self.physics_step = tengine.make_physics_step(
            self.model, self.sim_params, self.terrain, cfg.control.decimation)

    # ------------------------------------------------------------------
    # Curriculum helpers (pure functions of the iteration counter)
    # ------------------------------------------------------------------

    def _current_iter(self, counter):
        return counter // self.num_steps_per_env

    @staticmethod
    def _interp_curriculum(entry, it):
        """Linear interpolation (legged_robot.py:154-168)."""
        pct = ((it - entry["start_iter"]) /
               max(entry["end_iter"] - entry["start_iter"], 1))
        pct = jnp.clip(pct, 0.0, 1.0)
        return (1.0 - pct) * entry["start_value"] + pct * entry["end_value"]

    def _reward_curriculum_scale(self, name, it):
        if name not in self.curriculum_rewards:
            return None
        return self._interp_curriculum(self.curriculum_rewards[name], it)

    def _command_ranges(self, it, cmd_range_x):
        """Piecewise command ranges (replaces the list-pop mutation at
        legged_robot.py:433-446). Returns (4,2) array rows
        [lin_vel_x, lin_vel_y, ang_vel_yaw, heading]."""
        r = self.cfg.commands.ranges
        base = jnp.asarray([list(r.lin_vel_x), list(r.lin_vel_y),
                            list(r.ang_vel_yaw), list(r.heading)], jnp.float32)
        if self.cfg.commands.curriculum:
            base = base.at[0].set(cmd_range_x)
        for entry in self.cmd_curriculum:
            stage = jnp.asarray([entry["lin_vel_x"], entry["lin_vel_y"],
                                 entry["ang_vel_yaw"], entry["heading"]],
                                jnp.float32)
            base = jnp.where(it >= entry["iter"], stage, base)
        return base

    def _env_command_ranges(self, ranges, terrain_ids):
        """Per-env ranges = global ranges clipped by per-terrain-type caps
        (legged_robot.py:861-907). Returns (N,4,2)."""
        if self.grid is None or self.cols2id is None:
            return jnp.broadcast_to(ranges, (self.num_envs, 4, 2))
        caps = self.terrain_cmd_caps[terrain_ids]       # (N,4,2)
        lo = jnp.maximum(caps[..., 0], ranges[None, :, 0])
        hi = jnp.minimum(caps[..., 1], ranges[None, :, 1])
        return jnp.stack([lo, hi], axis=-1)

    # ------------------------------------------------------------------
    # Reset pieces (masked dense updates)
    # ------------------------------------------------------------------

    def _sample_dyn(self, key) -> engine.DynParams:
        """Physical-property DR (reference creation-time callbacks,
        legged_robot.py:320-402), dense over all envs."""
        dr = self.cfg.domain_rand
        N = self.num_envs
        nb = self.model.nb
        k = jax.random.split(key, 6)
        mass = jnp.broadcast_to(jnp.asarray(self.model.mass, jnp.float32), (N, nb))
        com = jnp.broadcast_to(jnp.asarray(self.model.com, jnp.float32), (N, nb, 3))
        inertia = jnp.broadcast_to(
            jnp.asarray(self.model.inertia, jnp.float32), (N, nb, 3, 3))
        if dr.randomize_base_mass:
            added = maths.uniform(k[0], (N,), *dr.added_mass_range)
            mass = mass.at[:, 0].add(added)
        if dr.randomize_link_mass:
            mult = maths.uniform(k[1], (N, nb - 1), *dr.multiplied_link_mass_range)
            mass = mass.at[:, 1:].multiply(mult)
            inertia = inertia.at[:, 1:].multiply(mult[..., None, None])
        if dr.randomize_base_com:
            dcom = maths.uniform(k[2], (N, 3), *dr.added_base_com_range)
            com = com.at[:, 0].add(dcom)
        if dr.randomize_friction:
            fr = maths.uniform(k[3], (N,), *dr.friction_range)
        else:
            fr = jnp.full((N,), self.cfg.terrain.static_friction)
        # combine = (terrain + robot)/2 (UPDATE.md:99)
        friction = (self.cfg.terrain.static_friction + fr) / 2.0
        if dr.randomize_restitution:
            re = maths.uniform(k[4], (N,), *dr.restitution_range)
        else:
            re = jnp.zeros(N)
        restitution = (self.cfg.terrain.restitution + re) / 2.0
        return engine.DynParams(mass=mass, com=com, inertia=inertia,
                                friction=friction, restitution=restitution)

    def _sample_control_dr(self, key):
        dr = self.cfg.domain_rand
        N = self.num_envs
        k = jax.random.split(key, 4)
        strength = (maths.uniform(k[0], (N, 12), *dr.motor_strength_range)
                    if dr.randomize_motor_strength else jnp.ones((N, 12)))
        offset = (maths.uniform(k[1], (N, 12), *dr.motor_zero_offset_range)
                  if dr.randomize_motor_zero_offset else jnp.zeros((N, 12)))
        kp_m = (maths.uniform(k[2], (N, 12), *dr.stiffness_multiplier_range)
                if dr.randomize_pd_gains else jnp.ones((N, 12)))
        kd_m = (maths.uniform(k[3], (N, 12), *dr.damping_multiplier_range)
                if dr.randomize_pd_gains else jnp.ones((N, 12)))
        return strength, offset, kp_m, kd_m

    def _sample_root_state(self, key, env_origins):
        """Spawn pose/velocity (legged_robot.py:635-707), dense (N, ...)."""
        cfg = self.cfg.init_state
        N = self.num_envs
        k = jax.random.split(key, 6)
        yaw = maths.uniform(k[0], (N,), -np.pi, np.pi)
        roll = jnp.zeros(N)
        z_off = jnp.full((N,), cfg.pos[2])
        turn_timer = jnp.zeros(N)
        if cfg.turn_over:
            prob = jax.random.uniform(k[1], (N,))
            p_back, p_side, _ = cfg.turn_over_proportions
            back = prob < p_back
            side = (prob >= p_back) & (prob < p_back + p_side)
            hb = maths.uniform(k[2], (N,), *cfg.turn_over_init_heights["backflip"])
            hs = maths.uniform(k[3], (N,), *cfg.turn_over_init_heights["sideflip"])
            side_sign = jnp.where(jax.random.uniform(k[4], (N,)) < 0.5, 1.0, -1.0)
            roll = jnp.where(back, np.pi, jnp.where(side, side_sign * np.pi / 2, 0.0))
            z_off = jnp.where(back, hb, jnp.where(side, hs, z_off))
            tz = self.cfg.commands.turn_over_zero_time
            turn_timer = jnp.where(back, tz["backflip"],
                                   jnp.where(side, tz["sideflip"], 0.0))
        quat = maths.quat_from_euler_xyz(roll, jnp.zeros(N), yaw)
        pos = env_origins + jnp.stack(
            [jnp.zeros(N), jnp.zeros(N), z_off], axis=-1)
        if self.custom_origins:
            jitter = maths.uniform(k[5], (N, 2), -1.0, 1.0)
            pos = pos.at[:, :2].add(jitter)
        vel = maths.uniform(jax.random.fold_in(key, 7), (N, 6), -0.5, 0.5)
        return pos, quat, vel, turn_timer

    def _sample_dofs(self, key):
        mult = maths.uniform(key, (self.num_envs, 12), 0.5, 1.5)
        return self.default_dof_pos * mult

    def _update_terrain_curriculum(self, state: EnvState, done, key):
        """Game-inspired terrain curriculum (legged_robot.py:1143-1169)."""
        cfg = self.cfg
        if self.grid is None or not cfg.terrain.curriculum:
            return state.terrain_levels, state.terrain_types, state.env_origins
        dist = state.max_move_distance
        move_up = dist > self.grid.env_length / 2
        if cfg.terrain.move_down_by_accumulated_xy_command:
            zero_p = self._zero_command_proba(
                self._current_iter(state.common_step_counter))
            need = (jnp.linalg.norm(state.commands_xy_accum, axis=1)
                    * (cfg.commands.resampling_time * (1 - zero_p)) * 0.5)
            move_down = (dist < need) & ~move_up
        else:
            move_down = (dist < jnp.linalg.norm(state.commands[:, :2], axis=1)
                         * self.max_episode_length_s * 0.5) & ~move_up
        levels = state.terrain_levels + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
        max_level = cfg.terrain.num_rows
        rand_lvl = jax.random.randint(key, (self.num_envs,), 0, max_level)
        levels = jnp.where(levels >= max_level, rand_lvl, jnp.clip(levels, 0))
        levels = jnp.where(done, levels, state.terrain_levels)
        origins = self.terrain_origins[levels, state.terrain_types]
        origins = jnp.where(done[:, None], origins, state.env_origins)
        return levels, state.terrain_types, origins

    def _zero_command_proba(self, it):
        zc = self.cfg.commands.zero_command_curriculum
        if zc is None:
            return jnp.asarray(0.0)
        return self._interp_curriculum(zc, it)

    # ------------------------------------------------------------------
    # Command resampling (legged_robot.py:423-592), dense masked
    # ------------------------------------------------------------------

    def _resample_commands(self, state: EnvState, mask, key):
        cfg = self.cfg.commands
        N = self.num_envs
        it = self._current_iter(state.common_step_counter)
        ranges = self._command_ranges(it, state.cmd_range_x)
        env_ranges = self._env_command_ranges(ranges, state.terrain_ids)  # (N,4,2)
        max_lin_vel = jnp.max(jnp.abs(ranges[:2]))

        keys = jax.random.split(key, 10)
        commands = state.commands
        stop_heading = jnp.where(mask, False, state.stop_heading)
        resample_step = jnp.where(
            mask, cfg.resampling_time / self.dt, state.commands_resampling_step)

        remaining_dist = jnp.clip(
            0.625 * self.cfg.terrain.terrain_length
            - jnp.linalg.norm(state.commands_xy_accum, axis=1) * cfg.resampling_time,
            0.0)

        if cfg.dynamic_resample_commands:
            vel_low = jnp.clip(
                remaining_dist
                / ((self.max_episode_length - state.episode_length + 1e-9) * self.dt),
                0.0)
            cx = maths.sample_disjoint_intervals(
                keys[0], vel_low, env_ranges[:, 0, 0], env_ranges[:, 0, 1])
            cy = maths.sample_disjoint_intervals(
                keys[1], vel_low, env_ranges[:, 1, 0], env_ranges[:, 1, 1])
            cz = maths.sample_single_interval(
                keys[2], env_ranges[:, 2, 0], env_ranges[:, 2, 1])
            ch = maths.sample_single_interval(
                keys[3], env_ranges[:, 3, 0], env_ranges[:, 3, 1])
        else:
            cx = maths.sample_single_interval(
                keys[0], env_ranges[:, 0, 0], env_ranges[:, 0, 1])
            cy = maths.sample_single_interval(
                keys[1], env_ranges[:, 1, 0], env_ranges[:, 1, 1])
            cz = maths.sample_single_interval(
                keys[2], env_ranges[:, 2, 0], env_ranges[:, 2, 1])
            ch = maths.sample_single_interval(
                keys[3], env_ranges[:, 3, 0], env_ranges[:, 3, 1])
            # zero small commands (legged_robot.py:507)
            small = jnp.linalg.norm(jnp.stack([cx, cy], 1), axis=1) <= 0.2
            cx = jnp.where(small, 0.0, cx)
            cy = jnp.where(small, 0.0, cy)

        new_cmd = jnp.stack(
            [cx, cy,
             jnp.where(cfg.heading_command, state.commands[:, 2], cz),
             jnp.where(cfg.heading_command, ch, state.commands[:, 3])], axis=1)
        commands = jnp.where(mask[:, None], new_cmd, commands)

        # --- limit-vel sampling (legged_robot.py:509-553) ---
        rand_prob = jax.random.uniform(keys[4], (N,))
        min_prob = 0.0
        last_is_limit = state.last_is_limit_vel
        if cfg.limit_vel_prob > 0.0:
            lim_mask = mask & (rand_prob >= min_prob) & (rand_prob < min_prob + cfg.limit_vel_prob)
            if cfg.limit_vel_invert_when_continuous:
                invert = lim_mask & state.last_is_limit_vel
                commands = jnp.where(
                    invert[:, None],
                    commands.at[:, :3].multiply(-1.0),
                    commands)
                change = lim_mask & ~state.last_is_limit_vel
            else:
                change = lim_mask
            idx = jax.random.randint(keys[5], (N,), 0, self.limit_vel_comb.shape[0])
            comb = self.limit_vel_comb[idx]                       # (N,3)
            def pick(axis):
                lim = jnp.where(comb[:, axis] == -1,
                                env_ranges[:, axis, 0], env_ranges[:, axis, 1])
                return jnp.where(comb[:, axis] == 0, 0.0, lim)
            lim_cmd = jnp.stack([pick(0), pick(1), pick(2)], axis=1)
            commands = jnp.where(change[:, None],
                                 jnp.concatenate([lim_cmd, commands[:, 3:]], 1),
                                 commands)
            if cfg.heading_command and cfg.stop_heading_at_limit:
                stop_heading = jnp.where(lim_mask, True, stop_heading)
            last_is_limit = jnp.where(mask, lim_mask, state.last_is_limit_vel)
            min_prob += cfg.limit_vel_prob

        # --- zero-command curriculum (legged_robot.py:556-583) ---
        zero_p = self._zero_command_proba(it)
        next_resample = jnp.clip(
            self.max_episode_length - state.episode_length
            - remaining_dist / (0.8 * max_lin_vel * self.dt + 1e-9),
            0.0, cfg.resampling_time / self.dt)
        zero_mask = (mask & (rand_prob >= min_prob)
                     & (rand_prob < min_prob + zero_p) & (next_resample > 0.0))
        commands = jnp.where(zero_mask[:, None],
                             commands.at[:, :2].set(0.0), commands)
        resample_step = jnp.where(zero_mask, next_resample, resample_step)
        if cfg.limit_ang_vel_at_zero_command_prob > 0.0:
            ang_rand = jax.random.uniform(keys[6], (N,))
            add_ang = zero_mask & (ang_rand < cfg.limit_ang_vel_at_zero_command_prob)
            direction = jax.random.uniform(keys[7], (N,))
            ang_cmd = jnp.where(direction < 0.5,
                                env_ranges[:, 2, 0], env_ranges[:, 2, 1])
            commands = jnp.where(add_ang[:, None],
                                 commands.at[:, 2].set(ang_cmd), commands)
            if cfg.heading_command:
                stop_heading = jnp.where(add_ang, True, stop_heading)

        # --- turn-over zero command (legged_robot.py:586-590) ---
        if self.cfg.init_state.turn_over:
            to_mask = mask & (state.turn_over_timer > 0)
            commands = jnp.where(to_mask[:, None],
                                 commands.at[:, :3].set(0.0), commands)
            stop_heading = jnp.where(to_mask, True, stop_heading)

        xy_accum = state.commands_xy_accum + jnp.where(
            mask[:, None], commands[:, :2], 0.0)

        return state._replace(
            commands=commands,
            commands_resampling_step=resample_step,
            commands_xy_accum=xy_accum,
            stop_heading=stop_heading,
            last_is_limit_vel=last_is_limit,
        )

    # ------------------------------------------------------------------
    # Heights / observations
    # ------------------------------------------------------------------

    def _get_heights(self, sim: engine.SimState, patch_data=None):
        """187-point yaw-rotated height scan (legged_robot.py:1188-1224).

        Component-wise (N, P) math: an (N, P, 3) intermediate would pad its
        trailing dim 3 to 128 TPU lanes (40x HBM blowup). When the physics
        step extracted terrain patches this reuses them (one in-patch one-hot
        lookup instead of a 187xN global gather)."""
        if self.grid is None:
            return jnp.zeros((self.num_envs, self.num_height_points))
        # yaw-only rotation from the quat's z,w components (normalized)
        qz = sim.base_quat[:, 2:3]
        qw = sim.base_quat[:, 3:4]
        nrm = jnp.sqrt(qz * qz + qw * qw) + 1e-9
        qz, qw = qz / nrm, qw / nrm
        cos_t = 1.0 - 2.0 * qz * qz
        sin_t = 2.0 * qz * qw
        hx = self.height_points[:, 0]          # (P,)
        hy = self.height_points[:, 1]
        px = sim.base_pos[:, 0:1] + cos_t * hx - sin_t * hy    # (N,P)
        py = sim.base_pos[:, 1:2] + sin_t * hx + cos_t * hy
        t = self.terrain
        ix_f = (px + t.border_offset) / t.horizontal_scale
        iy_f = (py + t.border_offset) / t.horizontal_scale
        if patch_data is not None:
            from go2_rl_gym_tpu.ops import terrain_patches as tp
            patches_flat, origins = patch_data
            hmin, _, _ = tp.lookup(patches_flat, origins,
                                   ix_f.astype(jnp.int32),
                                   iy_f.astype(jnp.int32))
            return hmin
        hs = t.height
        ix = jnp.clip(ix_f.astype(jnp.int32), 0, hs.shape[0] - 2)
        iy = jnp.clip(iy_f.astype(jnp.int32), 0, hs.shape[1] - 2)
        h1 = hs[ix, iy]
        h2 = hs[ix + 1, iy]
        h3 = hs[ix, iy + 1]
        return jnp.minimum(jnp.minimum(h1, h2), h3)

    def _base_height_est(self, sim, measured_heights):
        """Estimated base height above ground (legged_robot.py:1387-1397)."""
        if not self.cfg.terrain.measure_heights or self.grid is None:
            return sim.base_pos[:, 2]
        ground = jnp.sum(measured_heights * self.base_scan_mask, axis=1) / self.num_base_scan
        return sim.base_pos[:, 2] - ground

    def _observations(self, sim, commands, actions, measured_heights,
                      base_ang_vel_b, projected_gravity, base_lin_vel_b,
                      torques, foot_forces, dof_acc, noise_key):
        os_ = self.cfg.normalization.obs_scales
        dq = (sim.q - self.default_dof_pos) * os_.dof_pos
        obs = jnp.concatenate([
            base_ang_vel_b * os_.ang_vel,
            projected_gravity,
            commands[:, :3] * self.commands_scale,
            dq,
            sim.qd * os_.dof_vel,
            actions,
        ], axis=-1)
        heights = jnp.clip(
            sim.base_pos[:, 2:3] - 0.5 - measured_heights, -1.0, 1.0
        ) * os_.height_measurements
        priv = jnp.concatenate([
            base_lin_vel_b * os_.lin_vel,
            obs,
            jnp.linalg.norm(foot_forces, axis=-1) * 1e-3,
            torques / self.torque_limits,
            dof_acc * 1e-4,
            heights,
        ], axis=-1)
        if self.cfg.noise.add_noise:
            noise = (2.0 * jax.random.uniform(noise_key, obs.shape) - 1.0) * self.noise_vec
            obs = obs + noise
        clip = self.cfg.normalization.clip_observations
        # NaN passes through jnp.clip — sanitize so a just-reset bad env's
        # stale quantities cannot leak non-finite values into the policy
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        priv = jnp.where(jnp.isfinite(priv), priv, 0.0)
        return jnp.clip(obs, -clip, clip), jnp.clip(priv, -clip, clip)

    # ------------------------------------------------------------------
    # Init
    # ------------------------------------------------------------------

    def init_state(self, key) -> EnvState:
        N = self.num_envs
        keys = jax.random.split(key, 10)

        if self.grid is not None:
            max_init = (self.cfg.terrain.max_init_terrain_level
                        if self.cfg.terrain.curriculum
                        else self.cfg.terrain.num_rows - 1)
            levels = jnp.asarray(
                np.arange(N) % (max_init + 1), jnp.int32)
            types = jnp.asarray(
                (np.arange(N) / (N / self.cfg.terrain.num_cols)).astype(np.int64),
                jnp.int32)
            terrain_ids = (jnp.asarray(self.cols2id)[types]
                           if self.cols2id is not None
                           else jnp.zeros(N, jnp.int32))
            origins = self.terrain_origins[levels, types]
        else:
            levels = jnp.zeros(N, jnp.int32)
            types = jnp.zeros(N, jnp.int32)
            terrain_ids = jnp.full((N,), 8, jnp.int32)  # "flat"
            origins = self.flat_origins

        dyn = self._sample_dyn(keys[0])
        strength, offset, kp_m, kd_m = self._sample_control_dr(keys[1])
        pos, quat, vel, turn_timer = self._sample_root_state(keys[2], origins)
        q0 = self._sample_dofs(keys[3])

        sim = engine.SimState(
            base_pos=pos, base_quat=quat, q=q0,
            base_lin_vel=vel[:, :3], base_ang_vel=vel[:, 3:],
            qd=jnp.zeros((N, 12)))

        state = EnvState(
            sim=sim, dyn=dyn,
            motor_strength=strength, motor_offset=offset,
            kp_mult=kp_m, kd_mult=kd_m,
            actions=jnp.zeros((N, 12)), last_actions=jnp.zeros((N, 12)),
            last_last_actions=jnp.zeros((N, 12)),
            last_dof_vel=jnp.zeros((N, 12)),
            episode_length=jnp.zeros(N, jnp.int32),
            feet_air_time=jnp.zeros((N, 4)),
            last_contacts=jnp.zeros((N, 4), bool),
            last_contacts2=jnp.zeros((N, 4), bool),
            commands=jnp.zeros((N, 4)),
            commands_resampling_step=jnp.full(
                (N,), self.cfg.commands.resampling_time / self.dt),
            commands_xy_accum=jnp.zeros((N, 2)),
            stop_heading=jnp.zeros(N, bool),
            last_is_limit_vel=jnp.zeros(N, bool),
            turn_over_timer=turn_timer,
            cmd_range_x=jnp.asarray(list(self.cfg.commands.ranges.lin_vel_x),
                                    jnp.float32),
            terrain_levels=levels, terrain_types=types, terrain_ids=terrain_ids,
            env_origins=origins,
            max_move_distance=jnp.zeros(N),
            torques=jnp.zeros((N, 12)),
            contact_forces=jnp.zeros((N, self.model.nb, 3)),
            foot_forces=jnp.zeros((N, 4, 3)),
            foot_pos=jnp.zeros((N, 4, 3)),
            foot_vel=jnp.zeros((N, 4, 3)),
            episode_sums={n: jnp.zeros(N) for n in
                          (self.reward_names +
                           (["termination"] if self.termination_scale else []))},
            common_step_counter=jnp.asarray(0, jnp.int32),
            key=keys[4],
        )
        state = self._resample_commands(
            state, jnp.ones(N, bool), keys[5])
        return state

    # ------------------------------------------------------------------
    # Step
    # ------------------------------------------------------------------

    def step(self, state: EnvState, actions: jax.Array):
        """One policy step (reference legged_robot.py:60-100 + §3.2)."""
        # trace-time shape/dtype guards (SURVEY §5 sanitizers; free under jit)
        import chex
        chex.assert_shape(actions, (self.num_envs, self.num_actions))
        chex.assert_type(actions, float)
        chex.assert_shape(state.sim.q, (self.num_envs, self.num_actions))
        chex.assert_shape(state.commands, (self.num_envs, 4))
        cfg = self.cfg
        N = self.num_envs
        key = state.key
        keys = jax.random.split(key, 14)
        new_key = keys[0]

        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        # ---- decimation loop with action delay (legged_robot.py:71-92);
        # per-substep PD targets precomputed, physics runs in the T-layout
        # engine (sim/tengine.py) ----
        if cfg.domain_rand.randomize_action_delay:
            start_dec = jax.random.randint(
                keys[1], (N, 1), 0, cfg.control.decimation + 1)
        else:
            start_dec = jnp.zeros((N, 1), jnp.int32)
        kp = jnp.broadcast_to(self.p_gains * state.kp_mult, (N, 12))
        kd = jnp.broadcast_to(self.d_gains * state.kd_mult, (N, 12))
        dec_idx = jnp.arange(cfg.control.decimation)
        use = (dec_idx[:, None, None] >= start_dec[None]).astype(jnp.float32)
        inp = ((1.0 - use) * state.last_actions[None]
               + use * actions[None])                       # (dec, N, 12)
        targets = inp * cfg.control.action_scale + self.default_dof_pos
        strength = (state.motor_strength
                    if cfg.domain_rand.randomize_motor_strength
                    else jnp.ones((N, 12)))
        sim, last_out, torques, patch_data = self.physics_step(
            state.dyn, state.sim, targets, kp, kd, strength,
            state.motor_offset)

        # ---- post-physics (legged_robot.py:102-142) ----
        episode_length = state.episode_length + 1
        counter = state.common_step_counter + 1
        resample_step = state.commands_resampling_step - 1.0
        turn_timer = jnp.clip(state.turn_over_timer - self.dt, a_min=0.0)

        base_quat = sim.base_quat
        base_lin_vel_b = maths.quat_rotate_inverse(base_quat, sim.base_lin_vel)
        base_ang_vel_b = maths.quat_rotate_inverse(base_quat, sim.base_ang_vel)
        gvec = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (N, 3))
        projected_gravity = maths.quat_rotate_inverse(base_quat, gvec)
        rpy = maths.quat_to_euler_xyz(base_quat)
        max_move = jnp.maximum(
            state.max_move_distance,
            jnp.linalg.norm(sim.base_pos[:, :2] - state.env_origins[:, :2], axis=1))

        state = state._replace(
            sim=sim, episode_length=episode_length,
            common_step_counter=counter,
            commands_resampling_step=resample_step,
            turn_over_timer=turn_timer, max_move_distance=max_move,
            torques=torques, actions=actions,
            contact_forces=last_out.contact_forces,
            foot_forces=last_out.foot_forces,
            foot_pos=last_out.foot_pos, foot_vel=last_out.foot_vel)

        # ---- callback: resample + heading + heights (legged_robot.py:404-421) ----
        resample_mask = ((resample_step <= 0.0)
                         & (episode_length < self.max_episode_length - 1))
        state = self._resample_commands(state, resample_mask, keys[2])
        commands = state.commands
        if cfg.commands.heading_command:
            fwd = maths.quat_rotate(base_quat,
                                    jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3)))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            it = self._current_iter(counter)
            env_ranges = self._env_command_ranges(
                self._command_ranges(it, state.cmd_range_x), state.terrain_ids)
            yaw_cmd = jnp.clip(0.5 * maths.wrap_to_pi(commands[:, 3] - heading),
                               env_ranges[:, 2, 0], env_ranges[:, 2, 1])
            commands = jnp.where(state.stop_heading[:, None], commands,
                                 commands.at[:, 2].set(yaw_cmd))
            state = state._replace(commands=commands)

        measured_heights = self._get_heights(sim, patch_data)

        # ---- termination (legged_robot.py:170-178) ----
        term_f = state.contact_forces[:, jnp.asarray(self.termination_bodies), :]
        contact_term = jnp.any(jnp.linalg.norm(term_f, axis=-1) > 1.0, axis=1)
        if cfg.init_state.turn_over:
            contact_term = jnp.zeros(N, bool)
        time_out = episode_length > self.max_episode_length
        # failsafe: reset any env whose state went non-finite or escaped the
        # world (a PhysX-style invalid-state recovery; one pathological env
        # must never poison the batch)
        bad_state = ~(jnp.isfinite(sim.base_pos).all(axis=1)
                      & jnp.isfinite(sim.base_quat).all(axis=1)
                      & jnp.isfinite(sim.qd).all(axis=1)
                      & (jnp.abs(sim.base_pos) < 1e4).all(axis=1)
                      # unphysical speeds (a Go2 peaks ~5 m/s; pushes add
                      # ~1.5, tower drops ~6, flips ~13 rad/s): a solver
                      # blow-up must terminate the episode immediately or a
                      # flying robot poisons the batch rewards for seconds.
                      # These thresholds MUST sit below the engine's
                      # SimParams.max_*_velocity clamps (25 m/s / 50 rad/s),
                      # otherwise a clamped runaway state cruises forever at
                      # the clamp without ever tripping the failsafe —
                      # exactly the correct_base_height reward-poisoning
                      # episodes seen early in the r5 flagship run
                      & (jnp.abs(sim.base_lin_vel) < 12.0).all(axis=1)
                      & (jnp.abs(sim.base_ang_vel) < 30.0).all(axis=1))
        # a base driven below the terrain surface is an invalid state the
        # top-K contact set may fail to report as base contact (all K slots
        # taken by deeper leg geoms) — treat as termination
        ground_z = engine.terrain_height(self.terrain, sim.base_pos[:, :2])
        bad_state = bad_state | ((sim.base_pos[:, 2] - ground_z) < 0.0)
        reset_buf = contact_term | time_out | bad_state

        # ---- rewards ----
        rew, episode_sums, feet_state = self._compute_rewards(
            state, measured_heights, base_lin_vel_b, base_ang_vel_b,
            projected_gravity, rpy, reset_buf, time_out)
        feet_air_time, last_contacts, last_contacts2 = feet_state
        state = state._replace(feet_air_time=feet_air_time,
                               last_contacts=last_contacts,
                               last_contacts2=last_contacts2,
                               episode_sums=episode_sums)

        # ---- metrics (before sums are cleared) ----
        metrics = self._metrics(state, reset_buf)

        # action_smoothness history advances after rewards
        # (legged_robot.py:1373-1379)
        state = state._replace(last_last_actions=state.last_actions)

        # ---- reset (masked, legged_robot.py:180-245) ----
        state = self._reset_envs(state, reset_buf, keys[3:10])

        # ---- pushes (legged_robot.py:709-724) ----
        if cfg.domain_rand.push_robots:
            push_mask = (state.episode_length % self.push_interval) == 0
            pv = maths.uniform(keys[10], (N, 2),
                               -cfg.domain_rand.max_push_vel_xy,
                               cfg.domain_rand.max_push_vel_xy)
            pw = maths.uniform(keys[11], (N, 3),
                               -cfg.domain_rand.max_push_ang_vel,
                               cfg.domain_rand.max_push_ang_vel)
            sim2 = state.sim
            new_lin = sim2.base_lin_vel.at[:, :2].set(pv)
            new_ang = pw
            sim2 = sim2._replace(
                base_lin_vel=jnp.where(push_mask[:, None], new_lin,
                                       sim2.base_lin_vel),
                base_ang_vel=jnp.where(push_mask[:, None], new_ang,
                                       sim2.base_ang_vel))
            state = state._replace(sim=sim2)

        # ---- observations (stale base quantities for reset envs, matching
        # the reference's refresh ordering) ----
        dof_acc = (state.last_dof_vel - state.sim.qd) / self.dt
        obs, priv = self._observations(
            state.sim, state.commands, state.actions, measured_heights,
            base_ang_vel_b, projected_gravity, base_lin_vel_b,
            state.torques, state.foot_forces, dof_acc, keys[12])

        # ---- bookkeeping (legged_robot.py:140-142); actions for reset envs
        # were already zeroed inside _reset_envs ----
        state = state._replace(
            last_actions=state.actions,
            last_dof_vel=state.sim.qd,
            key=new_key)

        out = StepOutput(obs=obs, privileged_obs=priv, rew=rew,
                         done=reset_buf, time_outs=time_out, metrics=metrics)
        return state, out

    # ------------------------------------------------------------------

    def _compute_rewards(self, state, measured_heights, base_lin_vel_b,
                         base_ang_vel_b, projected_gravity, rpy,
                         reset_buf, time_out):
        cfg = self.cfg
        N = self.num_envs
        it = self._current_iter(state.common_step_counter)
        sim = state.sim

        # feet contact filtering (legged_robot.py:1347-1358)
        contact = state.foot_forces[:, :, 2] > 1.0
        contact_filt = contact | state.last_contacts
        last_contacts = contact
        contact_filt2 = contact | state.last_contacts2
        last_contacts2 = contact
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt

        # dynamic tracking sigma (legged_robot.py:1300-1345)
        default_sigma = cfg.rewards.tracking_sigma
        ds = cfg.rewards.dynamic_sigma
        if ds is not None and self.grid is not None and cfg.terrain.curriculum:
            tmax = self.terrain_max_sigmas[state.terrain_ids]
            lvl_scale = jnp.clip(
                jnp.exp((state.terrain_levels.astype(jnp.float32) + 1.0) / 10.0) - 1.0,
                a_max=1.0)

            def dyn_sigma(target_abs, vmin, vmax):
                ratio = jnp.clip((target_abs - vmin) / (vmax - vmin), 0.0, 1.0)
                sig = default_sigma + ratio * (tmax - default_sigma)
                sig = jnp.where(target_abs < vmin, default_sigma, sig)
                return default_sigma + lvl_scale * (sig - default_sigma)

            sx = dyn_sigma(jnp.abs(state.commands[:, 0]),
                           ds["min_lin_vel"], ds["max_lin_vel"])
            sy = dyn_sigma(jnp.abs(state.commands[:, 1]),
                           ds["min_lin_vel"], ds["max_lin_vel"])
            sa = dyn_sigma(jnp.abs(state.commands[:, 2]),
                           ds["min_ang_vel"], ds["max_ang_vel"])
            sig_lin = jnp.stack([sx, sy], 1)
            sig_ang = sa
        else:
            sig_lin = jnp.full((N, 2), default_sigma)
            sig_ang = jnp.full((N,), default_sigma)

        base_h = self._base_height_est(sim, measured_heights)

        ctx = reward_lib.RewardContext(
            base_pos=sim.base_pos, base_quat=sim.base_quat,
            base_lin_vel=base_lin_vel_b, base_ang_vel=base_ang_vel_b,
            projected_gravity=projected_gravity,
            commands=state.commands,
            dof_pos=sim.q, dof_vel=sim.qd, last_dof_vel=state.last_dof_vel,
            actions=state.actions, last_actions=state.last_actions,
            last_last_actions=state.last_last_actions,
            torques=state.torques, contact_forces=state.contact_forces,
            foot_forces=state.foot_forces, foot_pos=state.foot_pos,
            foot_vel=state.foot_vel,
            feet_air_time=feet_air_time, first_contact=first_contact,
            contact_filt=contact_filt2,
            measured_heights=measured_heights, base_height=base_h,
            reset_buf=reset_buf, time_out_buf=time_out,
            default_dof_pos=self.default_dof_pos,
            dof_pos_limits=self.soft_dof_limits,
            dof_vel_limits=self.dof_vel_limits,
            torque_limits=self.torque_limits,
            tracking_sigma_lin=sig_lin, tracking_sigma_ang=sig_ang,
            dt=self.dt, cfg=cfg.rewards,
            penalized_bodies=self.penalized_bodies,
            termination_bodies=self.termination_bodies,
        )

        total = jnp.zeros(N)
        episode_sums = dict(state.episode_sums)
        need_turn_over = (jnp.abs(rpy[:, 0]) > cfg.rewards.turn_over_roll_threshold
                          if cfg.init_state.turn_over else None)
        for name in self.reward_names:
            raw = reward_lib.REWARD_TERMS[name](ctx)
            rew = raw * self.reward_scales.get(name, 0.0)
            if cfg.init_state.turn_over:
                to_rew = raw * self.turn_over_scales.get(name, 0.0)
            cscale = self._reward_curriculum_scale(name, it)
            if cscale is not None:
                rew = rew * cscale
                if cfg.init_state.turn_over:
                    to_rew = to_rew * cscale
            if cfg.init_state.turn_over:
                rew = jnp.where(need_turn_over, to_rew, rew)
            total = total + rew
            episode_sums[name] = episode_sums[name] + rew
        if cfg.rewards.only_positive_rewards:
            total = jnp.clip(total, a_min=0.0)
        if self.termination_scale is not None:
            term_rew = reward_lib.termination(ctx) * self.termination_scale
            total = total + term_rew
            episode_sums["termination"] = episode_sums["termination"] + term_rew

        # clear feet air time on contact (legged_robot.py:1357)
        feet_air_time = feet_air_time * (~contact_filt)
        # a non-finite reward from a pathological env would poison the global
        # advantage normalization (rollout_storage.py:136-137) — zero it; the
        # env resets this step anyway via the bad-state failsafe
        total = jnp.where(jnp.isfinite(total), total, 0.0)
        return total, episode_sums, (feet_air_time, last_contacts, last_contacts2)

    def _metrics(self, state, done):
        """Episode metrics: masked sums + counts (runner divides), matching
        reference extras['episode'] (legged_robot.py:229-245)."""
        m = {}
        donef = done.astype(jnp.float32)
        count = jnp.sum(donef)
        m["done_count"] = count
        for name, sums in state.episode_sums.items():
            m[f"rew_{name}"] = jnp.sum(sums * donef) / self.max_episode_length_s
        if self.grid is not None:
            m["terrain_level_all"] = jnp.mean(state.terrain_levels.astype(jnp.float32))
            for tname, cols in self.terrain_type_names.items():
                in_type = jnp.isin(state.terrain_types, jnp.asarray(cols))
                cnt = jnp.maximum(jnp.sum(in_type), 1)
                m[f"terrain_level_{tname}"] = (
                    jnp.sum(jnp.where(in_type, state.terrain_levels, 0)) / cnt)
        else:
            m["terrain_level_all"] = jnp.asarray(0.0)
        if self.cfg.commands.curriculum:
            m["max_command_x"] = state.cmd_range_x[1]
        return m

    def _reset_envs(self, state: EnvState, done, keys):
        """Masked env reset (legged_robot.py:180-245)."""
        cfg = self.cfg
        N = self.num_envs
        w = done[:, None]

        # performance-based command curriculum (legged_robot.py:728-737)
        cmd_range_x = state.cmd_range_x
        if cfg.commands.curriculum:
            donef = done.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(donef), 1.0)
            mean_track = (jnp.sum(state.episode_sums["tracking_lin_vel"] * donef)
                          / cnt / self.max_episode_length)
            expand = (mean_track >
                      0.8 * self.reward_scales.get("tracking_lin_vel", 1.0))
            expand = expand & (jnp.sum(donef) > 0)
            new_lo = jnp.clip(cmd_range_x[0] - 0.5, -cfg.commands.max_curriculum, 0.0)
            new_hi = jnp.clip(cmd_range_x[1] + 0.5, 0.0, cfg.commands.max_curriculum)
            cmd_range_x = jnp.where(expand, jnp.stack([new_lo, new_hi]), cmd_range_x)

        # reset-time control DR (legged_robot.py:195-206)
        strength, offset, kp_m, kd_m = self._sample_control_dr(keys[0])
        strength = jnp.where(w, strength, state.motor_strength)
        offset = jnp.where(w, offset, state.motor_offset)
        kp_m = jnp.where(w, kp_m, state.kp_mult)
        kd_m = jnp.where(w, kd_m, state.kd_mult)

        # physical-property DR (creation-time class in reference)
        dyn_new = self._sample_dyn(keys[1])
        dyn = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((N,) + (1,) * (new.ndim - 1)), new, old),
            dyn_new, state.dyn)

        # terrain curriculum BEFORE root reset (legged_robot.py:208-210)
        levels, types, origins = self._update_terrain_curriculum(
            state, done, keys[2])
        terrain_ids = (jnp.asarray(self.cols2id)[types]
                       if self.grid is not None and self.cols2id is not None
                       else state.terrain_ids)

        # dof + root reset
        q0 = self._sample_dofs(keys[3])
        pos, quat, vel, turn_timer = self._sample_root_state(keys[4], origins)
        sim = state.sim
        sim = engine.SimState(
            base_pos=jnp.where(w, pos, sim.base_pos),
            base_quat=jnp.where(w, quat, sim.base_quat),
            q=jnp.where(w, q0, sim.q),
            base_lin_vel=jnp.where(w, vel[:, :3], sim.base_lin_vel),
            base_ang_vel=jnp.where(w, vel[:, 3:], sim.base_ang_vel),
            qd=jnp.where(w, 0.0, sim.qd))

        episode_sums = {k: jnp.where(done, 0.0, v)
                        for k, v in state.episode_sums.items()}

        state = state._replace(
            sim=sim, dyn=dyn,
            motor_strength=strength, motor_offset=offset,
            kp_mult=kp_m, kd_mult=kd_m,
            actions=jnp.where(w, 0.0, state.actions),
            last_actions=jnp.where(w, 0.0, state.last_actions),
            last_dof_vel=jnp.where(w, 0.0, state.last_dof_vel),
            feet_air_time=jnp.where(w, 0.0, state.feet_air_time),
            episode_length=jnp.where(done, 0, state.episode_length),
            commands_resampling_step=jnp.where(
                done, cfg.commands.resampling_time / self.dt,
                state.commands_resampling_step),
            commands_xy_accum=jnp.where(w, 0.0, state.commands_xy_accum),
            turn_over_timer=jnp.where(done, turn_timer, state.turn_over_timer),
            cmd_range_x=cmd_range_x,
            terrain_levels=levels, terrain_types=types,
            terrain_ids=terrain_ids, env_origins=origins,
            max_move_distance=jnp.where(done, 0.0, state.max_move_distance),
            episode_sums=episode_sums)

        # command resample for reset envs
        state = self._resample_commands(state, done, keys[5])
        return state
