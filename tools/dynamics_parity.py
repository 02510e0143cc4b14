"""Dynamics parity harness: this framework's TPU engine vs. CPU MuJoCo.

The reference's engine (PhysX) is closed; the acceptance bar for the
from-scratch engine is matching MuJoCo-validated Go2 dynamics (SURVEY.md §7
"dynamics-parity harness vs MuJoCo, fixed-seed"). This tool steps both
simulators from identical states under identical PD targets and reports
trajectory divergence.

Usage:
    python tools/dynamics_parity.py [--steps 100] [--scenario stand|drop|walk]
Prints a JSON summary; also importable (run_parity) for tests.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_Q = np.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                      0.1, 1.0, -1.5, -0.1, 1.0, -1.5], np.float32)


def run_parity(steps=200, scenario="stand", dt=0.005, kp=20.0, kd=0.5,
               seed=0):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import mujoco

    from go2_rl_gym_tpu.deploy.mujoco_eval import load_scene_model
    from go2_rl_gym_tpu.sim import engine
    from go2_rl_gym_tpu.sim.model import go2_model

    rng = np.random.default_rng(seed)

    # --- target trajectory (PD setpoints) per scenario ---
    if scenario == "stand":
        z0 = 0.33
        targets = np.tile(DEFAULT_Q, (steps, 1))
    elif scenario == "drop":
        z0 = 0.5
        targets = np.tile(DEFAULT_Q, (steps, 1))
    elif scenario == "walk":
        z0 = 0.33
        t = np.arange(steps)[:, None] * dt
        phase = 2 * np.pi * 2.0 * t  # 2 Hz trot-ish excitation
        offs = 0.2 * np.sin(phase + np.array([0] * 3 + [np.pi] * 3
                                             + [np.pi] * 3 + [0] * 3))
        targets = DEFAULT_Q + offs * np.array([0, 1, 1] * 4)
    else:
        raise ValueError(scenario)

    # --- MuJoCo rollout ---
    m = load_scene_model("flat")
    m.opt.timestep = dt
    d = mujoco.MjData(m)
    d.qpos[:3] = [0, 0, z0]
    d.qpos[3:7] = [1, 0, 0, 0]  # wxyz
    d.qpos[7:] = DEFAULT_Q
    mujoco.mj_forward(m, d)
    mj_traj = []
    for i in range(steps):
        tau = (targets[i] - d.qpos[7:]) * kp - d.qvel[6:] * kd
        d.ctrl[:] = tau
        mujoco.mj_step(m, d)
        mj_traj.append(np.concatenate([d.qpos[:3], d.qpos[3:7], d.qpos[7:]]))
    mj_traj = np.stack(mj_traj)

    # --- our engine rollout ---
    model = go2_model()
    layout = engine.quad_layout(model)
    params = engine.SimParams(dt=dt)
    terrain = engine.flat_terrain()
    dyn = engine.default_dyn_params(model)
    effort = jnp.asarray(model.dof_effort_limit, jnp.float32)

    @jax.jit
    def step(s, tgt):
        tau = jnp.clip(kp * (tgt - s.q) - kd * s.qd, -effort, effort)
        return engine.substep(model, layout, params, dyn, terrain, s, tau,
                              jnp.full(12, kd))

    s = engine.SimState(jnp.array([0.0, 0.0, z0]),
                        jnp.array([0.0, 0.0, 0.0, 1.0]),
                        jnp.asarray(DEFAULT_Q),
                        jnp.zeros(3), jnp.zeros(3), jnp.zeros(12))
    our_traj = []
    for i in range(steps):
        s, _ = step(s, jnp.asarray(targets[i]))
        quat_wxyz = np.concatenate([[float(s.base_quat[3])],
                                    np.asarray(s.base_quat[:3])])
        our_traj.append(np.concatenate(
            [np.asarray(s.base_pos), quat_wxyz, np.asarray(s.q)]))
    our_traj = np.stack(our_traj)

    # --- divergence metrics ---
    pos_err = np.linalg.norm(mj_traj[:, :3] - our_traj[:, :3], axis=1)
    # quat distance (handle double cover)
    qd_ = np.abs(np.sum(mj_traj[:, 3:7] * our_traj[:, 3:7], axis=1))
    ang_err = 2 * np.arccos(np.clip(qd_, -1, 1))
    joint_err = np.abs(mj_traj[:, 7:] - our_traj[:, 7:]).max(axis=1)

    def at(t_s):
        i = min(int(t_s / dt) - 1, steps - 1)
        return dict(pos=float(pos_err[i]), ang=float(ang_err[i]),
                    joint=float(joint_err[i]))

    return {
        "scenario": scenario,
        "steps": steps,
        "final_z_mujoco": float(mj_traj[-1, 2]),
        "final_z_ours": float(our_traj[-1, 2]),
        "err_at_0.25s": at(0.25),
        "err_at_0.5s": at(0.5),
        "err_at_1.0s": at(1.0),
        "max_pos_err": float(pos_err.max()),
        "max_joint_err": float(joint_err.max()),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--scenario", default="stand",
                   choices=["stand", "drop", "walk"])
    args = p.parse_args()
    print(json.dumps(run_parity(args.steps, args.scenario), indent=2))
