"""Dynamics parity harness: this framework's TPU engine vs. CPU MuJoCo.

The reference's engine (PhysX) is closed; the acceptance bar for the
from-scratch engine is matching MuJoCo-validated Go2 dynamics (SURVEY.md §7
"dynamics-parity harness vs MuJoCo, fixed-seed"). This tool steps both
simulators from identical states under identical PD targets and reports
trajectory divergence.

Usage:
    python tools/dynamics_parity.py [--steps 100] [--scenario stand|drop|walk|spawn]
    python tools/dynamics_parity.py --report doc/evidence/parity.json
Prints a JSON summary; also importable (run_parity) for tests. ``spawn``
reproduces the training reset distribution (0.42 m drop, dof_pos = default x
U[0.5,1.5], legged_robot.py:620-707) — the instrument for the learning-
failure probes the round-3 verdict prescribed. --report runs every scenario
at a 5 s horizon and writes the committed parity report (drift vs horizon +
ground-reaction-force profile comparison).
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
    elif scenario == "spawn":
        # training reset distribution: 0.42 m drop, dofs = default x U[.5,1.5]
        z0 = 0.42
        targets = np.tile(DEFAULT_Q, (steps, 1))
    else:
        raise ValueError(scenario)
    q_init = DEFAULT_Q.copy()
    if scenario == "spawn":
        q_init = (DEFAULT_Q * rng.uniform(0.5, 1.5, 12)).astype(np.float32)

    # --- MuJoCo rollout ---
    m = load_scene_model("flat")
    m.opt.timestep = dt
    d = mujoco.MjData(m)
    d.qpos[:3] = [0, 0, z0]
    d.qpos[3:7] = [1, 0, 0, 0]  # wxyz
    d.qpos[7:] = q_init
    mujoco.mj_forward(m, d)
    mj_traj = []
    mj_fz = []
    cf = np.zeros(6)
    for i in range(steps):
        tau = (targets[i] - d.qpos[7:]) * kp - d.qvel[6:] * kd
        d.ctrl[:] = tau
        mujoco.mj_step(m, d)
        mj_traj.append(np.concatenate([d.qpos[:3], d.qpos[3:7], d.qpos[7:]]))
        fz = 0.0
        for ci in range(d.ncon):
            mujoco.mj_contactForce(m, d, ci, cf)
            # contact frame: x = normal (into geom1); world normal z-comp
            n = d.contact[ci].frame[:3]
            fz += abs(cf[0] * n[2])
        mj_fz.append(fz)
    mj_traj = np.stack(mj_traj)
    mj_fz = np.asarray(mj_fz)

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
                        jnp.asarray(q_init),
                        jnp.zeros(3), jnp.zeros(3), jnp.zeros(12))
    our_traj = []
    our_fz = []
    for i in range(steps):
        s, out = step(s, jnp.asarray(targets[i]))
        quat_wxyz = np.concatenate([[float(s.base_quat[3])],
                                    np.asarray(s.base_quat[:3])])
        our_traj.append(np.concatenate(
            [np.asarray(s.base_pos), quat_wxyz, np.asarray(s.q)]))
        our_fz.append(float(out.foot_forces[:, 2].sum()
                            + out.contact_forces[:, 2].sum()))
    our_traj = np.stack(our_traj)
    our_fz = np.asarray(our_fz)

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

    horizon_s = steps * dt
    res = {
        "scenario": scenario,
        "steps": steps,
        "final_z_mujoco": float(mj_traj[-1, 2]),
        "final_z_ours": float(our_traj[-1, 2]),
        "max_pos_err": float(pos_err.max()),
        "max_joint_err": float(joint_err.max()),
    }
    for t_s in (0.25, 0.5, 1.0, 2.0, 5.0):
        if t_s <= horizon_s + 1e-9:
            res[f"err_at_{t_s}s"] = at(t_s)
    # ground-reaction-force profile comparison (weight 147.3 N reference)
    settle = min(int(0.5 / dt), steps // 2)
    res["grf"] = {
        "peak_fz_mujoco": float(mj_fz.max()),
        "peak_fz_ours": float(our_fz.max()),
        "settled_mean_fz_mujoco": float(mj_fz[settle:].mean()),
        "settled_mean_fz_ours": float(our_fz[settle:].mean()),
        "settled_mean_abs_diff": float(
            np.abs(mj_fz[settle:] - our_fz[settle:]).mean()),
    }
    return res


def write_report(path, steps=1000):
    """Run every scenario at a 5 s horizon and write the committed parity
    report (VERDICT r3 next-#7: drift vs 1/2/5 s horizons + contact-force
    profile)."""
    report = {"horizon_s": steps * 0.005,
              "scenarios": {sc: run_parity(steps, sc)
                            for sc in ("stand", "drop", "walk", "spawn")}}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--scenario", default="stand",
                   choices=["stand", "drop", "walk", "spawn"])
    p.add_argument("--report", default=None,
                   help="write the full multi-scenario 5s report here")
    args = p.parse_args()
    if args.report:
        write_report(args.report)
    else:
        print(json.dumps(run_parity(args.steps, args.scenario), indent=2))
