"""Batch-minor (T-layout) physics core — the production TPU path.

Same physics as sim/engine.py (leg-batched body-frame Featherstone CRBA/RNEA,
closed-form block-Schur solve, velocity-level impulse contacts; see that
module's docstring and reference citations) but with the env batch N as the
trailing axis of every array, which is what makes it fast on TPU (see
sim/tmath.py for the layout rationale: (N,3)-shaped arrays pad 42x on TPU
tiles; (3,N) arrays pad ~2.7x).

Public entry: `make_physics_step(model, params, terrain, decimation)` returns
a function running the full 4x-decimation PD-control + dynamics loop for the
whole env batch in one call — transposing N-major env-facing arrays to
T layout once per policy step. This replaces the engine.make_batched_substep
vmap path; the PD torque computation lives here (it needs per-substep joint
state), matching reference legged_robot.py:594-618 exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.sim import tmath as tm
from go2_rl_gym_tpu.sim.engine import (NLEG, DEPTH, QuadLayout, SimOutputs,
                                       SimParams, SimState, DynParams,
                                       TerrainData, quad_layout,
                                       terrain_height, terrain_normal)
from go2_rl_gym_tpu.sim.model import RobotModel


class TState(NamedTuple):
    """SimState in T layout: component axes first, batch last."""
    pos: jax.Array    # (3, N)
    quat: jax.Array   # (4, N)
    q: jax.Array      # (12, N)
    lin: jax.Array    # (3, N)
    ang: jax.Array    # (3, N)
    qd: jax.Array     # (12, N)


def to_t(state: SimState) -> TState:
    return TState(pos=state.base_pos.T, quat=state.base_quat.T,
                  q=state.q.T, lin=state.base_lin_vel.T,
                  ang=state.base_ang_vel.T, qd=state.qd.T)


def from_t(t: TState) -> SimState:
    return SimState(base_pos=t.pos.T, base_quat=t.quat.T, q=t.q.T,
                    base_lin_vel=t.lin.T, base_ang_vel=t.ang.T, qd=t.qd.T)


def _terrain_height_t(terrain: TerrainData, x, y):
    """Min-of-3 heightfield lookup; x, y: (..., N)."""
    if terrain.is_flat:
        return jnp.zeros_like(x)
    hs = terrain.height
    px = jnp.clip(((x + terrain.border_offset) / terrain.horizontal_scale)
                  .astype(jnp.int32), 0, hs.shape[0] - 2)
    py = jnp.clip(((y + terrain.border_offset) / terrain.horizontal_scale)
                  .astype(jnp.int32), 0, hs.shape[1] - 2)
    h1 = hs[px, py]
    h2 = hs[px + 1, py]
    h3 = hs[px, py + 1]
    return jnp.minimum(jnp.minimum(h1, h2), h3)


def _terrain_normal_t(terrain: TerrainData, x, y):
    """x, y: (..., N) -> normals (..., 3, N).

    Centered-difference slope with the riser snap: where any one-cell height
    jump exceeds tp.RISER_SLOPE_THRESHOLD the surface is a riser/cliff and
    the contact normal is the vertical tread normal, matching both the
    channel path (ops/terrain_patches.build_channels) and the reference's
    heightfield->trimesh slope correction (legged_robot_config.py:40)."""
    if terrain.is_flat:
        n = jnp.zeros(x.shape[:-1] + (3,) + x.shape[-1:])
        return n.at[..., 2, :].set(1.0)
    from go2_rl_gym_tpu.ops import terrain_patches as tp
    s = terrain.horizontal_scale
    h0 = _terrain_height_t(terrain, x, y)
    hxp = _terrain_height_t(terrain, x + s, y)
    hxm = _terrain_height_t(terrain, x - s, y)
    hyp = _terrain_height_t(terrain, x, y + s)
    hym = _terrain_height_t(terrain, x, y - s)
    dx = (hxp - hxm) / (2 * s)
    dy = (hyp - hym) / (2 * s)
    jump = jnp.maximum(jnp.maximum(jnp.abs(hxp - h0), jnp.abs(h0 - hxm)),
                       jnp.maximum(jnp.abs(hyp - h0), jnp.abs(h0 - hym))) / s
    riser = jump > tp.RISER_SLOPE_THRESHOLD
    dx = jnp.where(riser, 0.0, dx)
    dy = jnp.where(riser, 0.0, dy)
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-2)
    return n / tm.norm(n)[..., None, :]


def _fk(layout: QuadLayout, s: TState):
    """World kinematics, leg-batched, T layout.

    Returns R (13,3,3,N), p (13,3,N), w (13,3,N), v (13,3,N),
    axis_w (12,3,N), jpos (12,3,N)."""
    axes = np.asarray(layout.axes, np.float32)          # (L,D,3)
    origins = jnp.asarray(layout.origins, jnp.float32)[..., None]  # (L,D,3,1)
    q = s.q.reshape(NLEG, DEPTH, -1)
    qd = s.qd.reshape(NLEG, DEPTH, -1)

    R0 = tm.quat_to_matrix(s.quat)                      # (3,3,N)
    N = s.pos.shape[-1]
    Rp = jnp.broadcast_to(R0, (NLEG, 3, 3, N))
    pp = jnp.broadcast_to(s.pos, (NLEG, 3, N))
    wp = jnp.broadcast_to(s.ang, (NLEG, 3, N))
    vp = jnp.broadcast_to(s.lin, (NLEG, 3, N))

    Rs, ps, ws, vs, aw = [], [], [], [], []
    for d in range(DEPTH):
        Rj = tm.rodrigues(axes[:, d], q[:, d])          # (L,3,3,N)
        r_w = tm.mv(Rp, jnp.broadcast_to(origins[:, d], (NLEG, 3, N)))
        axis_w = tm.mv(Rp, jnp.broadcast_to(
            jnp.asarray(axes[:, d])[..., None], (NLEG, 3, N)))
        Rc = tm.mm(Rp, Rj)
        pc = pp + r_w
        wc = wp + axis_w * qd[:, d][:, None, :]
        vc = vp + tm.cross(wp, r_w)
        Rs.append(Rc); ps.append(pc); ws.append(wc); vs.append(vc)
        aw.append(axis_w)
        Rp, pp, wp, vp = Rc, pc, wc, vc

    def flat(xs, base):
        s_ = jnp.stack(xs, axis=1)                      # (L,D,...)
        s_ = s_.reshape((NLEG * DEPTH,) + s_.shape[2:])
        return jnp.concatenate([base[None], s_], axis=0)

    R = flat(Rs, R0)
    p = flat(ps, s.pos)
    w = flat(ws, s.ang)
    v = flat(vs, s.lin)
    axis_w = jnp.stack(aw, axis=1).reshape(NLEG * DEPTH, 3, -1)
    return R, p, w, v, axis_w, p[1:]


def _spatial_inertia(m, c, I):
    """(...,N),(...,3,N),(...,3,3,N) -> (...,6,6,N) mcI form."""
    Sc = tm.skew(c)
    mI = m[..., None, None, :] * jnp.broadcast_to(
        jnp.eye(3)[:, :, None], Sc.shape)
    top = jnp.concatenate([I + m[..., None, None, :] * tm.mmt(Sc, Sc),
                           m[..., None, None, :] * Sc], axis=-2)
    bot = jnp.concatenate([m[..., None, None, :] * tm.transpose(Sc), mI],
                          axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


def _xmat(E, r):
    """(L,3,3,N),(L,3,1 or N) -> (L,6,6,N) motion transform parent->child."""
    z = jnp.zeros_like(E)
    Sr = tm.skew(jnp.broadcast_to(r, E.shape[:-3] + (3, E.shape[-1])))
    top = jnp.concatenate([E, z], axis=-2)
    bot = jnp.concatenate([-tm.mm(E, Sr), E], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


def _xm(E, r, v6):
    """Motion transform applied to (L,6,N) spatial vectors."""
    w, u = v6[..., :3, :], v6[..., 3:, :]
    rb = jnp.broadcast_to(r, w.shape)
    wc = tm.mv(E, w)
    uc = tm.mv(E, u - tm.cross(rb, w))
    return jnp.concatenate([wc, uc], axis=-2)


def _xfT(E, r, f6):
    """X^T on force vectors: child->parent."""
    n, F = f6[..., :3, :], f6[..., 3:, :]
    Fp = tm.mtv(E, F)
    rb = jnp.broadcast_to(r, Fp.shape)
    np_ = tm.mtv(E, n) + tm.cross(rb, Fp)
    return jnp.concatenate([np_, Fp], axis=-2)


def _mcross(v, u):
    w, vo = v[..., :3, :], v[..., 3:, :]
    w2, vo2 = u[..., :3, :], u[..., 3:, :]
    return jnp.concatenate([tm.cross(w, w2),
                            tm.cross(w, vo2) + tm.cross(vo, w2)], axis=-2)


def _fcross(v, f):
    w, vo = v[..., :3, :], v[..., 3:, :]
    n, F = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate([tm.cross(w, n) + tm.cross(vo, F),
                            tm.cross(w, F)], axis=-2)


class TInertia(NamedTuple):
    B: jax.Array      # (L,3,6,N) joint-rows x base-cols
    Dinv: jax.Array   # (L,3,3,N)
    Sinv: jax.Array   # (6,6,N)


def _structured_solve(si: TInertia, rhs):
    """Solve H x = rhs; rhs (18, M, N) -> (18, M, N)."""
    rb = rhs[:6]                                        # (6,M,N)
    rl = rhs[6:].reshape(NLEG, DEPTH, *rhs.shape[1:])   # (L,3,M,N)
    y = tm.mm(si.Dinv, rl)                              # (L,3,M,N)
    # rb' = rb - sum_l B_l^T y_l : B (L,3,6,N)
    rb2 = rb - jnp.sum(tm.mm(tm.transpose(si.B), y), axis=0)
    xb = tm.mm(si.Sinv, rb2)                            # (6,M,N)
    xl = tm.mm(si.Dinv, rl - tm.mm(si.B, xb[None]))
    return jnp.concatenate([xb, xl.reshape(-1, *rhs.shape[1:])], axis=0)


def _mass_matrix_and_bias(layout, params: SimParams, dyn_t, s: TState,
                          damping_eff):
    """Leg-batched body-frame CRBA + RNEA in T layout.

    dyn_t: dict(mass (13,N), com (13,3,N), inertia (13,3,3,N)).
    Returns (TInertia, bias (18,N), Rbase (3,3,N))."""
    axes = np.asarray(layout.axes, np.float32)
    origins = jnp.asarray(layout.origins, jnp.float32)[:, :, :, None]
    q = s.q.reshape(NLEG, DEPTH, -1)
    qd = s.qd.reshape(NLEG, DEPTH, -1)
    N = s.pos.shape[-1]

    Rbase = tm.quat_to_matrix(s.quat)
    w0 = tm.mtv(Rbase, s.ang)
    u0 = tm.mtv(Rbase, s.lin)
    v_base = jnp.concatenate([w0, u0], axis=0)          # (6,N)

    mass = dyn_t["mass"]
    com = dyn_t["com"]
    inert = dyn_t["inertia"]
    I_base = _spatial_inertia(mass[0], com[0], inert[0])     # (6,6,N)
    mass_l = mass[1:].reshape(NLEG, DEPTH, N)
    com_l = com[1:].reshape(NLEG, DEPTH, 3, N)
    inert_l = inert[1:].reshape(NLEG, DEPTH, 3, 3, N)
    I_l = [_spatial_inertia(mass_l[:, d], com_l[:, d], inert_l[:, d])
           for d in range(DEPTH)]                        # (L,6,6,N)

    E, r, X, Sax, v = [], [], [], [], []
    vp = jnp.broadcast_to(v_base, (NLEG, 6, N))
    for d in range(DEPTH):
        Rj = tm.rodrigues(axes[:, d], q[:, d])
        Ed = tm.transpose(Rj)
        rd = origins[:, d]                               # (L,3,1)
        E.append(Ed)
        r.append(rd)
        X.append(_xmat(Ed, rd))
        Sd = jnp.concatenate([jnp.broadcast_to(
            jnp.asarray(axes[:, d])[..., None], (NLEG, 3, N)),
            jnp.zeros((NLEG, 3, N))], axis=1)            # (L,6,N)
        Sax.append(Sd)
        vd = _xm(Ed, rd, vp) + Sd * qd[:, d][:, None, :]
        v.append(vd)
        vp = vd

    # RNEA (qdd=0, gravity as base acceleration)
    g_base = tm.mtv(Rbase, jnp.broadcast_to(
        jnp.array([0.0, 0.0, params.gravity])[:, None], (3, N)))
    a_base = jnp.concatenate([jnp.zeros((3, N)), -g_base], axis=0)
    a = []
    ap = jnp.broadcast_to(a_base, (NLEG, 6, N))
    for d in range(DEPTH):
        ad = _xm(E[d], r[d], ap) + _mcross(v[d], Sax[d] * qd[:, d][:, None, :])
        a.append(ad)
        ap = ad
    f = [tm.mv(I_l[d], a[d]) + _fcross(v[d], tm.mv(I_l[d], v[d]))
         for d in range(DEPTH)]
    f_base = tm.mv(I_base, a_base) + _fcross(v_base, tm.mv(I_base, v_base))

    bias_l = []
    fd = f[DEPTH - 1]
    for d in range(DEPTH - 1, -1, -1):
        bias_l.insert(0, jnp.sum(Sax[d] * fd, axis=-2))   # (L,N)
        fd_up = _xfT(E[d], r[d], fd)
        if d > 0:
            fd = f[d - 1] + fd_up
        else:
            f_base = f_base + jnp.sum(fd_up, axis=0)
    bias = jnp.concatenate(
        [f_base, jnp.stack(bias_l, axis=1).reshape(NLEG * DEPTH, N)], axis=0)

    # CRBA
    Icc = [None] * DEPTH
    Icc[DEPTH - 1] = I_l[DEPTH - 1]
    for d in range(DEPTH - 2, -1, -1):
        Icc[d] = I_l[d] + tm.mtm(X[d + 1], tm.mm(Icc[d + 1], X[d + 1]))
    A = I_base + jnp.sum(tm.mtm(X[0], tm.mm(Icc[0], X[0])), axis=0)

    Drows = [[None] * DEPTH for _ in range(DEPTH)]
    Brows = [None] * DEPTH
    for d in range(DEPTH):
        F = tm.mv(Icc[d], Sax[d])                        # (L,6,N)
        Drows[d][d] = jnp.sum(Sax[d] * F, axis=-2)       # (L,N)
        for dd in range(d - 1, -1, -1):
            F = _xfT(E[dd + 1], r[dd + 1], F)
            val = jnp.sum(Sax[dd] * F, axis=-2)
            Drows[d][dd] = val
            Drows[dd][d] = val
        Brows[d] = _xfT(E[0], r[0], F)                   # (L,6,N)

    Dblk = jnp.stack([jnp.stack(row, axis=1) for row in Drows], axis=1)
    # (L,3,3,N)
    Bblk = jnp.stack(Brows, axis=1)                      # (L,3,6,N)

    diag = damping_eff * params.dt + params.armature     # (12,N)
    diag = diag.reshape(NLEG, DEPTH, N)
    Dblk = Dblk + jnp.eye(DEPTH)[None, :, :, None] * diag[:, :, None, :]

    Dinv = tm.inv3(Dblk)
    # S = A - sum_l B^T Dinv B
    Smat = A - jnp.sum(tm.mm(tm.transpose(Bblk), tm.mm(Dinv, Bblk)), axis=0)
    Sinv = tm.inv6_spd(Smat)
    return TInertia(B=Bblk, Dinv=Dinv, Sinv=Sinv), bias, Rbase


def _substep(model: RobotModel, layout: QuadLayout, params: SimParams,
             terrain: TerrainData, dyn_t, fric, rest, s: TState,
             tau, implicit_damping, lam_geom, patch_data=None):
    """One physics substep, full batch, T layout.

    tau, implicit_damping: (12, N). lam_geom: (G, 3, N) warm-start impulses
    from the previous substep, keyed by geom (the PhysX warm-start pattern —
    makes the fixed 8-iteration Jacobi solve behave like a much deeper one on
    persistent contacts). Returns (TState, outputs dict, new lam_geom).
    """
    dt = params.dt
    K = params.num_contacts
    N = s.pos.shape[-1]

    R, p, w, vlin, axis_w, jpos = _fk(layout, s)

    # geoms
    gb = model.geom_body
    offs = jnp.asarray(model.geom_offset, jnp.float32)[:, :, None]  # (G,3,1)
    Rg = R[gb]                                           # (G,3,3,N)
    arm = tm.mv(Rg, jnp.broadcast_to(offs, (len(gb), 3, N)))
    gpos = p[gb] + arm                                   # (G,3,N)
    gvel = vlin[gb] + tm.cross(w[gb], arm)

    # joint limits (implicit spring, see engine.substep)
    lo = jnp.asarray(model.dof_lower, jnp.float32)[:, None]
    hi = jnp.asarray(model.dof_upper, jnp.float32)[:, None]
    viol_lo = jnp.maximum(lo - s.q, 0.0)
    viol_hi = jnp.maximum(s.q - hi, 0.0)
    in_viol = ((viol_lo > 0) | (viol_hi > 0)).astype(jnp.float32)
    tau_tot = (tau + params.joint_limit_stiffness * (viol_lo - viol_hi)
               - params.joint_limit_stiffness * dt * s.qd * in_viol)
    damping_eff = implicit_damping + in_viol * (
        params.joint_limit_stiffness * dt + params.joint_limit_damping)

    si, bias, Rbase = _mass_matrix_and_bias(layout, params, dyn_t, s,
                                            damping_eff)
    tau_gen = jnp.concatenate([jnp.zeros((6, N)), tau_tot], axis=0)

    # ---- contact candidates: top-K most penetrating ----
    radius = jnp.asarray(model.geom_radius, jnp.float32)[:, None]
    if patch_data is not None:
        # patch fast path: one in-patch one-hot lookup yields height AND the
        # slope channels for every geom (ops/terrain_patches.py)
        from go2_rl_gym_tpu.ops import terrain_patches as tp
        patches_flat, origins = patch_data
        scale = terrain.horizontal_scale
        ix = ((gpos[:, 0, :] + terrain.border_offset) / scale).astype(jnp.int32)
        iy = ((gpos[:, 1, :] + terrain.border_offset) / scale).astype(jnp.int32)
        hmin, dxg, dyg = tp.lookup(patches_flat, origins, ix.T, iy.T)
        h = hmin.T                                        # (G,N)
        dx_g, dy_g = dxg.T, dyg.T
    else:
        h = _terrain_height_t(terrain, gpos[:, 0, :], gpos[:, 1, :])   # (G,N)
        dx_g = dy_g = None
    Gg = gpos.shape[0]
    gap = gpos[:, 2, :] - radius - h
    neg_gap, cidx = jax.lax.top_k((-gap).T, K)            # (N,K) both
    cidxT = cidx.T                                        # (K,N)
    # one-hot contact selection: take_along_axis would lower to elementwise
    # gathers (~1.5 ms each at K=12, N=4096 on v5e); a (K,G,N) one-hot
    # contracted over G turns every gather AND scatter below into a dense
    # VPU/MXU contraction (G=78: ~50 MFLOP, sub-0.1 ms total)
    csel = (cidxT[:, None, :] ==
            jnp.arange(Gg, dtype=cidx.dtype)[None, :, None]).astype(jnp.float32)
    geom_ch = [gpos, gvel, lam_geom]                      # each (G,3,N)
    if patch_data is not None:
        geom_ch.append(jnp.stack([dx_g, dy_g], axis=1))   # (G,2,N)
    # HIGHEST precision: default TPU matmul truncates f32 operands to bf16,
    # corrupting world coords (~0.25 m at 100 m) — the one-hot operand is
    # exact, so HIGHEST makes the selection bit-exact at negligible cost
    cdata = jnp.einsum("kgn,gcn->kcn", csel,
                       jnp.concatenate(geom_ch, axis=1),
                       precision=jax.lax.Precision.HIGHEST)  # (K,C,N)
    cpos = cdata[:, 0:3]                                  # (K,3,N)
    cvel = cdata[:, 3:6]
    lam0 = cdata[:, 6:9]
    cgap = neg_gap.T                                      # (K,N)
    anc_g = jnp.asarray(layout.anc_mask, jnp.float32)[
        jnp.asarray(model.geom_body)]                     # (G,12) static
    # Feet are separate rigid bodies in the reference (go2.urdf marks the
    # foot joints dont_collapse; legged_robot.py:1038-1048 indexes them
    # apart from the penalised thigh/calf bodies). Our parser merges foot
    # geoms into the calf body, so foot contact must be EXCLUDED from the
    # per-body contact_forces report — otherwise every stance step reads as
    # calf collision and the collision penalty makes standing itself
    # negative-reward (the round-3 learning collapse). Foot forces are
    # reported separately via foot_forces.
    foot_sel = np.zeros(len(model.geom_body), np.float32)
    foot_sel[np.asarray(model.foot_geom_idx)] = 1.0
    geom2body_rep = (jax.nn.one_hot(jnp.asarray(model.geom_body), model.nb,
                                    dtype=jnp.float32)    # (G,nb) static
                     * jnp.asarray(1.0 - foot_sel)[:, None])
    if patch_data is not None:
        dx_c = cdata[:, 9]
        dy_c = cdata[:, 10]
        n = jnp.stack([-dx_c, -dy_c, jnp.ones_like(dx_c)], axis=1)  # (K,3,N)
        n = n / tm.norm(n)[..., None, :]
    else:
        n = _terrain_normal_t(terrain, cpos[:, 0, :], cpos[:, 1, :])
    active = cgap > -1e-4
    pen = jnp.maximum(cgap, 0.0)

    # tangent basis
    ref = jnp.where(jnp.abs(n[:, 2:3, :]) < 0.9,
                    jnp.broadcast_to(jnp.array([0., 0., 1.])[:, None], n.shape),
                    jnp.broadcast_to(jnp.array([1., 0., 0.])[:, None], n.shape))
    t1 = tm.cross(n, ref)
    t1 = t1 / (tm.norm(t1)[..., None, :] + 1e-9)
    t2 = tm.cross(n, t1)

    # ---- contact jacobian in Featherstone base coords (w_b, v_b, qd) ----
    # world J: [ -S(r_c) | I | a_j x (p_c - p_j) ], then rotate base blocks
    # into the base frame to match H's coordinates.
    r_c = cpos - s.pos[None]                              # (K,3,N)
    # columns for the 12 joints, masked by ancestry
    amask = jnp.einsum("kgn,gj->kjn", csel, anc_g)        # (K,12,N)
    arm_j = cpos[:, None, :, :] - jpos[None, :, :, :]     # (K,12,3,N)
    col_j = tm.cross(jnp.broadcast_to(axis_w[None], arm_j.shape), arm_j)
    col_j = col_j * amask[:, :, None, :]                  # (K,12,3,N)

    # rows in the contact frame: for frame vector f (K,3,N):
    #   row_w = -f . S(r_c) R  -> components via cross/products
    #   row_v = f R ; row_qj = f . col_j
    def rows(fvec):
        fR = tm.mtv(jnp.broadcast_to(Rbase, (K, 3, 3, N)), fvec)   # (K,3,N)
        # -f^T S(r_c) R = (f x r_c)^T R ... -f.(r x col) => use: -fS(r)= (r x f)^T? no:
        # f^T(-S(r)) e = -f.(r x e) = e.(f x r)? x.(y x e)=e.(x x y): f.(r x e)=e.(f? )
        # -f.(r x e) = -e.(f? ) use identity: f.(r x e) = e.(f x r)
        # so row_w(e) = -e.(f x r) => row_w = -(f x r_c) rotated into base: R^T(r_c x f)
        rw = tm.mtv(jnp.broadcast_to(Rbase, (K, 3, 3, N)),
                    tm.cross(r_c, fvec))                  # (K,3,N)
        rq = jnp.sum(col_j * fvec[:, None, :, :], axis=-2)  # (K,12,N)
        return jnp.concatenate([rw, fR, rq], axis=1)      # (K,18,N)

    Jn = rows(n)
    Jt1 = rows(t1)
    Jt2 = rows(t2)
    Jc = jnp.stack([Jn, Jt1, Jt2], axis=1)                # (K,3,18,N)
    Jc_flat = Jc.reshape(K * 3, 18, N)

    # ---- one structured solve: free motion + contact columns ----
    rhs = jnp.concatenate([(tau_gen - bias)[:, None, :],
                           jnp.moveaxis(Jc_flat, 0, 1)], axis=1)  # (18,1+3K,N)
    sol = _structured_solve(si, rhs)
    du_free = sol[:, 0, :]                                # (18,N)
    Binv = jnp.moveaxis(sol[:, 1:, :], 1, 0)              # (3K,18,N)

    w_b = tm.mtv(Rbase, s.ang)
    u_b = tm.mtv(Rbase, s.lin)
    u_cur = jnp.concatenate([w_b, u_b, s.qd], axis=0)
    u_free = u_cur + dt * du_free

    d_diag = jnp.maximum(
        jnp.sum(Jc_flat * Binv, axis=1).reshape(K, 3, N), 0.0) \
        + params.contact_compliance
    inv_d = 1.0 / d_diag

    vn0 = tm.dot(cvel, n)                                 # (K,N)
    push = jnp.minimum(
        params.baumgarte * jnp.maximum(pen - params.contact_slop, 0.0) / dt,
        params.max_depenetration_velocity)
    bounce = jnp.where(-vn0 > params.bounce_threshold_velocity,
                       -rest[None, :] * vn0, 0.0)
    v_target_n = jnp.maximum(push, bounce)
    mu = fric[None, :]                                    # (1,N)

    Bmat = Binv.reshape(K, 3, 18, N)

    # Mass-splitting relaxation: plain Jacobi with a fixed omega DIVERGES
    # when many coupled contacts share the articulated chain (reproduced:
    # a stair-edge pile-up at omega=0.65 reached the 1000 m/s velocity clamp
    # within one policy step; omega<=0.3 on the same state is stable). Scale
    # omega down with the active-contact count so the common <=4-contact
    # stance keeps full convergence speed while clustered states stay
    # contractive (the PGS/Jacobi "averaged projections" trick).
    n_act = jnp.sum(active.astype(jnp.float32), axis=0)    # (N,)
    omega = params.relaxation * jnp.minimum(1.0, 4.0 / jnp.maximum(n_act, 1.0))

    def solver_body(_, lam):                              # lam (K,3,N)
        du = jnp.sum(Bmat * lam[:, :, None, :], axis=(0, 1))    # (18,N)
        v_now = jnp.sum(Jc * (u_free + du)[None, None, :, :], axis=2)  # (K,3,N)
        dlam_n = (v_target_n - v_now[:, 0, :]) * inv_d[:, 0, :]
        lam_n = jnp.maximum(lam[:, 0, :] + omega[None] * dlam_n, 0.0)
        lam_n = jnp.where(active, lam_n, 0.0)
        dlam_t = -v_now[:, 1:, :] * inv_d[:, 1:, :]
        lam_t = lam[:, 1:, :] + omega[None, None] * dlam_t
        t_norm = jnp.sqrt(jnp.sum(lam_t * lam_t, axis=1, keepdims=True))
        max_t = (mu * lam_n)[:, None, :]
        scale = jnp.minimum(1.0, max_t / (t_norm + 1e-9))
        lam_t = lam_t * scale * active[:, None, :]
        return jnp.concatenate([lam_n[:, None, :], lam_t], axis=1)

    lam0 = lam0 * active[:, None, :]
    lam = jax.lax.fori_loop(0, params.solver_iters, solver_body, lam0)
    # scatter back by geom via the one-hot (top_k indices are distinct, so
    # the summed contraction equals a scatter-set)
    lam_geom_new = jnp.einsum("kgn,kcn->gcn", csel, lam,
                              precision=jax.lax.Precision.HIGHEST)

    u_new = u_free + jnp.sum(Bmat * lam[:, :, None, :], axis=(0, 1))

    new_ang = jnp.clip(tm.mv(Rbase, u_new[:3]),
                       -params.max_angular_velocity,
                       params.max_angular_velocity)
    new_lin = jnp.clip(tm.mv(Rbase, u_new[3:6]),
                       -params.max_linear_velocity,
                       params.max_linear_velocity)
    new_qd = jnp.clip(u_new[6:], -params.max_joint_velocity,
                      params.max_joint_velocity)
    new_pos = s.pos + dt * new_lin
    new_quat = tm.quat_integrate(s.quat, new_ang, dt)
    new_q = s.q + dt * new_qd
    new_s = TState(new_pos, new_quat, new_q, new_lin, new_ang, new_qd)

    # diagnostics in T layout
    frame = jnp.stack([n, t1, t2], axis=1)                # (K,3f,3c,N)
    f_contact = jnp.sum(frame * lam[:, :, None, :], axis=1) / dt   # (K,3,N)
    bweight = jnp.einsum("kgn,gb->kbn", csel, geom2body_rep)  # (K,nb,N)
    body_forces = jnp.einsum("kbn,kcn->bcn", bweight, f_contact,
                             precision=jax.lax.Precision.HIGHEST)
    foot_idx = jnp.asarray(model.foot_geom_idx)           # (4,)
    is_foot = (cidxT[None] == foot_idx[:, None, None]).astype(jnp.float32)
    # (4,K,N)
    foot_forces = jnp.sum(is_foot[:, :, None, :] * f_contact[None], axis=1)
    foot_pos = gpos[foot_idx]                             # (4,3,N)
    foot_vel = gvel[foot_idx]
    outs = dict(contact_forces=body_forces, foot_forces=foot_forces,
                foot_pos=foot_pos, foot_vel=foot_vel)
    return new_s, outs, lam_geom_new


def make_physics_step(model: RobotModel, params: SimParams,
                      terrain: TerrainData, decimation: int):
    """Full decimated PD-control physics step in T layout.

    Returns step(dyn (N-major DynParams), state (N-major SimState),
                 targets (decimation, N, 12), kp (N,12), kd (N,12),
                 motor_strength (N,12), motor_offset (N,12))
        -> (SimState, SimOutputs) both N-major; torques (N,12) of the last
           substep are included in the outputs tuple's extras slot.
    """
    layout = quad_layout(model)
    effort = jnp.asarray(model.dof_effort_limit, jnp.float32)[:, None]

    def step(dyn: DynParams, state: SimState, targets, kp, kd,
             motor_strength, motor_offset):
        s = to_t(state)
        dyn_t = dict(mass=jnp.moveaxis(dyn.mass, 0, -1),
                     com=jnp.moveaxis(dyn.com, 0, -1),
                     inertia=jnp.moveaxis(dyn.inertia, 0, -1))
        fric = dyn.friction
        rest = dyn.restitution
        kpT, kdT = kp.T, kd.T
        strT, offT = motor_strength.T, motor_offset.T
        targetsT = jnp.moveaxis(targets, -1, 1)          # (decimation,12,N)

        G = len(model.geom_body)
        N = state.base_pos.shape[0]

        # --- per-policy-step terrain patches (ops/terrain_patches.py) ---
        patch_data = None
        if terrain.channels is not None and not terrain.is_flat:
            from go2_rl_gym_tpu.ops import terrain_patches as tp
            scale = terrain.horizontal_scale
            # channels is (3, C, R) — x minor (ops/terrain_patches.py)
            C_, R_ = terrain.channels.shape[1:3]
            bix = ((state.base_pos[:, 0] + terrain.border_offset)
                   / scale).astype(jnp.int32)
            biy = ((state.base_pos[:, 1] + terrain.border_offset)
                   / scale).astype(jnp.int32)
            origins = tp.compute_origins(bix, biy, R_, C_)
            patches = tp.extract_patches(terrain.channels, origins)
            patch_data = (patches, origins)

        def body(carry, tgt):
            s, lam_geom = carry
            # PD torque (reference legged_robot.py:594-618)
            tau = kpT * (tgt + offT - s.q) - kdT * s.qd
            tau = jnp.clip(tau, -effort, effort)
            tau = tau * strT
            s2, outs, lam_geom = _substep(model, layout, params, terrain,
                                          dyn_t, fric, rest, s, tau, kdT,
                                          lam_geom, patch_data)
            return (s2, lam_geom), (tau, outs)

        (s, _), (taus, outs) = jax.lax.scan(
            body, (s, jnp.zeros((G, 3, N))), targetsT)
        last = jax.tree.map(lambda x: x[-1], outs)
        outputs = SimOutputs(
            contact_forces=jnp.moveaxis(last["contact_forces"], -1, 0),
            foot_forces=jnp.moveaxis(last["foot_forces"], -1, 0),
            foot_pos=jnp.moveaxis(last["foot_pos"], -1, 0),
            foot_vel=jnp.moveaxis(last["foot_vel"], -1, 0),
        )
        return from_t(s), outputs, taus[-1].T, patch_data

    return step
