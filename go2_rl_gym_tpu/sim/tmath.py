"""T-layout (batch-minor) math for the TPU physics engine.

TPU memory tiles are (sublane=8, lane=128) over the last two axes; arrays
shaped (N, 3) or (N, 3, 3) pad their size-3 minor dims to 128 lanes — a ~40x
HBM-traffic inflation that made the naive vmap engine bandwidth-bound on
padding. All engine internals therefore keep the env batch N as the LAST axis
("structure-of-arrays"): a position is (3, N), a rotation (3, 3, N), the mass
matrix (18, 18, N). Structure dims land on sublanes (3->8, modest), N fills
lanes exactly, and every contraction is written as broadcast-multiply +
reduce over non-minor axes so XLA never emits padded batched dot_generals.

Convention: component axes lead, batch axis trails. Quaternions are xyzw.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# vectors: (..., 3, N)
# ---------------------------------------------------------------------------


def cross(a, b):
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-2)


def dot(a, b):
    """(..., 3, N) . (..., 3, N) -> (..., N)."""
    return jnp.sum(a * b, axis=-2)


def norm(a, eps=0.0):
    return jnp.sqrt(jnp.sum(a * a, axis=-2) + eps)


# ---------------------------------------------------------------------------
# matrices: (..., r, c, N)
# ---------------------------------------------------------------------------


def mv(M, v):
    """(..., r, c, N) @ (..., c, N) -> (..., r, N)."""
    return jnp.sum(M * v[..., None, :, :], axis=-2)


def mtv(M, v):
    """M^T v: (..., r, c, N), (..., r, N) -> (..., c, N)."""
    return jnp.sum(M * v[..., :, None, :], axis=-3)


def mm(A, B):
    """(..., i, j, N) @ (..., j, k, N) -> (..., i, k, N)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)


def mtm(A, B):
    """A^T B: (..., i, j, N), (..., i, k, N) -> (..., j, k, N)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., :, None, :, :], axis=-4)


def mmt(A, B):
    """A B^T: (..., i, j, N), (..., k, j, N) -> (..., i, k, N)."""
    return jnp.sum(A[..., :, None, :, :] * B[..., None, :, :, :], axis=-2)


def transpose(M):
    return jnp.swapaxes(M, -3, -2)


def skew(v):
    """(..., 3, N) -> (..., 3, 3, N)."""
    x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-2),
        jnp.stack([z, zero, -x], axis=-2),
        jnp.stack([-y, x, zero], axis=-2),
    ]
    return jnp.stack(rows, axis=-3)


def eye3(shape_like):
    """(3, 3, N) identity broadcast against a (..., N) array's batch."""
    N = shape_like.shape[-1]
    return jnp.broadcast_to(jnp.eye(3)[:, :, None], (3, 3, N))


def inv3(M):
    """Explicit 3x3 inverse, batched (..., 3, 3, N)."""
    a, b, c = M[..., 0, 0, :], M[..., 0, 1, :], M[..., 0, 2, :]
    d, e, f = M[..., 1, 0, :], M[..., 1, 1, :], M[..., 1, 2, :]
    g, h, i = M[..., 2, 0, :], M[..., 2, 1, :], M[..., 2, 2, :]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    rows = [
        jnp.stack([A, B, C], axis=-2),
        jnp.stack([D, E, F], axis=-2),
        jnp.stack([G, H, I], axis=-2),
    ]
    return jnp.stack(rows, axis=-3) * inv_det[..., None, None, :]


def inv6_spd(M):
    """6x6 SPD inverse via 3x3 block Schur, batched (..., 6, 6, N)."""
    P = M[..., :3, :3, :]
    Q = M[..., :3, 3:, :]
    R = M[..., 3:, 3:, :]
    Pi = inv3(P)
    T = R - mm(transpose(Q), mm(Pi, Q))
    Ti = inv3(T)
    PiQ = mm(Pi, Q)
    tl = Pi + mm(PiQ, mm(Ti, transpose(PiQ)))
    tr = -mm(PiQ, Ti)
    bl = transpose(tr)
    top = jnp.concatenate([tl, tr], axis=-2)
    bot = jnp.concatenate([bl, Ti], axis=-2)
    return jnp.concatenate([top, bot], axis=-3)


# ---------------------------------------------------------------------------
# quaternions: (4, N) xyzw
# ---------------------------------------------------------------------------


def quat_rotate(q, v):
    xyz = q[..., :3, :]
    w = q[..., 3:4, :]
    t = 2.0 * cross(xyz, v)
    return v + w * t + cross(xyz, t)


def quat_rotate_inverse(q, v):
    xyz = q[..., :3, :]
    w = q[..., 3:4, :]
    t = 2.0 * cross(xyz, v)
    return v - w * t + cross(xyz, t)


def quat_to_matrix(q):
    x, y, z, w = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-2),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-2),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-2),
    ]
    return jnp.stack(rows, axis=-3)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0, :], a[..., 1, :], a[..., 2, :], a[..., 3, :]
    bx, by, bz, bw = b[..., 0, :], b[..., 1, :], b[..., 2, :], b[..., 3, :]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-2)


def quat_normalize(q, eps=1e-9):
    return q / (norm(q)[..., None, :] + eps)


def quat_integrate(q, omega, dt):
    """Integrate attitude with world angular velocity (exponential map)."""
    angle = norm(omega)                               # (N,)
    safe = jnp.where(angle > 1e-9, angle, 1.0)
    axis = omega / safe[..., None, :]
    half = 0.5 * angle * dt
    dq = jnp.concatenate([axis * jnp.sin(half)[..., None, :],
                          jnp.cos(half)[..., None, :]], axis=-2)
    return quat_normalize(quat_mul(dq, q))


def rodrigues(axis_static, angle):
    """Rotation matrices about static axes.

    axis_static: (..., 3) numpy/static; angle: (..., N) -> (..., 3, 3, N).
    """
    a = jnp.asarray(axis_static, jnp.float32)[..., None]        # (...,3,1)
    c = jnp.cos(angle)[..., None, None, :]
    s = jnp.sin(angle)[..., None, None, :]
    x, y, z = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-2),
        jnp.stack([z, zero, -x], axis=-2),
        jnp.stack([-y, x, zero], axis=-2),
    ], axis=-3)                                                  # (...,3,3,1)
    aaT = a[..., :, None, :] * a[..., None, :, :]                # (...,3,3,1)
    eye = jnp.eye(3).reshape((1,) * (K.ndim - 3) + (3, 3, 1))
    return c * eye + s * K + (1.0 - c) * aaT
