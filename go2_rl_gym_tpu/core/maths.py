"""Quaternion / rotation / rigid-transform math for the TPU-native Go2 stack.

Pure-JAX replacement for the quaternion helpers the reference imports from
``isaacgym.torch_utils`` (see reference legged_gym/envs/base/legged_robot.py:8,
legged_gym/utils/math.py:8-26, legged_gym/utils/isaacgym_utils.py:11-30).

Conventions
-----------
* Quaternions are stored ``(x, y, z, w)`` — the Isaac Gym / PhysX layout the
  reference uses for ``root_states[:, 3:7]`` — so observation semantics match.
* All functions are shape-polymorphic over leading batch dims and jit/vmap
  friendly (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion algebra (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(batch_shape=()) -> jax.Array:
    q = jnp.zeros(batch_shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_normalize(q: jax.Array, eps: float = 1e-9) -> jax.Array:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (body -> world for body-attitude q)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q^-1 (world -> body). Matches isaacgym quat_rotate_inverse."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v - w * t + jnp.cross(xyz, t)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle[..., None]
    xyz = axis * jnp.sin(half)
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler -> quaternion, matching isaacgym.torch_utils.quat_from_euler_xyz."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_to_euler_xyz(q: jax.Array) -> jax.Array:
    """Quaternion -> (roll, pitch, yaw), matching the reference's get_euler_xyz
    (reference legged_gym/utils/isaacgym_utils.py:11-30)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by only the yaw component of q (reference legged_gym/utils/math.py:8-14)."""
    yaw_q = jnp.zeros_like(q)
    yaw_q = yaw_q.at[..., 2].set(q[..., 2])
    yaw_q = yaw_q.at[..., 3].set(q[..., 3])
    yaw_q = quat_normalize(yaw_q)
    return quat_rotate(yaw_q, v)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (body -> world)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt: float) -> jax.Array:
    """Integrate attitude with world-frame angular velocity (exponential map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.where(angle > 1e-9, angle, 1.0)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


def wrap_to_pi(angles: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi] (reference legged_gym/utils/math.py:16-20)."""
    a = jnp.mod(angles, 2 * jnp.pi)
    return jnp.where(a > jnp.pi, a - 2 * jnp.pi, a)


# ---------------------------------------------------------------------------
# 3D helpers
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def rpy_to_matrix(rpy: jax.Array) -> jax.Array:
    """URDF rpy (fixed-axis XYZ: R = Rz(y) Ry(p) Rx(r)) -> rotation matrix."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(rpy.shape[:-1] + (3, 3))


def axis_angle_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues formula; axis assumed unit-norm."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    return c * eye + s * K + (1.0 - c) * outer


# ---------------------------------------------------------------------------
# Random sampling helpers (counterparts of isaacgym_utils samplers)
# ---------------------------------------------------------------------------


def uniform(key: jax.Array, shape, lo, hi) -> jax.Array:
    return jax.random.uniform(key, shape, minval=0.0, maxval=1.0) * (hi - lo) + lo


def sample_disjoint_intervals(key: jax.Array, limit_bound: jax.Array,
                              lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Uniform over [lo, -limit_bound] U [limit_bound, hi].

    Counterpart of reference legged_gym/utils/isaacgym_utils.py:32-47.
    """
    width_neg = jax.nn.relu(-limit_bound - lo)
    width_pos = jax.nn.relu(hi - limit_bound)
    total = width_neg + width_pos + 1e-6
    u = jax.random.uniform(key, limit_bound.shape) * total
    return jnp.where(u < width_neg, lo + u, hi - width_pos + (u - width_neg))


def sample_single_interval(key: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Uniform over [lo, hi] (reference isaacgym_utils.py:49-55)."""
    r = jax.random.uniform(key, jnp.shape(lo))
    return lo + r * (hi - lo)
