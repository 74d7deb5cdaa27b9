"""Rotation codecs in pure jnp, convention-matched to the reference.

The reference round-trips rotations through scipy on the host
(genrobo3d/utils/rotation_transform.py, genrobo3d/models/base.py:68) — a
device->host sync in the hot path. Here every codec is a traced jnp op so
pose embedding and action decoding stay on-device.

Conventions (matching scipy.spatial.transform.Rotation):
  * quaternions are xyzw (scalar last)
  * euler angles are extrinsic 'xyz': R = Rz(gamma) @ Ry(beta) @ Rx(alpha),
    returned/consumed in order [alpha, beta, gamma]
  * in gimbal lock (|beta| = 90 deg) the third angle is set to 0, like scipy.

Golden-tested against scipy and the reference's quaternion_to_discrete_euler /
discrete_euler_to_quaternion (rotation_transform.py:151-194).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def normalize(v, axis=-1, eps=_EPS):
    mag = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / jnp.maximum(mag, eps)


def quat_to_matrix(q):
    """q: (..., 4) xyzw -> (..., 3, 3)."""
    q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """(..., 3, 3) -> (..., 4) xyzw. Branchless Shepperd (largest pivot).

    Sign may differ from scipy by a global factor of -1 per element of the
    batch; quaternion sign is semantically irrelevant for rotations.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate 4*q_i^2 - 1 pivots
    qw2 = tr
    qx2 = m00 - m11 - m22
    qy2 = m11 - m00 - m22
    qz2 = m22 - m00 - m11

    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + qw2, _EPS)) * 2  # 4w
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s,
                          (m10 - m01) / s, s / 4], axis=-1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + qx2, _EPS)) * 2
        return jnp.stack([s / 4, (m01 + m10) / s,
                          (m02 + m20) / s, (m21 - m12) / s], axis=-1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + qy2, _EPS)) * 2
        return jnp.stack([(m01 + m10) / s, s / 4,
                          (m12 + m21) / s, (m02 - m20) / s], axis=-1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + qz2, _EPS)) * 2
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s,
                          s / 4, (m10 - m01) / s], axis=-1)

    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return normalize(q)


def euler_to_matrix(euler, degrees=False):
    """extrinsic xyz: R = Rz @ Ry @ Rx. euler: (..., 3) [alpha, beta, gamma]."""
    e = jnp.deg2rad(euler) if degrees else euler
    a, b, c = e[..., 0], e[..., 1], e[..., 2]
    sa, ca = jnp.sin(a), jnp.cos(a)
    sb, cb = jnp.sin(b), jnp.cos(b)
    sc, cc = jnp.sin(c), jnp.cos(c)
    m = jnp.stack([
        cb * cc, sa * sb * cc - ca * sc, ca * sb * cc + sa * sc,
        cb * sc, sa * sb * sc + ca * cc, ca * sb * sc - sa * cc,
        -sb, sa * cb, ca * cb,
    ], axis=-1)
    return m.reshape(e.shape[:-1] + (3, 3))


def matrix_to_euler(m, degrees=False):
    """Inverse of euler_to_matrix with scipy's gimbal-lock convention
    (third angle -> 0)."""
    sb = -m[..., 2, 0]
    sb_clamped = jnp.clip(sb, -1.0, 1.0)
    b = jnp.arcsin(sb_clamped)
    locked = jnp.abs(sb) > 1.0 - 1e-7

    a_free = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    c_free = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    # lock: beta=+90 -> R[0,1]=sin(a-c), R[1,1]=cos(a-c); set c=0
    #       beta=-90 -> R[0,1]=-sin(a+c), R[1,1]=cos(a+c); set c=0
    a_lock = jnp.where(
        sb > 0,
        jnp.arctan2(m[..., 0, 1], m[..., 1, 1]),
        jnp.arctan2(-m[..., 0, 1], m[..., 1, 1]),
    )
    a = jnp.where(locked, a_lock, a_free)
    c = jnp.where(locked, 0.0, c_free)
    e = jnp.stack([a, b, c], axis=-1)
    return jnp.rad2deg(e) if degrees else e


def euler_to_quat(euler, degrees=False):
    return matrix_to_quat(euler_to_matrix(euler, degrees))


def quat_to_euler(q, degrees=False):
    return matrix_to_euler(quat_to_matrix(q), degrees)


# ---------------- 6D rotation (reference rotation_transform.py:44-79) -------

def rot6d_to_matrix(poses):
    """poses: (..., 6) -> (..., 3, 3); columns x, y, z."""
    x_raw, y_raw = poses[..., 0:3], poses[..., 3:6]
    x = normalize(x_raw)
    z = normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_rot6d(m):
    """first two columns, flattened column-major: (..., 6)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


# ---------------- discrete euler (reference rotation_transform.py:151-194) --

def gimbal_fix_euler_deg(euler):
    """RVT-2 sensitive-gimbal fix: snap beta in (89,91) to 90 (and mirrored),
    then recanonicalize so the z angle collapses to 0 in the locked regime.
    Matches sensitive_gimble_fix (rotation_transform.py:151-170) without the
    host round-trip: recanonicalization via euler->matrix->euler.
    """
    b = euler[..., 1]
    snap_hi = (b > 89.0) & (b < 91.0)
    snap_lo = (b > -91.0) & (b < -89.0)
    b_fixed = jnp.where(snap_hi, 90.0, jnp.where(snap_lo, -90.0, b))
    e_fixed = jnp.stack([euler[..., 0], b_fixed, euler[..., 2]], axis=-1)
    return matrix_to_euler(euler_to_matrix(e_fixed, degrees=True), degrees=True)


def quat_to_discrete_euler(q, resolution, gimbal_fix=True):
    """(..., 4) xyzw -> (..., 3) int32 bins in [0, 360/resolution)."""
    euler = quat_to_euler(q, degrees=True)
    if gimbal_fix:
        euler = gimbal_fix_euler_deg(euler)
    euler = euler + 180.0
    disc = jnp.round(euler / resolution).astype(jnp.int32)
    nbins = int(360 / resolution)
    return jnp.where(disc == nbins, 0, disc)


def discrete_euler_to_quat(disc, resolution):
    euler = disc.astype(jnp.float32) * resolution - 180.0
    return euler_to_quat(euler, degrees=True)
