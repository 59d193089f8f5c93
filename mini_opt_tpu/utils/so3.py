"""Quaternion / SO(3) utilities.

TPU-native analog of the reference's vendored ``geometry_utils`` submodule
(usage: /root/reference/test/transform_chains.cc:57-110). Quaternions are
``(4,)`` arrays in ``[w, x, y, z]`` layout; everything is pure jnp, works in
any float dtype, and batches under ``vmap``.

Euler convention matches the reference: ``CompositionOrder::XYZ`` means
``R = Rx(a) @ Ry(b) @ Rz(c)``, and rotation derivatives are expressed in the
right (body-frame) tangent of SO(3): ``dR = R @ skew(w)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def quat_identity(dtype=jnp.float64) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2 (wxyz layout)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion q: R(q) @ v."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix of q; shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) as a quaternion (wxyz).

    Taylor-guarded near zero so it is safe under jit/grad.
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    # tiny floor: sqrt at exactly 0 has infinite slope, which poisons
    # reverse-mode gradients even through the discarded where-branch.
    theta = jnp.sqrt(jnp.maximum(theta_sq, jnp.finfo(w.dtype).tiny))
    small = theta_sq < 1e-16
    half = 0.5 * theta
    # sin(t/2)/t with Taylor fallback 0.5 - t^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    cw = jnp.cos(half)
    return jnp.concatenate([cw, k * w], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Log map SO(3) -> so(3): rotation vector of q (wxyz layout)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # take the short arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    # tiny floor (same rationale as quat_exp): norm at exactly 0 has an
    # undefined derivative whose 0/0 = NaN poisons REVERSE-mode gradients
    # even when the cotangent is zero and the small branch is selected --
    # vjp(|v|) evaluates v/|v| regardless.
    vn_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn_sq, jnp.finfo(q.dtype).tiny))
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn_sq < 1e-24
    scale = jnp.where(small, 2.0 / jnp.where(small, 1.0, w), angle / jnp.where(small, 1.0, vn))
    return scale * v


def skew3(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix [v]_x, shape (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def mod_pi(angle: jax.Array) -> jax.Array:
    """Wrap angle(s) into (-pi, pi]."""
    return angle - 2.0 * jnp.pi * jnp.floor((angle + jnp.pi) / (2.0 * jnp.pi))


def _axis_quat(angle: jax.Array, axis: int) -> jax.Array:
    half = 0.5 * angle
    c, s = jnp.cos(half), jnp.sin(half)
    z = jnp.zeros_like(angle)
    parts = [c, z, z, z]
    parts[1 + axis] = s
    return jnp.stack(parts, axis=-1)


class SO3FromEulerAngles(NamedTuple):
    """Rotation built from XYZ euler angles plus the Jacobian of the SO(3)
    right tangent wrt the angles (analog of math::SO3FromEulerAngles_)."""

    q: jax.Array  # (4,) quaternion
    rotation_D_angles: jax.Array  # (3, 3): d(right tangent)/d(a, b, c)


def so3_from_euler_angles_xyz(angles_xyz: jax.Array) -> SO3FromEulerAngles:
    """Build R = Rx(a) @ Ry(b) @ Rz(c) and d(right-tangent)/d(angles).

    Right-tangent derivative: R^T dR/da_i = skew(J[:, i]); for XYZ order
    J = [ (Ry Rz)^T e_x, Rz^T e_y, e_z ].
    """
    a, b, c = angles_xyz[..., 0], angles_xyz[..., 1], angles_xyz[..., 2]
    qx = _axis_quat(a, 0)
    qy = _axis_quat(b, 1)
    qz = _axis_quat(c, 2)
    q = quat_multiply(qx, quat_multiply(qy, qz))

    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    zeros = jnp.zeros_like(b)
    ones = jnp.ones_like(b)
    # (Ry Rz)^T e_x = first row of Ry @ Rz = (cb*cc, -cb*sc ... ) transposed:
    # column = [cb*cc, -sc? ...]; compute explicitly:
    # Ry @ Rz row 0 = [cb*cc, -cb*sc, sb]; (Ry Rz)^T e_x = first COLUMN of
    # (Ry Rz)^T = first ROW of (Ry Rz) = [cb*cc, -cb*sc, sb]... but as a
    # column vector of the transposed matrix applied to e_x.
    col_a = jnp.stack([cb * cc, -cb * sc, sb], axis=-1)
    col_b = jnp.stack([sc, cc, zeros], axis=-1)
    col_c = jnp.stack([zeros, zeros, ones], axis=-1)
    J = jnp.stack([col_a, col_b, col_c], axis=-1)
    return SO3FromEulerAngles(q=q, rotation_D_angles=J)


def euler_angles_xyz_from_quat(q: jax.Array) -> jax.Array:
    """Inverse of so3_from_euler_angles_xyz: recover (a, b, c) such that
    R = Rx(a) Ry(b) Rz(c). Valid away from the cos(b) = 0 singularity."""
    r = quat_to_matrix(q)
    b = jnp.arcsin(jnp.clip(r[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-r[..., 1, 2], r[..., 2, 2])
    c = jnp.arctan2(-r[..., 0, 1], r[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_from_matrix(R: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) from a rotation matrix, branchless Shepperd:
    build all four candidate quaternions (one per largest component), select
    by one-hot on the largest diagonal combination, normalize. Robust at
    180-degree rotations where the naive trace formula divides by ~0
    (geometry_utils analog; the numpy twin lives in
    models/bundle_adjustment.py's scene generator)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    cands = jnp.stack(
        [
            jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01]),
            jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20]),
            jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21]),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11]),
        ]
    )  # (4, 4); candidate k has leading term 4 q_k^2
    lead = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
         1.0 + m22 - m00 - m11]
    )
    sel = (jnp.arange(4) == jnp.argmax(lead)).astype(R.dtype)
    q = sel @ cands
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)  # w >= 0 representative
    return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q), jnp.finfo(R.dtype).tiny))
