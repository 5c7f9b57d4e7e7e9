"""Rotation representation conversions in JAX.

Capability parity with the reference conversion suite
(lib/utils/transform.py:377-593: aa/quat/rot6d/rotmat in all pairings),
implemented from the standard closed-form math (Rodrigues, Shepperd
quaternion extraction, Zhou et al. 6D continuity representation).
All functions accept arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_norm(x: jnp.ndarray, axis=-1, keepdims=True, eps: float = 1e-24) -> jnp.ndarray:
    """sqrt(sum(x^2)) with a zero (not NaN) gradient at x == 0."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=keepdims), eps))


def aa_to_quat(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> unit quaternion (..., 4), w-first."""
    angle = _safe_norm(axis_angle)
    half = 0.5 * angle
    # sin(x/2)/x with a stable small-angle expansion.
    small = angle < 1e-6
    sin_half_over = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    w = jnp.cos(half)
    xyz = axis_angle * sin_half_over
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_aa(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) w-first -> axis-angle (..., 3)."""
    quat = quat / _safe_norm(quat)
    w = quat[..., :1]
    xyz = quat[..., 1:]
    norm = _safe_norm(xyz)
    angle = 2.0 * jnp.arctan2(norm, w)
    small = norm < 1e-6
    # angle/sin(angle/2) factor, stable near zero
    scale = jnp.where(small, 2.0 + angle * angle / 12.0, angle / jnp.where(small, 1.0, norm))
    return xyz * scale


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) w-first -> rotation matrix (..., 3, 3)."""
    quat = quat / _safe_norm(quat)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    two = 2.0
    m = jnp.stack(
        [
            1 - two * (y * y + z * z),
            two * (x * y - w * z),
            two * (x * z + w * y),
            two * (x * y + w * z),
            1 - two * (x * x + z * z),
            two * (y * z - w * x),
            two * (x * z - w * y),
            two * (y * z + w * x),
            1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def rotmat_to_quat(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w-first.

    Branch-free Shepperd method: compute all four candidate quaternions
    and select the best-conditioned one (vectorizes cleanly on TPU).
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    q_w = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q_x = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    q_y = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # candidate squared norms: 4*q_i^2 for the respective pivot component
    k = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(k, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def aa_to_rotmat(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    return quat_to_rotmat(aa_to_quat(axis_angle))


def rotmat_to_aa(matrix: jnp.ndarray) -> jnp.ndarray:
    return quat_to_aa(rotmat_to_quat(matrix))


def rot6d_to_rotmat(rot6d: jnp.ndarray) -> jnp.ndarray:
    """6D (..., 6) -> rotation matrix (..., 3, 3) via Gram-Schmidt.

    Zhou et al., "On the Continuity of Rotation Representations in
    Neural Networks" (CVPR 2019). The 6 numbers are the first two rows
    of the matrix before orthonormalisation (pytorch3d convention, as
    consumed by the reference's rot6d_to_aa in the parametric head:
    lib/models/bricks/pt_metro_transformer.py:146).
    """
    a1 = rot6d[..., 0:3]
    a2 = rot6d[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def rotmat_to_rot6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D: first two rows, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rot6d_to_aa(rot6d: jnp.ndarray) -> jnp.ndarray:
    return rotmat_to_aa(rot6d_to_rotmat(rot6d))


def aa_to_rot6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return rotmat_to_rot6d(aa_to_rotmat(axis_angle))


def quat_to_rot6d(quat: jnp.ndarray) -> jnp.ndarray:
    return rotmat_to_rot6d(quat_to_rotmat(quat))


def rot6d_to_quat(rot6d: jnp.ndarray) -> jnp.ndarray:
    return rotmat_to_quat(rot6d_to_rotmat(rot6d))
