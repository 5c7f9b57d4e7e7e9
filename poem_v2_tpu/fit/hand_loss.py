"""Axis-aware anatomical hand losses (JAX).

Faithful port of the reference fitter's anatomical stack: the
``HandLoss`` static penalties (lib/fit/hand_loss.py:10-141) plus the
manotorch ``AxisLayer`` semantics they consume
(lib/fit/frame_fit/one_frame_fit.py:38,213-226): per-joint orthonormal
anatomy frames (back = local bone direction, left = flexion axis,
up = splay axis), against which the pose's per-joint rotation axis is
constrained — twist (b) and splay (u) components are penalised, the
flexion component (l) is encouraged, MCP joints get soft tolerance
windows and the thumb gets wider ones.

Joint indexing: pose joints 1..15 are MANO-native order
(index/middle/pinky/ring/thumb chains); ``JOINTS_MAPPING`` maps each to
its OpenPose-ordered output joint (our ManoLayer emits OpenPose order,
mano/layer.py:133-139), exactly manotorch's mapping.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# OpenPose output-joint index of MANO pose joints 1..15 (manotorch
# axislayer joints_mapping); child joint = mapping + 1 along each finger
JOINTS_MAPPING = np.asarray([5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3])

# MCP joints (first knuckle of index/middle/pinky/ring) get a soft
# tolerance window; the thumb root is the softest (reference
# hand_loss.py:53-141 b/u/l_soft_idx)
SOFT_IDX = np.asarray([0, 3, 9, 6])
THUMB_SOFT_IDX = np.asarray([12])
RESTRICT_IDX = np.asarray(
    [i for i in range(15) if i not in SOFT_IDX.tolist() + THUMB_SOFT_IDX.tolist()]
)


# --------------------------------------------------------------------------
# quaternion helpers (w, x, y, z) — manotorch quatutils contracts
# --------------------------------------------------------------------------

def quaternion_norm_squared(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(q * q, axis=-1)


def quaternion_inv(q: jnp.ndarray) -> jnp.ndarray:
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.maximum(quaternion_norm_squared(q)[..., None], 1e-12)


def quaternion_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = (q[..., i] for i in range(4))
    w2, x2, y2, z2 = (r[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


# --------------------------------------------------------------------------
# axis layer
# --------------------------------------------------------------------------

def hand_axes(joints21: jnp.ndarray, transforms: jnp.ndarray):
    """Per-joint anatomy frames (manotorch AxisLayer).

    Args:
      joints21: (B, 21, 3) OpenPose-ordered joints.
      transforms: (B, 16, 4, 4) absolute joint transforms (ManoOutput).

    Returns (b_axis, u_axis, l_axis), each (B, 15, 3) unit vectors in the
    joint's LOCAL frame: b = bone direction (joint -> child, inverted),
    l = flexion axis (cross of b with the +y up base), u = splay axis.
    """
    mapping = jnp.asarray(JOINTS_MAPPING)
    b = joints21[:, mapping] - joints21[:, mapping + 1]  # (B, 15, 3) world
    rot = transforms[:, 1:, :3, :3]  # (B, 15, 3, 3)
    # into the local frame: R^T @ b
    b = jnp.einsum("bkji,bkj->bki", rot, b)

    def _unit(v):
        # sqrt(|v|^2 + eps): finite gradient at v = 0, unlike linalg.norm
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)

    b = _unit(b)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dtype=b.dtype), b.shape)
    l = _unit(jnp.cross(b, up))
    u = _unit(jnp.cross(l, b))
    return b, u, l


# --------------------------------------------------------------------------
# HandLoss penalties (reference hand_loss.py, formula-identical)
# --------------------------------------------------------------------------

def pose_quat_norm_loss(var_pose: jnp.ndarray) -> jnp.ndarray:
    """Accepts unnormalised quats; drives ||q||^2 -> 1 (hand_loss.py:13-19)."""
    q = var_pose.reshape(var_pose.shape[0], 16, 4)
    return jnp.mean((quaternion_norm_squared(q) - 1.0) ** 2)


def pose_reg_loss(var_pose_normed: jnp.ndarray, var_pose_init: jnp.ndarray) -> jnp.ndarray:
    """w-component of q * inv(q_init) pulled to 1 (hand_loss.py:21-32)."""
    combined = quaternion_mul(var_pose_normed, quaternion_inv(var_pose_init))
    return jnp.mean((combined[..., 0] - 1.0) ** 2)


def shape_reg_loss(var_shape: jnp.ndarray, shape_init: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.sum((var_shape - shape_init) ** 2, axis=-1))


def _axis_cos_loss(axis_cos, angle_mask, soft_tol, thumb_tol, align=False):
    """Shared body of the b/u/l losses: restricted joints penalise the
    raw cosine (or its distance from 1 when ``align``); soft joints get a
    relu window of half-width ``tol``."""
    restrict = axis_cos[:, RESTRICT_IDX]
    if align:
        soft = jnp.maximum(-axis_cos[:, SOFT_IDX] + 1.0 - np.cos(np.pi / 2 - soft_tol), 0.0)
        thumb = jnp.maximum(
            -axis_cos[:, THUMB_SOFT_IDX] + 1.0 - np.cos(np.pi / 2 - thumb_tol), 0.0
        )
        restrict_term = (restrict - 1.0) * angle_mask[:, RESTRICT_IDX]
    else:
        soft = jnp.maximum(jnp.abs(axis_cos[:, SOFT_IDX]) - np.cos(np.pi / 2 - soft_tol), 0.0)
        thumb = jnp.maximum(
            jnp.abs(axis_cos[:, THUMB_SOFT_IDX]) - np.cos(np.pi / 2 - thumb_tol), 0.0
        )
        restrict_term = restrict * angle_mask[:, RESTRICT_IDX]
    return (
        jnp.mean(restrict_term**2)
        + jnp.mean((soft * angle_mask[:, SOFT_IDX]) ** 2)
        + jnp.mean((thumb * angle_mask[:, THUMB_SOFT_IDX]) ** 2)
    )


def joint_b_axis_loss(b_axis, axis, angle_mask):
    """No twist about the bone; MCPs +-5 deg, thumb +-20 deg
    (hand_loss.py:50-75)."""
    cos = jnp.einsum("bki,bki->bk", b_axis, axis)
    return _axis_cos_loss(cos, angle_mask, np.pi / 36, np.pi / 9)


def joint_u_axis_loss(u_axis, axis, angle_mask):
    """No splay; MCPs +-30 deg, thumb +-60 deg (hand_loss.py:77-101)."""
    cos = jnp.einsum("bki,bki->bk", u_axis, axis)
    return _axis_cos_loss(cos, angle_mask, np.pi / 6, np.pi / 3)


def joint_l_limit_loss(l_axis, axis, angle_mask):
    """Rotation axis should ALIGN with the flexion axis; MCPs 20 deg,
    thumb 60 deg slack (hand_loss.py:103-128)."""
    cos = jnp.einsum("bki,bki->bk", l_axis, axis)
    return _axis_cos_loss(cos, angle_mask, np.pi / 9, np.pi / 3, align=True)


def rotation_angle_loss(angle, limit_angle=np.pi / 2, eps=1e-10):
    """Quadratic over-rotation beyond pi/2 (hand_loss.py:130-141)."""
    angle = jnp.where(jnp.abs(angle) > eps, angle, 0.0)
    over = jnp.maximum(angle - limit_angle, 0.0)
    return jnp.mean(over**2)


def anatomical_loss(
    quat_raw: jnp.ndarray,  # (B, 16, 4) unnormalised optimisation variable
    quat_normed: jnp.ndarray,  # (B, 16, 4) normalised
    shape: jnp.ndarray,  # (B, 10)
    joints21: jnp.ndarray,  # (B, 21, 3)
    transforms: jnp.ndarray,  # (B, 16, 4, 4)
    gamma_b: float = 1.0,
    gamma_u: float = 1.0,
    gamma_l: float = 0.01,
    gamma_angle: float = 0.0,
) -> jnp.ndarray:
    """The reference's full hand_anatomical_loss combination
    (one_frame_fit.py:180-236 with its default gammas)."""
    B = quat_raw.shape[0]
    quat_norm = pose_quat_norm_loss(quat_raw)
    init = jnp.zeros((B, 15, 4), dtype=quat_raw.dtype).at[..., 0].set(1.0)
    pose_reg = pose_reg_loss(quat_normed[:, 1:], init)
    shape_reg = shape_reg_loss(shape, jnp.zeros_like(shape))

    b_axis, u_axis, l_axis = hand_axes(joints21, transforms)
    # per-joint rotation axis/angle from the normalised quats (w, xyz);
    # sqrt(|v|^2 + eps) keeps the gradient finite at the zero-rotation init
    w = jnp.clip(quat_normed[:, 1:, 0], -1.0, 1.0)
    vec = quat_normed[:, 1:, 1:]
    sin_half = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-16)
    axis = vec / sin_half[..., None]
    angle = 2.0 * jnp.arctan2(sin_half, w)
    angle_mask = (angle >= 1e-2).astype(quat_raw.dtype)

    return (
        1.0 * quat_norm
        + 0.0 * pose_reg
        + 0.1 * shape_reg
        + gamma_angle * rotation_angle_loss(angle)
        + gamma_b * joint_b_axis_loss(b_axis, axis, angle_mask)
        + gamma_u * joint_u_axis_loss(u_axis, axis, angle_mask)
        + gamma_l * joint_l_limit_loss(l_axis, axis, angle_mask)
    )
