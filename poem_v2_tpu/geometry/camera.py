"""Batched pinhole-camera math in JAX.

Capability parity with the reference camera helpers
(lib/utils/transform.py:733-946): extrinsic transforms, intrinsic
projection, perspective projection, uvd<->xyz, OpenPose reorder.
All ops are shape-polymorphic over leading batch dims and vectorize
onto the TPU VPU/MXU; the ragged per-sample loops of the reference are
replaced by an explicit view axis + boolean masks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..utils.misc import CONST


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with clamping (reference lib/utils/transform.py inverse_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def cam_extr_transf(extr: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform(s) to points.

    extr: (..., 4, 4); points: (..., N, 3) -> (..., N, 3).
    Equivalent to reference batch_cam_extr_transf (transform.py:898-911)
    but with arbitrary batch dims.
    """
    rot = extr[..., :3, :3]
    t = extr[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points, precision="highest") + t[..., None, :]


def cam_intr_projection(intr: jnp.ndarray, points: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pinhole projection of camera-space points.

    intr: (..., 3, 3); points: (..., N, 3) -> uv (..., N, 2).
    Matches reference batch_cam_intr_projection (transform.py:914-930)
    including the z-clamping semantics (|z|<eps replaced by +eps).
    """
    proj = jnp.einsum("...ij,...nj->...ni", intr, points, precision="highest")
    xy = proj[..., 0:2]
    z = proj[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, eps, z)
    return xy / z


def persp_project(points: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., 3, 3) -> (..., N, 2); reference transform.py:933-946."""
    proj = jnp.einsum("...ij,...nj->...ni", intr, points, precision="highest")
    return proj[..., :2] / proj[..., 2:3]


def invert_rigid(extr: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a (..., 4, 4) rigid transform.

    Cheaper and better-conditioned than jnp.linalg.inv for SE(3).
    """
    rot = extr[..., :3, :3]
    t = extr[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_new = -jnp.einsum("...ij,...jk->...ik", rot_t, t, precision="highest")
    top = jnp.concatenate([rot_t, t_new], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=extr.dtype), extr.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def project_world_to_pixel(
    points_world: jnp.ndarray, cam_extr_c2m: jnp.ndarray, cam_intr: jnp.ndarray
) -> jnp.ndarray:
    """World(master)-space points -> pixel coords for each view.

    points_world: (B, N, 3) shared per sample; cam_extr_c2m: (B, V, 4, 4)
    camera-to-master transforms (the reference's ``target_cam_extr``);
    cam_intr: (B, V, 3, 3). Returns (B, V, N, 2).

    This is the masked-batched replacement of the reference's
    ``generate_grid_sample_proj`` per-sample loop (lib/utils/collation.py:48-65).
    """
    extr_m2c = invert_rigid(cam_extr_c2m)  # (B, V, 4, 4)
    pts = points_world[:, None]  # (B, 1, N, 3)
    pts_cam = cam_extr_transf(extr_m2c, pts)
    return cam_intr_projection(cam_intr, pts_cam)


def xyz_to_uvd(
    xyz: jnp.ndarray,
    root_joint: jnp.ndarray,
    intr: jnp.ndarray,
    inp_res: Sequence[int],
    depth_range: float = CONST.UVD_DEPTH_RANGE,
    ref_bone_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Perspective xyz -> normalized uvd (reference batch_xyz2uvd, transform.py:733-785)."""
    res = jnp.asarray(inp_res, dtype=xyz.dtype)
    if ref_bone_len is None:
        ref_bone_len = jnp.ones(xyz.shape[:-2] + (1,), dtype=xyz.dtype)
    z = xyz[..., 2]
    xy_ = xyz[..., :2] / z[..., None]
    root_z = root_joint[..., -1:]
    z_ = (z - root_z) / ref_bone_len
    f = jnp.stack([intr[..., 0, 0], intr[..., 1, 1]], axis=-1)[..., None, :]
    c = jnp.stack([intr[..., 0, 2], intr[..., 1, 2]], axis=-1)[..., None, :]
    uv = (xy_ * f + c) / res
    d = z_ / depth_range + 0.5
    return jnp.concatenate([uv, d[..., None]], axis=-1)


def uvd_to_xyz(
    uvd: jnp.ndarray,
    root_joint: jnp.ndarray,
    intr: jnp.ndarray,
    inp_res: Sequence[int],
    depth_range: float = CONST.UVD_DEPTH_RANGE,
    ref_bone_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Normalized uvd -> perspective xyz (reference batch_uvd2xyz, transform.py:788-833)."""
    res = jnp.asarray(inp_res, dtype=uvd.dtype)
    if ref_bone_len is None:
        ref_bone_len = jnp.ones(uvd.shape[:-2] + (1,), dtype=uvd.dtype)
    uv = uvd[..., :2] * res
    d = (uvd[..., 2] - 0.5) * depth_range
    root_z = root_joint[..., -1:]
    z = d * ref_bone_len + root_z
    f = jnp.stack([intr[..., 0, 0], intr[..., 1, 1]], axis=-1)[..., None, :]
    c = jnp.stack([intr[..., 0, 2], intr[..., 1, 2]], axis=-1)[..., None, :]
    xy = (uv - c) / f * z[..., None]
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def mano_to_openpose(j_regressor: jnp.ndarray, mano_verts: jnp.ndarray) -> jnp.ndarray:
    """MANO vertices -> 21 OpenPose-ordered joints.

    j_regressor: (16, 778); mano_verts: (..., 778, 3).
    Reference: lib/utils/transform.py:836-872.
    """
    joints16 = jnp.einsum("jv,...vc->...jc", j_regressor, mano_verts, precision="highest")
    tips_idx = jnp.asarray(
        [v[0] for _, v in sorted(CONST.MANO_KPID_2_VERTICES.items())], dtype=jnp.int32
    )
    tips = mano_verts[..., tips_idx, :]
    joints21 = jnp.concatenate([joints16, tips], axis=-2)
    order = jnp.asarray(CONST.MANO_TO_OPENPOSE, dtype=jnp.int32)
    return joints21[..., order, :]


def ref_bone_len(joints: jnp.ndarray, link=(0, 9)) -> jnp.ndarray:
    """Length of the reference bone (default wrist->middle MCP), (..., 1)."""
    total = jnp.zeros(joints.shape[:-2] + (1,), dtype=joints.dtype)
    for a, b in zip(link[:-1], link[1:]):
        total = total + jnp.linalg.norm(
            joints[..., a, :] - joints[..., b, :], axis=-1, keepdims=True
        )
    return total
