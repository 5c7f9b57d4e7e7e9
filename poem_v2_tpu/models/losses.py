"""POEM loss stack as pure functions.

Parity with reference ``compute_loss`` (lib/models/POEM.py:363-466):
heatmap-2D joint loss (x10), 3D joints L2 (+ joints-from-mesh via the
MANO J-regressor), 3D verts L1, clamped multi-camera 2D reprojection
loss, optional MANO pose/shape MSE. The ragged per-sample projection
loops (POEM.py:336-361,389-400) become masked batched projections; a
masked mean reproduces the reference's mean over the ragged (ΣN, 21)
concatenation exactly (every valid view counts equally).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp

from ..geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid, mano_to_openpose


def masked_view_mean(x: jnp.ndarray, view_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x (B, V, ...) over valid views and all trailing dims."""
    mask = view_mask.astype(x.dtype)
    extra = x.ndim - 2
    m = mask.reshape(mask.shape + (1,) * extra)
    total = jnp.sum(x * m)
    denom = jnp.sum(mask) * math.prod(x.shape[2:]) if extra else jnp.sum(mask)
    return total / jnp.maximum(denom, 1.0)


def reprojection_loss(
    pred_points: jnp.ndarray,  # (B, N, 3) master-space
    cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->master
    cam_intr: jnp.ndarray,  # (B, V, 3, 3)
    gt_2d: jnp.ndarray,  # (B, V, N, 2)
    view_mask: jnp.ndarray,  # (B, V)
    img_scale: float,
) -> jnp.ndarray:
    """Clamped, diagonal-normalized multi-camera 2D loss (POEM.py:335-361)."""
    extr_m2c = invert_rigid(cam_extr)
    pts_cam = cam_extr_transf(extr_m2c, pred_points[:, None])
    pred_2d = cam_intr_projection(cam_intr, pts_cam)  # (B, V, N, 2)
    offset = jnp.clip(pred_2d - gt_2d, -0.5 * img_scale, 0.5 * img_scale) / img_scale
    per_point = jnp.sum(offset**2, axis=-1)  # (B, V, N)
    return masked_view_mean(per_point, view_mask)


def poem_loss(
    preds: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    j_regressor: jnp.ndarray,  # (16, 778)
    loss_cfg,
    num_joints: int = 21,
    transformer_center_idx: int = 9,
    parametric: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + per-term dict. ``loss_cfg`` follows the reference YAML."""
    all_coords = preds["all_coords_preds"]  # (n_blocks, B, 799, 3)
    view_mask = batch["view_mask"]
    img = batch["image"]
    H, W = img.shape[2], img.shape[3]
    img_scale = math.sqrt(float(W**2 + H**2))

    gt_joints = batch["master_joints_3d"]  # (B, 21, 3)
    gt_verts = batch["master_verts_3d"]  # (B, 778, 3)
    gt_2d = batch["target_joints_2d"]  # (B, V, 21, 2)

    joints_l2 = loss_cfg.get("JOINTS_LOSS_TYPE", "l2") == "l2"
    verts_l2 = loss_cfg.get("VERTICES_LOSS_TYPE", "l1") == "l2"

    def recon(pred, gt, use_l2):
        d = pred - gt
        return jnp.mean(d**2) if use_l2 else jnp.mean(jnp.abs(d))

    loss_dict: Dict[str, jnp.ndarray] = {}
    loss = jnp.asarray(0.0, dtype=jnp.float32)

    # heatmap 2D joints loss (POEM.py:377-381)
    hm_off = (preds["pred_joints_uv"] - gt_2d) / img_scale
    loss_hm = masked_view_mean(jnp.sum(hm_off**2, axis=-1), view_mask)
    loss_dict["loss_heatmap_joints"] = loss_hm
    loss = loss + loss_cfg.get("HEATMAP_JOINTS_WEIGHT", 10.0) * loss_hm

    pred_joints = all_coords[-1, :, :num_joints]
    pred_verts = all_coords[-1, :, num_joints:]
    pred_joints_from_mesh = mano_to_openpose(j_regressor, pred_verts)
    gt_joints_from_mesh = mano_to_openpose(j_regressor, gt_verts)

    loss_3d_joints = recon(pred_joints, gt_joints, joints_l2)
    loss_3d_joints_from_mesh = recon(pred_joints_from_mesh, gt_joints_from_mesh, joints_l2)
    loss_recon = loss_cfg.get("JOINTS_LOSS_WEIGHT", 1.0) * (
        loss_3d_joints + loss_3d_joints_from_mesh
    )

    if parametric:
        # parametric output is root-relative at joint 9 (POEM.py:408-416)
        centre = gt_joints[:, transformer_center_idx][:, None]
        loss_3d_verts = recon(pred_verts - centre, gt_verts - centre, verts_l2)
    else:
        loss_3d_verts = recon(pred_verts, gt_verts, verts_l2)
    loss_recon = loss_recon + loss_cfg.get("VERTICES_LOSS_WEIGHT", 1.0) * loss_3d_verts

    w2d = loss_cfg.get("JOINTS_2D_LOSS_WEIGHT", 1.0)
    if w2d != 0:
        loss_2d = reprojection_loss(
            pred_joints, batch["cam_extr"], batch["cam_intr"], gt_2d, view_mask, img_scale
        )
        loss_recon = loss_recon + w2d * loss_2d
        loss_dict["loss_2d_joints"] = loss_2d

    w2dv = loss_cfg.get("VERTICES_2D_LOSS_WEIGHT", 0.0)
    if w2dv != 0:
        # project GT verts per view as targets (POEM.py:389-400)
        extr_m2c = invert_rigid(batch["cam_extr"])
        gt_v_cam = cam_extr_transf(extr_m2c, gt_verts[:, None])
        gt_v2d = cam_intr_projection(batch["cam_intr"], gt_v_cam)
        loss_2d_verts = reprojection_loss(
            pred_verts, batch["cam_extr"], batch["cam_intr"], gt_v2d, view_mask, img_scale
        )
        loss_recon = loss_recon + w2dv * loss_2d_verts
        loss_dict["loss_2d_verts"] = loss_2d_verts

    if parametric and "pred_pose" in preds:
        loss_pose = jnp.mean((preds["pred_pose"] - batch["mano_pose"]) ** 2)
        loss_shape = jnp.mean((preds["pred_shape"] - batch["mano_shape"]) ** 2)
        loss_recon = (
            loss_recon
            + loss_cfg.get("POSE_LOSS_WEIGHT", 0.001) * loss_pose
            + loss_cfg.get("SHAPE_LOSS_WEIGHT", 0.0005) * loss_shape
        )
        loss_dict["loss_pose"] = loss_pose
        loss_dict["loss_shape"] = loss_shape

    loss = loss + loss_recon
    loss_dict["loss_3d_joints"] = loss_3d_joints
    loss_dict["loss_3d_joints_from_mesh"] = loss_3d_joints_from_mesh
    loss_dict["loss_3d_verts"] = loss_3d_verts
    loss_dict["loss_recon"] = loss_recon
    loss_dict["loss"] = loss
    return loss, loss_dict
