"""Single-view 2D/UVD pose models (auxiliary family).

Parity with the reference IntegralPose / DarkPose models
(lib/models/integal_pose.py:25-371, lib/models/darkpose.py:69-338):
a backbone + deconvolution head producing per-joint heatmaps, decoded
either by integral soft-argmax (IntegralPose; norm 'softmax'/'sigmoid')
or by Gaussian-modulated argmax refinement (DarkPose's DARK decode,
done host-side at eval). Used in the reference to pre-train 2D pose
backbones feeding the multi-view pipeline.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ..geometry.heatmap import integral_heatmap2d, integral_heatmap3d, normalize_heatmap
from ..utils.registry import HEAD, MODEL
from .backbones.resnet import ResNet, make_norm


@HEAD.register_module("IntegralDeconvHead")
class IntegralDeconvHead(nn.Module):
    """Deconv stages + 1x1 conv to (num_joints [* depth]) heatmaps.

    Reference lib/models/integal_pose.py:196-252 (IntegralDeconvHead).
    """

    num_joints: int = 21
    depth_resolution: int = 0  # 0 = 2D head; D>0 = 3D (UVD) head
    num_deconv: int = 3
    deconv_features: int = 256
    norm_type: str = "softmax"  # 'softmax' | 'sigmoid'
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        x = feat
        for i in range(self.num_deconv):
            x = nn.ConvTranspose(
                self.deconv_features, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = make_norm(self.norm, self.deconv_features, self.dtype, name=f"deconv{i}_norm")(x)
            x = nn.relu(x)

        channels = self.num_joints * max(1, self.depth_resolution)
        hm = nn.Conv(channels, (1, 1), dtype=self.dtype, name="final")(x)
        B, H, W, _ = hm.shape
        hm = jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)  # (B, C, H, W)

        if self.depth_resolution:
            hm = hm.reshape(B, self.num_joints, self.depth_resolution, H, W)
            if self.norm_type == "softmax":
                flat = hm.reshape(B, self.num_joints, -1)
                flat = nn.softmax(flat, axis=-1)
                hm = flat.reshape(B, self.num_joints, self.depth_resolution, H, W)
            else:
                hm = normalize_heatmap(nn.sigmoid(hm))
            uvd = integral_heatmap3d(hm)
            return {"uvd": uvd, "heatmap": hm}

        if self.norm_type == "softmax":
            flat = hm.reshape(B, self.num_joints, -1)
            flat = nn.softmax(flat, axis=-1)
            hm = flat.reshape(B, self.num_joints, H, W)
        else:
            hm = normalize_heatmap(nn.sigmoid(hm))
        uv = integral_heatmap2d(hm)
        return {"uv": uv, "heatmap": hm}


class IntegralPose(nn.Module):
    """backbone -> IntegralDeconvHead (reference integal_pose.py:25-120)."""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        feats = self.backbone(image)
        top = feats["res_layer4"] if isinstance(feats, dict) else feats[-1]
        return self.head(top)


class DarkPose(nn.Module):
    """Deconv heatmap model with MSE supervision (reference darkpose.py:69-338).

    The DARK sub-pixel decode is a host-side post-process
    (:func:`dark_decode`); the on-device part is heatmap regression.
    """

    backbone: nn.Module
    num_joints: int = 21
    num_deconv: int = 3
    deconv_features: int = 256
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        feats = self.backbone(image)
        x = feats["res_layer4"] if isinstance(feats, dict) else feats[-1]
        for i in range(self.num_deconv):
            x = nn.ConvTranspose(
                self.deconv_features, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = make_norm(self.norm, self.deconv_features, self.dtype, name=f"deconv{i}_norm")(x)
            x = nn.relu(x)
        hm = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype, name="final")(x)
        return {"heatmap": jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)}


def joints_mse_loss(pred_hm: jnp.ndarray, gt_hm: jnp.ndarray, joints_vis=None) -> jnp.ndarray:
    """Per-joint heatmap MSE (reference darkpose.py JointsMSELoss)."""
    err = (pred_hm - gt_hm) ** 2
    if joints_vis is not None:
        err = err * joints_vis[..., None, None]
    return 0.5 * jnp.mean(err)


def dark_decode(heatmap, kernel: int = 11):
    """DARK distribution-aware sub-pixel decode (host-side, numpy).

    Zhang et al., "Distribution-Aware Coordinate Representation for Human
    Pose Estimation" (CVPR 2020) — Taylor expansion around the argmax of
    the Gaussian-smoothed log-heatmap.
    """
    import numpy as np

    try:
        import cv2
    except Exception:
        cv2 = None

    hm = np.asarray(heatmap, dtype=np.float64)  # (B, J, H, W)
    B, J, H, W = hm.shape
    coords = np.zeros((B, J, 2))
    for b in range(B):
        for j in range(J):
            m = hm[b, j]
            if cv2 is not None:
                m = cv2.GaussianBlur(m, (kernel, kernel), 0)
            m = np.maximum(m, 1e-10)
            logm = np.log(m)
            idx = np.unravel_index(np.argmax(m), m.shape)
            y, x = int(idx[0]), int(idx[1])
            coords[b, j] = (x, y)
            if 1 <= x < W - 2 and 1 <= y < H - 2:
                dx = 0.5 * (logm[y, x + 1] - logm[y, x - 1])
                dy = 0.5 * (logm[y + 1, x] - logm[y - 1, x])
                dxx = logm[y, x + 1] - 2 * logm[y, x] + logm[y, x - 1]
                dyy = logm[y + 1, x] - 2 * logm[y, x] + logm[y - 1, x]
                dxy = 0.25 * (
                    logm[y + 1, x + 1] - logm[y + 1, x - 1] - logm[y - 1, x + 1] + logm[y - 1, x - 1]
                )
                hess = np.array([[dxx, dxy], [dxy, dyy]])
                if abs(np.linalg.det(hess)) > 1e-10:
                    offset = -np.linalg.inv(hess) @ np.array([dx, dy])
                    offset = np.clip(offset, -1.0, 1.0)
                    coords[b, j] += offset  # (x, y) order
    return coords


def create_integral_pose(cfg, dtype=jnp.float32):
    bb = ResNet.from_config(cfg.BACKBONE, dtype=dtype)
    head_cfg = cfg.HEAD
    head = IntegralDeconvHead(
        num_joints=head_cfg.get("NCLASSES", 21),
        depth_resolution=head_cfg.get("DEPTH_RESOLUTION", 0),
        num_deconv=head_cfg.get("NUM_DECONV", 3),
        deconv_features=head_cfg.get("DECONV_FEATURES", 256),
        norm_type=head_cfg.get("NORM_TYPE", "softmax"),
        dtype=dtype,
    )
    return IntegralPose(backbone=bb, head=head)


MODEL.register_module("IntegralPose", module=create_integral_pose)


def create_darkpose(cfg, dtype=jnp.float32):
    bb = ResNet.from_config(cfg.BACKBONE, dtype=dtype)
    return DarkPose(
        backbone=bb,
        num_joints=cfg.get("NCLASSES", 21) if hasattr(cfg, "get") else 21,
        dtype=dtype,
    )


MODEL.register_module("DarkPose_ResNet", module=create_darkpose)
