"""Feature-pyramid necks (flax, NHWC).

Parity with the reference's feat_decode / uv_decode FPN-ish paths
(lib/models/POEM.py:59-112,167-222): progressive 2x bilinear upsampling
with skip concatenation and 3x3 ConvBlocks, then a max-pool and a 1x1
projection. Bilinear resize uses half-pixel centres, matching torch
``F.interpolate(align_corners=False)``.
"""

from __future__ import annotations

import functools

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .backbones.resnet import make_norm


class ConvBlock(nn.Module):
    """Conv + optional norm + optional ReLU (reference lib/models/bricks/conv.py:4-44)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: str = "gn"
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        # reference ConvBlock keeps the conv bias even under BN
        # (bricks/conv.py:18-25 uses nn.Conv2d defaults)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            (self.strides, self.strides),
            padding=pad,
            dtype=self.dtype,
        )(x)
        if self.norm != "none":
            x = make_norm(self.norm, self.features, self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


@functools.lru_cache(maxsize=16)
def _interp_matrix_2x(n: int) -> np.ndarray:
    """(2n, n) bilinear 2x interpolation matrix (half-pixel, edge-clamped).

    Exactly reproduces torch ``F.interpolate(align_corners=False)`` /
    ``jax.image.resize('bilinear')`` for scale 2: output 2k blends
    (0.25, 0.75) of inputs (k-1, k); output 2k+1 blends (0.75, 0.25) of
    inputs (k, k+1); borders clamp.
    """
    m = np.zeros((2 * n, n), dtype=np.float32)
    for k in range(n):
        m[2 * k, max(k - 1, 0)] += 0.25
        m[2 * k, k] += 0.75
        m[2 * k + 1, k] += 0.75
        m[2 * k + 1, min(k + 1, n - 1)] += 0.25
    return m


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample as two static interpolation-matrix
    contractions — rides the MXU instead of ``jax.image.resize``'s
    gather (same trick as ops/sampling.py grid_sample_points_matmul)."""
    b, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix_2x(h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_2x(w), dtype=x.dtype)
    x = jnp.einsum("Hh,bhwc->bHwc", mh, x)
    return jnp.einsum("Ww,bHwc->bHWc", mw, x)


def maxpool2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), (2, 2))


class ResNetFeatNeck(nn.Module):
    """feat_decode for ResNet backbones (reference POEM.py:59-86,167-181).

    4-scale pyramid -> (BN, 32, 32, feat_size[2]) e.g. 128 for resnet34.
    """

    feat_size: Tuple[int, int, int, int]  # e.g. (512, 256, 128, 64)
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        rev = list(reversed(feats))
        x = rev[0]
        for i in range(3):
            x = upsample2x(x)
            x = jnp.concatenate([x, rev[i + 1]], axis=-1)
            x = ConvBlock(self.feat_size[i + 1], 3, norm=self.norm, dtype=self.dtype)(x)
        x = maxpool2x(x)
        x = ConvBlock(self.feat_size[2], 1, norm="none", relu=False, dtype=self.dtype, name="feat_in")(x)
        return x


class HRNetFeatNeck(nn.Module):
    """feat_decode for HRNet (reference POEM.py:87-99,183-193).

    Downsample the high-res branch by strided convs, adding the lower
    scales residually, then upsample to 16x16 and project to feat_size[2].
    """

    feat_size: Tuple[int, int, int, int]  # (40, 80, 160, 320)
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        x = feats[0]
        for i in range(3):
            interm = ConvBlock(
                self.feat_size[i + 1], 3, strides=2, norm=self.norm, dtype=self.dtype
            )(x)
            x = interm + feats[i + 1]
        x = upsample2x(x)  # (BN, 16, 16, 320)
        x = ConvBlock(self.feat_size[2], 1, norm="none", relu=False, dtype=self.dtype, name="feat_in")(x)
        return x


class UVDecodeNeck(nn.Module):
    """uv_decode heatmap branch (reference POEM.py:76-86,100-112,197-209).

    Returns (uv_hmap (BN, 32, 32, 21), uv_feat) — sigmoid heatmaps.
    """

    feat_size: Tuple[int, int, int, int]
    num_joints: int = 21
    hrnet: bool = False
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        rev = list(reversed(feats))
        x = rev[0]
        if self.hrnet:
            out_channels = [self.feat_size[2], self.feat_size[1], self.feat_size[0]]
        else:
            out_channels = [self.feat_size[1], self.feat_size[2], self.feat_size[3]]
        for i in range(3):
            x = upsample2x(x)
            x = jnp.concatenate([x, rev[i + 1]], axis=-1)
            x = ConvBlock(out_channels[i], 3, norm=self.norm, dtype=self.dtype)(x)
        x = maxpool2x(x)  # (BN, 32, 32, C)
        hmap = ConvBlock(
            self.num_joints, 1, norm="none", relu=False, dtype=self.dtype, name="uv_out"
        )(x)
        hmap = nn.sigmoid(hmap)
        uv_feat = ConvBlock(
            self.feat_size[2] if not self.hrnet else self.feat_size[1],
            1,
            norm=self.norm,
            dtype=self.dtype,
            name="uv_in",
        )(hmap)
        return hmap, uv_feat
