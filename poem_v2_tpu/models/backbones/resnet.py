"""ResNet backbones (flax, NHWC).

Capability parity with the reference ResNet feature extractor
(lib/models/backbones/resnet.py:147-373: resnet18/34/50, 4-stage
pyramid + pooled global feature, FrozenBatchNorm2d). TPU-native
choices: channels-last layout, norm selectable between

* ``frozen_bn`` — affine-only normalisation with stored statistics, the
  reference's FrozenBatchNorm2d (resnet.py:31-76), right when loading
  converted torch checkpoints;
* ``gn`` — GroupNorm(32), the from-scratch default on TPU: no
  cross-replica stats sync on the data mesh, fully deterministic;
* ``bn`` — standard BatchNorm with a ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import BACKBONE


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics: y = (x - mean) / sqrt(var + eps) * w + b.

    Statistics and affine parameters live in the ``params`` collection
    but receive zero gradient in practice by initialisation + optimizer
    masking; equivalent to reference FrozenBatchNorm2d (resnet.py:31-76).
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        w = scale / jnp.sqrt(var + self.eps)
        return (x.astype(self.dtype) - mean.astype(self.dtype)) * w.astype(self.dtype) + bias.astype(self.dtype)


def make_norm(norm: str, features: int, dtype=jnp.float32, name=None):
    if norm == "gn":
        if features % 32 == 0:
            groups = 32
        else:
            # largest group count <= 8 that divides the channel width
            # (param shapes are per-channel, so the choice is ckpt-safe)
            groups = next(g for g in (8, 4, 2, 1) if features % g == 0)
        return nn.GroupNorm(num_groups=groups, dtype=dtype, name=name)
    if norm == "frozen_bn":
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    if norm == "bn":
        return nn.BatchNorm(use_running_average=True, dtype=dtype, name=name)
    raise ValueError(f"unknown norm {norm!r}")


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, dtype=self.dtype)(x)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype
            )(x)
            residual = make_norm(self.norm, self.features, self.dtype)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out_feat = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_feat, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, out_feat, self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_feat, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype)(x)
            residual = make_norm(self.norm, out_feat, self.dtype)(residual)
        return nn.relu(y + residual)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


@BACKBONE.register_module("ResNet")
class ResNet(nn.Module):
    """4-stage feature pyramid + pooled global vector.

    Input (B, H, W, 3) -> dict with res_layer1..4 (strides 4/8/16/32)
    and res_layer4_mean (B, C4) — the same surface the reference models
    consume (resnet.py:206-242).
    """

    arch: str = "resnet34"
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        arch = cfg.TYPE.lower() if cfg.TYPE.lower().startswith("resnet") else "resnet34"
        norm = "frozen_bn" if cfg.get("FREEZE_BATCHNORM", False) else cfg.get("NORM", "gn")
        return cls(arch=arch, norm=norm, dtype=dtype)

    @property
    def name(self) -> str:
        return self.arch

    @property
    def feat_size(self) -> Tuple[int, int, int, int]:
        if self.arch == "resnet50":
            return (2048, 1024, 512, 256)
        return (512, 256, 128, 64)

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        block_cls, layers = _SPECS[self.arch]
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype, name="stem_conv")(image)
        x = make_norm(self.norm, 64, self.dtype, name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        widths = (64, 128, 256, 512)
        for i, (width, n_blocks) in enumerate(zip(widths, layers)):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                x = block_cls(
                    width, strides=strides, norm=self.norm, dtype=self.dtype, name=f"layer{i + 1}_block{b}"
                )(x)
            feats[f"res_layer{i + 1}"] = x
        feats["res_layer4_mean"] = jnp.mean(feats["res_layer4"], axis=(1, 2))
        return feats
