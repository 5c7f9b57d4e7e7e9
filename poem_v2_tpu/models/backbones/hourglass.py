"""Hourglass backbone (legacy aux models).

Capability parity with the reference ``HourglassBisected``
(lib/models/backbones/hourglass.py:51-111): a recursive encoder-decoder
with residual blocks whose decoder is bisected into two parallel output
branches (the reference feeds 2D heatmap + mask heads). Compact flax
re-implementation: static recursion depth, bilinear up, channels-last.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONE
from .resnet import make_norm


class ResidualBlock(nn.Module):
    features: int
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        y = make_norm(self.norm, x.shape[-1], self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, mid, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, mid, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return x + y


class _HGDown(nn.Module):
    """Recursive hourglass with two parallel decoder branches."""

    features: int
    depth: int
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        up1a = ResidualBlock(self.features, self.norm, self.dtype, name="skip_a")(x)
        up1b = ResidualBlock(self.features, self.norm, self.dtype, name="skip_b")(x)

        low = nn.max_pool(x, (2, 2), (2, 2))
        low = ResidualBlock(self.features, self.norm, self.dtype, name="down")(low)
        if self.depth > 1:
            low_a, low_b = _HGDown(
                self.features, self.depth - 1, self.norm, self.dtype, name="inner"
            )(low)
        else:
            mid = ResidualBlock(self.features, self.norm, self.dtype, name="bottom")(low)
            low_a = low_b = mid
        low_a = ResidualBlock(self.features, self.norm, self.dtype, name="up_a")(low_a)
        low_b = ResidualBlock(self.features, self.norm, self.dtype, name="up_b")(low_b)

        def up2x(z):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, 2 * h, 2 * w, c), method="bilinear")

        return up1a + up2x(low_a), up1b + up2x(low_b)


@BACKBONE.register_module("HourglassBisected")
class HourglassBisected(nn.Module):
    features: int = 256
    depth: int = 4
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(
            features=cfg.get("FEATURES", 256),
            depth=cfg.get("DEPTH", 4),
            norm=cfg.get("NORM", "gn"),
            dtype=dtype,
        )

    @property
    def name(self) -> str:
        return "HourglassBisected"

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, H, W, 3) -> two (B, H/4, W/4, features) branch outputs."""
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype)(image)
        x = make_norm(self.norm, 64, self.dtype)(x)
        x = nn.relu(x)
        x = ResidualBlock(128, self.norm, self.dtype)(x)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = ResidualBlock(self.features, self.norm, self.dtype)(x)
        return _HGDown(self.features, self.depth, self.norm, self.dtype, name="hg")(x)
