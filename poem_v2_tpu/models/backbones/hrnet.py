"""HRNet backbone (flax, NHWC).

Capability parity with the reference HRNet-W40/W64 classification-style
feature extractor (lib/models/backbones/hrnet.py:108-465; stage spec
from config/backbone/cls_hrnet_w40_*.yaml): stem (stride 4), a
bottleneck stage, then 3 multi-resolution stages with NUM_MODULES
(1, 4, 3) exchange modules over branch widths (w, 2w, 4w, 8w) and SUM
fusion. Returns the 4-scale pyramid [(BN,64,64,w) ... (BN,8,8,8w)].

TPU-native notes: channels-last; all exchange-unit up/down paths are
static convs + bilinear resizes, so one jit traces the whole graph; norm
is selectable (gn default for from-scratch, frozen_bn for converted
torch checkpoints) like the ResNet backbone.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONE
from .resnet import BasicBlock, Bottleneck, make_norm


def _upsample_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Integer-factor nearest upsample as broadcast+reshape (free on TPU).

    Matches the reference fuse layers exactly: nn.Upsample(mode='nearest')
    (reference hrnet.py:191) — NOT bilinear.
    """
    b, h0, w0, c = x.shape
    sh, sw = h // h0, w // w0
    assert sh * h0 == h and sw * w0 == w, f"non-integer upsample {h0}x{w0}->{h}x{w}"
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h0, sh, w0, sw, c))
    return x.reshape(b, h, w, c)


class FuseLayer(nn.Module):
    """Multi-resolution SUM fusion: every branch receives every other."""

    channels: Tuple[int, ...]
    norm: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> Sequence[jnp.ndarray]:
        n = len(self.channels)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:
                    # upsample: 1x1 conv to target channels + bilinear resize
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False, dtype=self.dtype,
                                name=f"up_{j}_to_{i}_conv")(y)
                    y = make_norm(self.norm, self.channels[i], self.dtype, name=f"up_{j}_to_{i}_norm")(y)
                    y = _upsample_nearest(y, xs[i].shape[1], xs[i].shape[2])
                elif j < i:
                    # downsample: chain of stride-2 3x3 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype,
                                    name=f"down_{j}_to_{i}_conv{k}")(y)
                        y = make_norm(self.norm, ch, self.dtype, name=f"down_{j}_to_{i}_norm{k}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    """One exchange module: per-branch basic blocks + fusion."""

    channels: Tuple[int, ...]
    num_blocks: int
    norm: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> Sequence[jnp.ndarray]:
        ys = []
        for i, ch in enumerate(self.channels):
            y = xs[i]
            for b in range(self.num_blocks):
                y = BasicBlock(ch, norm=self.norm, dtype=self.dtype, name=f"branch{i}_block{b}")(y)
            ys.append(y)
        if len(self.channels) == 1:
            return ys
        return FuseLayer(self.channels, self.norm, dtype=self.dtype, name="fuse")(ys)


@BACKBONE.register_module("HRNet")
class HRNet(nn.Module):
    """HRNet-W{width}; returns the 4-branch pyramid list."""

    width: int = 40
    norm: str = "gn"
    dtype: jnp.dtype = jnp.float32
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    stage_blocks: int = 4

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        width = cfg.get("WIDTH", 40)
        norm = "frozen_bn" if cfg.get("FREEZE_BATCHNORM", False) else cfg.get("NORM", "gn")
        return cls(width=width, norm=norm, dtype=dtype)

    @property
    def name(self) -> str:
        return "HRNet"

    @property
    def stage4_channels(self) -> Tuple[int, int, int, int]:
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Sequence[jnp.ndarray]:
        w = self.width
        chans = self.stage4_channels

        # stem: /4 resolution
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="stem1")(image)
        x = make_norm(self.norm, 64, self.dtype, name="stem1_norm")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="stem2")(x)
        x = make_norm(self.norm, 64, self.dtype, name="stem2_norm")(x)
        x = nn.relu(x)

        # stage 1: 4 bottlenecks at width 64 (output 256 channels)
        for b in range(4):
            x = Bottleneck(64, norm=self.norm, dtype=self.dtype, name=f"layer1_block{b}")(x)

        # transition 1 -> 2 branches
        xs = [
            nn.relu(make_norm(self.norm, chans[0], self.dtype, name="t1_b0_norm")(
                nn.Conv(chans[0], (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="t1_b0")(x)
            )),
            nn.relu(make_norm(self.norm, chans[1], self.dtype, name="t1_b1_norm")(
                nn.Conv(chans[1], (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="t1_b1")(x)
            )),
        ]

        # stage 2
        for m in range(self.stage_modules[0]):
            xs = HRModule(chans[:2], self.stage_blocks, self.norm, dtype=self.dtype, name=f"stage2_m{m}")(xs)

        # transition 2 -> 3 branches (new branch from the lowest resolution)
        xs = xs + [
            nn.relu(make_norm(self.norm, chans[2], self.dtype, name="t2_b2_norm")(
                nn.Conv(chans[2], (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="t2_b2")(xs[-1])
            ))
        ]
        for m in range(self.stage_modules[1]):
            xs = HRModule(chans[:3], self.stage_blocks, self.norm, dtype=self.dtype, name=f"stage3_m{m}")(xs)

        # transition 3 -> 4 branches
        xs = xs + [
            nn.relu(make_norm(self.norm, chans[3], self.dtype, name="t3_b3_norm")(
                nn.Conv(chans[3], (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="t3_b3")(xs[-1])
            ))
        ]
        for m in range(self.stage_modules[2]):
            xs = HRModule(chans, self.stage_blocks, self.norm, dtype=self.dtype, name=f"stage4_m{m}")(xs)

        return xs
