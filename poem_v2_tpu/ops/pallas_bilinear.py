"""Fused bilinear point-sampling kernel (Pallas TPU).

``grid_sample_points_matmul`` (ops/sampling.py) trades the irregular
4-tap gather for one dense matmul, but materializes the (B, N, H*W)
interpolation-weight tensor in HBM (~0.5 GB of traffic at POEM sizes)
and spends a full VPU pass building it from 4 taps x 2 comparisons over
every (point, cell) pair — ~7 ms of the flagship forward together with
the projection math around it.

This kernel never materializes the weights off-chip AND builds them
separably: bilinear weights factor into an outer product of per-axis
2-tap vectors,

  w[n, (y, x)] = wy[n, y] * wx[n, x]

so each (BLOCK_N, H*W) weight tile is two tiny (BLOCK_N, W) tap vectors
(a handful of comparisons over W columns instead of H*W) expanded
through CONSTANT one-hot matrices E_y/E_x on the MXU:

  weight = (wy @ E_y) * (wx @ E_x)          # (BLOCK_N, H*W)
  out    = weight @ feat                    # (BLOCK_N, C) MXU

Semantics match torch F.grid_sample(bilinear, align_corners=False,
padding_mode='zeros') on isolated points (reference
lib/models/heads/ptEmb_head.py:894-903), with the grid kept in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_tap_weights(pos, size: int):
    """(BN,) f32 positions -> (BN, size) 2-tap weight vectors.

    tap 0 at floor(pos) with weight (1-frac), tap 1 at floor(pos)+1 with
    weight frac; out-of-range taps contribute zero (zeros padding).
    """
    f32 = jnp.float32
    p0 = jnp.floor(pos)
    frac = (pos - p0)[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], size), 1)
    p0i = p0[:, None]
    w = jnp.zeros((pos.shape[0], size), f32)
    for d, wt in ((0, 1.0 - frac), (1, frac)):
        pd = p0i + d
        hit = cols == pd.astype(jnp.int32)
        ok = (pd >= 0) & (pd <= size - 1)
        w = w + hit.astype(f32) * (wt * ok.astype(f32))
    return w


def _kernel(coords_ref, feat_ref, ey_ref, ex_ref, out_ref, *, H: int, W: int):
    # coords_ref: (1, BN, 2) f32; feat_ref: (1, HW, C);
    # ey_ref: (H, HW), ex_ref: (W, HW) constant one-hot expansions
    f32 = jnp.float32
    x = coords_ref[0, :, 0].astype(f32)
    y = coords_ref[0, :, 1].astype(f32)
    # align_corners=False: ix = ((x + 1) * W - 1) / 2
    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5

    wx = _axis_tap_weights(ix, W)  # (BN, W)
    wy = _axis_tap_weights(iy, H)  # (BN, H)

    # bf16 expansions: the one-hot operand is exact and the tap operand
    # only loses the same final-cast bits the XLA matmul path loses when
    # it casts its f32-built weights to the feature dtype. f32 dots here
    # would run the MXU's multi-pass f32 emulation and dominate the kernel.
    cdt = jnp.bfloat16
    wyx = jax.lax.dot_general(
        wy.astype(cdt), ey_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    wxx = jax.lax.dot_general(
        wx.astype(cdt), ex_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    weight = (wyx * wxx).astype(feat_ref.dtype)  # (BN, HW)

    out_ref[0] = jax.lax.dot_general(
        weight, feat_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def grid_sample_points_fused(
    feat: jnp.ndarray,    # (B, H, W, C)
    coords: jnp.ndarray,  # (B, N, 2) in [-1, 1], torch grid convention
    block_n: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for :func:`grid_sample_points_matmul`. (B, N, C)."""
    B, H, W, C = feat.shape
    N = coords.shape[1]
    n_pad = (-N) % block_n
    if n_pad:
        # pad with off-image points -> zero weights -> zero rows (sliced off)
        coords = jnp.pad(coords, ((0, 0), (0, n_pad), (0, 0)), constant_values=-2.0)
    Np = N + n_pad

    # constant expansion matrices: E_y[y, y*W+x] = 1, E_x[x, y*W+x] = 1
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ey = (np.arange(H)[:, None] == yy.reshape(-1)[None, :]).astype(np.float32)
    ex = (np.arange(W)[:, None] == xx.reshape(-1)[None, :]).astype(np.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        grid=(B, Np // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, 2), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H * W), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, H * W), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, C), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), feat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(coords.astype(jnp.float32), feat.reshape(B, H * W, C),
      jnp.asarray(ey), jnp.asarray(ex))
    return out[:, :N]
