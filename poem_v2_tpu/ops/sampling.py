"""Bilinear point sampling from feature maps.

TPU-native replacement of ``F.grid_sample`` as the reference uses it to
pull per-view features at projected BPS points
(lib/models/heads/ptEmb_head.py:900-901: bilinear,
``align_corners=False``, zero padding, grid of isolated points).

Layout is NHWC (channels-last) — the natural TPU layout — and the grid
is a flat point list (B, N, 2) rather than torch's (B, H_out, W_out, 2).
The gather decomposes into 4 ``take_along_axis`` ops over a flattened
H*W axis; XLA fuses the address computation and the lerp into one pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_points(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (B, H, W, C) at normalized ``coords`` (B, N, 2).

    coords[..., 0] is x in [-1, 1] over width, coords[..., 1] is y over
    height (torch grid_sample convention, align_corners=False). Points
    outside the image contribute zeros.

    Returns (B, N, C).
    """
    B, H, W, C = feat.shape
    x = coords[..., 0]
    y = coords[..., 1]
    # align_corners=False: ix = ((x + 1) * W - 1) / 2
    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0

    def gather(px, py):
        inside = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        xi = jnp.clip(px, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(py, 0, H - 1).astype(jnp.int32)
        flat = feat.reshape(B, H * W, C)
        idx = yi * W + xi  # (B, N)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)
        return vals * inside[..., None].astype(feat.dtype)

    v00 = gather(ix0, iy0)
    v01 = gather(ix0 + 1, iy0)
    v10 = gather(ix0, iy0 + 1)
    v11 = gather(ix0 + 1, iy0 + 1)

    fx = fx[..., None].astype(feat.dtype)
    fy = fy[..., None].astype(feat.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bottom = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bottom * fy


def grid_sample_points_matmul(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling as one MXU matmul (same contract as
    :func:`grid_sample_points`).

    Builds the (N, H*W) bilinear interpolation matrix from broadcasted
    index comparisons and contracts it with the flattened feature map —
    the classic TPU trade of an irregular gather for a dense matmul.
    At POEM sizes (4096 points x 1024 cells x 256 ch) this is ~2 GFLOP
    per image of pure MXU work and beats the 4-tap dynamic gather by a
    large factor.
    """
    B, H, W, C = feat.shape
    N = coords.shape[1]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0

    cols_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H * W), 2) % W
    cols_y = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H * W), 2) // W

    # build the interpolation matrix directly in the feature dtype: the
    # (B, N, H*W) accumulator is the dominant HBM traffic of this op
    # (bf16 halves it on the TPU path; tap weights are exact in bf16 to
    # ~3 decimal digits, inside the bilinear model error)
    wdt = feat.dtype
    weight = jnp.zeros((B, N, H * W), dtype=wdt)
    for dx, wx in ((0, 1.0 - fx), (1, fx)):
        px = ix0 + dx
        in_x = (px >= 0) & (px <= W - 1)
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            py = iy0 + dy
            in_y = (py >= 0) & (py <= H - 1)
            match = (cols_x == px[..., None].astype(jnp.int32)) & (
                cols_y == py[..., None].astype(jnp.int32)
            )
            w = (wx * wy * (in_x & in_y)).astype(wdt)
            weight = weight + match.astype(wdt) * w[..., None]

    flat = feat.reshape(B, H * W, C)
    out = jnp.einsum("bnm,bmc->bnc", weight, flat)
    return out


def pixel_to_grid(uv: jnp.ndarray, inp_res) -> jnp.ndarray:
    """Pixel coords (..., 2) -> [-1, 1] grid coords.

    Matches the reference's normalisation before grid_sample
    (ptEmb_head.py:881-883: uv / inp_res * 2 - 1).
    """
    res = jnp.asarray(inp_res, dtype=uv.dtype)
    return uv / res * 2.0 - 1.0
