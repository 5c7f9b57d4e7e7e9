"""Heatmap utilities: soft-argmax integral decoding + Gaussian targets.

Parity with the reference integral pose ops
(lib/models/integal_pose.py:196-252 integral_heatmap2d/3d) and Gaussian
target generation (lib/utils/heatmap.py:57-95), expressed as pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def integral_heatmap2d(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax over a normalized 2D heatmap.

    heatmap: (..., C, H, W), rows should sum to ~1.
    Returns uv in [0, 1): (..., C, 2) where u indexes width.
    Integral Human Pose Regression (Sun et al., ECCV 2018).
    """
    h = heatmap.shape[-2]
    w = heatmap.shape[-1]
    v_accu = jnp.sum(heatmap, axis=-1)  # (..., C, H)
    u_accu = jnp.sum(heatmap, axis=-2)  # (..., C, W)
    weight_v = jnp.arange(h, dtype=heatmap.dtype) / h
    weight_u = jnp.arange(w, dtype=heatmap.dtype) / w
    v = jnp.sum(v_accu * weight_v, axis=-1)
    u = jnp.sum(u_accu * weight_u, axis=-1)
    return jnp.stack([u, v], axis=-1)


def integral_heatmap3d(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax over (..., C, D, H, W) -> uvd (..., C, 3) in [0, 1)."""
    d_sz, h_sz, w_sz = heatmap.shape[-3:]
    d_accu = jnp.sum(heatmap, axis=(-2, -1))
    v_accu = jnp.sum(heatmap, axis=(-3, -1))
    u_accu = jnp.sum(heatmap, axis=(-3, -2))
    d = jnp.sum(d_accu * (jnp.arange(d_sz, dtype=heatmap.dtype) / d_sz), axis=-1)
    v = jnp.sum(v_accu * (jnp.arange(h_sz, dtype=heatmap.dtype) / h_sz), axis=-1)
    u = jnp.sum(u_accu * (jnp.arange(w_sz, dtype=heatmap.dtype) / w_sz), axis=-1)
    return jnp.stack([u, v, d], axis=-1)


def normalize_heatmap(heatmap: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normalize each (H, W) map to a probability distribution.

    Matches reference lib/models/POEM.py:214-216 (sum-normalize with eps).
    """
    flat = heatmap.reshape(heatmap.shape[:-2] + (-1,))
    flat = flat / (jnp.sum(flat, axis=-1, keepdims=True) + eps)
    return flat.reshape(heatmap.shape)


def gaussian_heatmap2d(
    uv: jnp.ndarray, hm_size: int = 32, sigma: float = 2.0
) -> jnp.ndarray:
    """Render Gaussian target heatmaps.

    uv: (..., C, 2) in [0, 1] normalized image coords.
    Returns (..., C, hm_size, hm_size).
    """
    grid = jnp.arange(hm_size, dtype=uv.dtype)
    cu = uv[..., 0:1] * hm_size  # (..., C, 1)
    cv = uv[..., 1:2] * hm_size
    du = grid - cu  # (..., C, hm)
    dv = grid - cv
    g = jnp.exp(-(dv[..., :, None] ** 2 + du[..., None, :] ** 2) / (2.0 * sigma**2))
    return g
