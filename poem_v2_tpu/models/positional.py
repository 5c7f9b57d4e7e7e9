"""Sine positional encodings over the (view, y, x) axes.

Masked-batch equivalent of the reference's ``SinePositionalEncoding3D``
(lib/models/layers/petr_transformer.py:400-469) — where the reference
runs it per ragged sub-batch and concatenates (ptEmb_head.py:853-860),
here a (B, V) view mask drives one fully batched computation whose
values match the per-sub-batch results exactly: the view-index embedding
is normalized by each sample's own valid-view count.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_positional_encoding_3d_factors(
    view_mask: jnp.ndarray,  # (B, V) bool
    height: int,
    width: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
    dtype=jnp.float32,
):
    """The three broadcast factors of the 3D sine encoding, unexpanded.

    Returns (pos_n (B, V, F), pos_y (B, V, H, F), pos_x (B, V, W, F)).
    The full (B, V, H, W, 3F) embedding is their broadcast-concat; any
    LINEAR map of it (the head's adapt_pos3d 1x1 conv) distributes over
    the concat, so consumers can project the small factors and
    broadcast-add — never materializing the ~200 MB expanded tensor.
    """
    B, V = view_mask.shape
    vm = view_mask.astype(dtype)

    # view-index embedding: cumulative count of valid views (1-based),
    # zero at padded views (their not_mask plane is all zero in the ref).
    n_embed = jnp.cumsum(vm, axis=1) * vm  # (B, V)
    y_embed = (jnp.arange(height, dtype=dtype) + 1.0)[None, None, :] * vm[..., None]  # (B, V, H)
    x_embed = (jnp.arange(width, dtype=dtype) + 1.0)[None, None, :] * vm[..., None]  # (B, V, W)

    if normalize:
        n_last = jnp.sum(vm, axis=1, keepdims=True)  # (B, 1)
        n_embed = (n_embed + offset) / (n_last + eps) * scale
        y_embed = (y_embed + offset) / (y_embed[..., -1:] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[..., -1:] + eps) * scale

    i = jnp.arange(num_feats, dtype=dtype)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_feats)  # (F,)

    def blocked_sin_cos(vals):  # vals (..., F)
        # NOT the classic interleave: the reference's 3D variant stacks at
        # dim=4 of the 5D (B, N, H, W, F/2) tensor (petr_transformer.py:
        # 466-468) — a quirk inherited from the 2D encoding where dim=4
        # interleaved; on the 5D tensor it produces the BLOCKED layout
        # [sin(f0), sin(f2), ..., cos(f1), cos(f3), ...]. Converted
        # checkpoints are coupled to this channel order.
        sin = jnp.sin(vals[..., 0::2])
        cos = jnp.cos(vals[..., 1::2])
        return jnp.concatenate([sin, cos], axis=-1)

    pos_n = blocked_sin_cos(n_embed[..., None] / dim_t)  # (B, V, F)
    pos_y = blocked_sin_cos(y_embed[..., None] / dim_t)  # (B, V, H, F)
    pos_x = blocked_sin_cos(x_embed[..., None] / dim_t)  # (B, V, W, F)
    return pos_n, pos_y, pos_x


def sine_positional_encoding_3d(
    view_mask: jnp.ndarray,  # (B, V) bool
    height: int,
    width: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns (B, V, H, W, 3*num_feats) channels-last position embedding."""
    B, V = view_mask.shape
    pos_n, pos_y, pos_x = sine_positional_encoding_3d_factors(
        view_mask, height, width, num_feats, temperature, normalize,
        scale, eps, offset, dtype,
    )
    pos_n_full = jnp.broadcast_to(pos_n[:, :, None, None], (B, V, height, width, num_feats))
    pos_y_full = jnp.broadcast_to(pos_y[:, :, :, None], (B, V, height, width, num_feats))
    pos_x_full = jnp.broadcast_to(pos_x[:, :, None, :], (B, V, height, width, num_feats))
    # channel order (n, y, x) matches reference petr_transformer.py:468
    return jnp.concatenate([pos_n_full, pos_y_full, pos_x_full], axis=-1)


def pos2posemb3d(pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0):
    """Sine embedding of 3D coordinates (reference ptEmb_head.py:40-52).

    pos: (..., 3) -> (..., 3*num_pos_feats), channel order (y, x, z).
    """
    scale = 2 * math.pi
    pos = pos * scale
    i = jnp.arange(num_pos_feats, dtype=pos.dtype)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)

    def emb(v):  # (...,) -> (..., F)
        vals = v[..., None] / dim_t
        sin = jnp.sin(vals[..., 0::2])
        cos = jnp.cos(vals[..., 1::2])
        return jnp.stack([sin, cos], axis=-1).reshape(vals.shape[:-1] + (num_pos_feats,))

    return jnp.concatenate([emb(pos[..., 1]), emb(pos[..., 0]), emb(pos[..., 2])], axis=-1)
