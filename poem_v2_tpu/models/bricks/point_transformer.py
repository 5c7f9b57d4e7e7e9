"""Point Transformer vector-attention bricks (flax).

Re-design of the reference's ``ptTransformerBlock`` /
``ptTransformerBlock_CrossAttn`` (lib/models/bricks/point_transformers.py:47-156):
subtraction vector attention over K nearest neighbours with a relative
position MLP, softmax over the neighbour axis. The pytorch3d CUDA
KNN/FPS calls become one MXU distance matmul + top-k
(:mod:`poem_v2_tpu.ops.points`); fixed-anchor mode (the reference's
"IFPS" init block, point_transformers.py:10-32) takes a static anchor
index set instead of loading assets from disk inside the layer.

The reference wraps both blocks in ``torch.utils.checkpoint`` during
training (point_transformers.py:63-66); here the caller applies
``jax.checkpoint`` over whole decoder blocks instead, which trades the
same activations for recompute under XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.points import index_points, knn_points
from .attention import MLP


def _vector_attention(
    q: jnp.ndarray,  # (B, M, D)
    k: jnp.ndarray,  # (B, M, K, D)
    v: jnp.ndarray,  # (B, M, K, D)
    pos_enc: jnp.ndarray,  # (B, M, K, D)
    gamma: nn.Module,
) -> jnp.ndarray:
    """Subtraction attention: softmax_K(gamma(q - k + pos)) * (v + pos)."""
    attn = gamma(q[:, :, None] - k + pos_enc)  # (B, M, K, D)
    attn = nn.softmax(attn / jnp.sqrt(k.shape[-1]).astype(k.dtype), axis=-2)
    return jnp.einsum("bmkd,bmkd->bmd", attn, v + pos_enc)


class PtSelfAttnBlock(nn.Module):
    """Vector self-attention over a point set with per-point features."""

    d_points: int
    d_model: int
    k: int
    approx_knn: bool = True  # TPU approx_max_k: ~4x faster top-k, recall ~0.95
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,  # (B, M, 3)
        features: jnp.ndarray,  # (B, M, d_points)
        anchor_idx: Optional[jnp.ndarray] = None,  # (A,) static anchors
    ) -> jnp.ndarray:
        pre = features
        x = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(x)
        ks = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_ks")(x)
        vs = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_vs")(x)

        if anchor_idx is not None:
            # fixed shared anchors: every point attends to the same subset
            local_xyz = xyz[:, anchor_idx][:, None]  # (B, 1, A, 3)
            k_g = ks[:, anchor_idx][:, None]  # (B, 1, A, D)
            v_g = vs[:, anchor_idx][:, None]
            local_xyz = jnp.broadcast_to(local_xyz, (xyz.shape[0], xyz.shape[1]) + local_xyz.shape[2:])
            k_g = jnp.broadcast_to(k_g, (x.shape[0], x.shape[1]) + k_g.shape[2:])
            v_g = jnp.broadcast_to(v_g, (x.shape[0], x.shape[1]) + v_g.shape[2:])
        else:
            _, idx, local_xyz = knn_points(xyz, xyz, self.k, approx=self.approx_knn)
            k_g = index_points(ks, idx)
            v_g = index_points(vs, idx)

        fc_delta = MLP(self.d_model, self.d_model, dtype=self.dtype, name="fc_delta")
        fc_gamma = MLP(self.d_model, self.d_model, dtype=self.dtype, name="fc_gamma")
        pos_enc = fc_delta(xyz[:, :, None] - local_xyz)
        res = _vector_attention(q, k_g, v_g, pos_enc, fc_gamma)
        return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre


class PtCrossAttnBlock(nn.Module):
    """Vector cross-attention: queries attend to KNN of a key point cloud."""

    d_points: int
    d_model: int
    k: int
    approx_knn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,  # (B, N, 3) key cloud
        features: jnp.ndarray,  # (B, N, d_model) key features
        query_xyz: jnp.ndarray,  # (B, M, 3)
        query_feat: jnp.ndarray,  # (B, M, d_points)
        anchor_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        pre = query_feat
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(query_feat)

        # Linear maps commute with the gather: transform the N cloud points
        # once, then gather K neighbours — ~(M*K)/N fewer dense FLOPs than
        # transforming gathered neighbourhoods (the reference transforms
        # after gathering, point_transformers.py:141-143).
        x_full = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        k_full = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_ks")(x_full)
        v_full = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_vs")(x_full)

        if anchor_idx is not None:
            local_xyz = xyz[:, anchor_idx]  # (B, A, 3)
            k_g = k_full[:, anchor_idx]
            v_g = v_full[:, anchor_idx]
            B, M = xyz.shape[0], query_xyz.shape[1]
            local_xyz = jnp.broadcast_to(local_xyz[:, None], (B, M) + local_xyz.shape[1:])
            k_g = jnp.broadcast_to(k_g[:, None], (B, M) + k_g.shape[1:])
            v_g = jnp.broadcast_to(v_g[:, None], (B, M) + v_g.shape[1:])
        else:
            _, idx, local_xyz = knn_points(query_xyz, xyz, self.k, approx=self.approx_knn)
            k_g = index_points(k_full, idx)
            v_g = index_points(v_full, idx)

        fc_delta = MLP(self.d_model, self.d_model, dtype=self.dtype, name="fc_delta")
        fc_gamma = MLP(self.d_model, self.d_model, dtype=self.dtype, name="fc_gamma")
        pos_enc = fc_delta(query_xyz[:, :, None] - local_xyz)
        res = _vector_attention(q, k_g, v_g, pos_enc, fc_gamma)
        return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre
