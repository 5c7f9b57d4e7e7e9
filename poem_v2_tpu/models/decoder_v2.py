"""PtEmbedTRv2: pure point-transformer decoder (reference
lib/models/layers/ptEmb_transformer.py:22-107).

Stack of N blocks, each: query KNN self-attention, (xyz ‖ feat)
cross-attention into the sampled cloud, and an external regression
branch producing Δxyz; collects intermediate coordinates. Used by the
legacy POEM v1 heads and as the PT half of PtEmbedTRv3.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import TRANSFORMER
from .bricks.attention import MLP
from .bricks.point_transformer import PtCrossAttnBlock, PtSelfAttnBlock
from ..geometry.camera import inverse_sigmoid


@TRANSFORMER.register_module("PtEmbedTRv2")
class PtEmbedTRv2(nn.Module):
    n_blocks: int = 6
    n_neighbor: int = 16
    n_neighbor_query: int = 16
    feat_dim: int = 256
    transformer_dim: int = 256
    with_point_embed: bool = True
    predict_inv_sigmoid: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(
            n_blocks=cfg.N_BLOCKS,
            n_neighbor=cfg.N_NEIGHBOR,
            n_neighbor_query=cfg.N_NEIGHBOR_QUERY,
            feat_dim=cfg.POINTS_FEAT_DIM,
            transformer_dim=cfg.TRANSFORMER_DIM,
            with_point_embed=cfg.get("WITH_POSI_EMBED", True),
            predict_inv_sigmoid=cfg.get("PREDICT_INV_SIGMOID", False),
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        pt_xyz: jnp.ndarray,  # (B, N, 3)
        pt_feats: jnp.ndarray,  # (B, N, F)
        query_xyz: jnp.ndarray,  # (B, M, 3)
        query_feat: Optional[jnp.ndarray] = None,
        pt_embed: Optional[jnp.ndarray] = None,
        query_emb: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if pt_embed is not None and self.with_point_embed:
            pt_feats = pt_feats + pt_embed
        if query_feat is None:
            query_feats = query_emb
        else:
            query_feats = query_feat + (query_emb if query_emb is not None else 0.0)

        pt_feats = PtSelfAttnBlock(
            d_points=self.feat_dim,
            d_model=self.transformer_dim,
            k=self.n_neighbor,
            dtype=self.dtype,
            name="feats_self_attn",
        )(pt_xyz, pt_feats)

        coords = []
        for i in range(self.n_blocks):
            query_feats = PtSelfAttnBlock(
                d_points=self.feat_dim,
                d_model=self.transformer_dim,
                k=self.n_neighbor_query,
                dtype=self.dtype,
                name=f"query_self_attn_{i}",
            )(query_xyz, query_feats)

            query_feats = PtCrossAttnBlock(
                d_points=self.feat_dim,
                d_model=self.transformer_dim,
                k=self.n_neighbor,
                dtype=self.dtype,
                name=f"query_cross_attn_{i}",
            )(pt_xyz, pt_feats, query_xyz, query_feats)

            delta = MLP(self.feat_dim, 3, dtype=self.dtype, name=f"reg_branch_{i}")(query_feats)
            if self.predict_inv_sigmoid:
                query_xyz = nn.sigmoid(delta.astype(jnp.float32) + inverse_sigmoid(query_xyz))
            else:
                query_xyz = query_xyz + delta.astype(query_xyz.dtype)
            coords.append(query_xyz)

        return jnp.stack(coords, axis=0)
