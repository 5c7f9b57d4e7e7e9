"""Point-embedded transformer decoder (the reference's ``PtEmbedTRv4``).

Each of the N_BLOCKS blocks (reference lib/models/layers/ptEmb_transformer.py:303-376
+ lib/models/bricks/pt_metro_transformer.py:43-200) runs:

  1. a shared Linear embedding + dropout on query and BPS features,
  2. two stacked BERT cross-attentions (queries -> 4096 BPS features;
     see bricks/attention.py for why both are cross),
  3. a "pointer" vector-attention stage: KNN self-attention over the 799
     queries, KNN cross-attention into the BPS cloud, and a Δxyz
     regression head that moves the query coordinates,
  4. a gelu FFN with post-LN.

Block 0 ("init block") replaces KNN neighbourhoods with a fixed set of
32 farthest-point anchors (reference point_transformers.py:10-32 caches
them to assets/anchor.npy; here they are static index constants passed
in by the head). The final block can optionally emit MANO pose/shape
parameters and replace the coordinates with the MANO surface
(reference pt_metro_transformer.py:139-151).

Blocks are wrapped in ``jax.checkpoint`` under training to match the
reference's gradient checkpointing (point_transformers.py:63-66) and
keep HBM for the 4096-point attention activations bounded.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import TRANSFORMER
from .bricks.attention import BertFFN, MLP, MultiHeadCrossAttention
from .bricks.point_transformer import PtCrossAttnBlock, PtSelfAttnBlock


class PointerLayer(nn.Module):
    """Vector-attention pointer: self-attn, cross-attn, Δxyz regression.

    Reference: pt_metro_transformer.py:13-40 (pointer_layer).
    """

    feat_dim: int
    n_neighbor: int
    n_neighbor_query: int
    init_block: bool
    approx_knn: bool = True
    use_fused: bool = False
    use_fused_knn: bool = False
    use_fused_knn_train: bool = False
    knn_bf16_dist: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pt_xyz: jnp.ndarray,  # (B, N, 3)
        pt_feats: jnp.ndarray,  # (B, N, D)
        query_xyz: jnp.ndarray,  # (B, M, 3)
        query_feat: jnp.ndarray,  # (B, M, D)
        query_anchor_idx: Optional[jnp.ndarray] = None,
        pt_anchor_idx: Optional[jnp.ndarray] = None,
        anchor_xyz: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        self_anchors = query_anchor_idx if self.init_block else None
        cross_anchors = pt_anchor_idx if self.init_block else None
        a_xyz = anchor_xyz if self.init_block else None

        query_feat = PtSelfAttnBlock(
            d_points=self.feat_dim,
            d_model=self.feat_dim,
            k=self.n_neighbor_query,
            approx_knn=self.approx_knn,
            use_fused=self.use_fused,
            use_fused_knn=self.use_fused_knn,
            use_fused_knn_train=self.use_fused_knn_train,
            knn_bf16_dist=self.knn_bf16_dist,
            dtype=self.dtype,
            name="query_self_attn",
        )(query_xyz, query_feat, anchor_idx=self_anchors, anchor_xyz=a_xyz)

        query_feat = PtCrossAttnBlock(
            d_points=self.feat_dim,
            d_model=self.feat_dim,
            k=self.n_neighbor,
            approx_knn=self.approx_knn,
            use_fused=self.use_fused,
            use_fused_knn=self.use_fused_knn,
            use_fused_knn_train=self.use_fused_knn_train,
            knn_bf16_dist=self.knn_bf16_dist,
            dtype=self.dtype,
            name="query_cross_attn",
        )(pt_xyz, pt_feats, query_xyz, query_feat, anchor_idx=cross_anchors, anchor_xyz=a_xyz)

        delta = MLP(self.feat_dim, 3, dtype=self.dtype, name="reg_branch")(query_feat)
        return query_feat, query_xyz + delta.astype(query_xyz.dtype)


class PointMetroBlock(nn.Module):
    """One decoder block (reference point_METRO_block)."""

    hidden_size: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    n_neighbor: int = 32
    n_neighbor_query: int = 32
    init_block: bool = False
    final_block: bool = False
    parametric_output: bool = False
    deterministic: bool = True
    approx_knn: bool = True
    use_fused_knn: bool = False
    use_fused_knn_train: bool = False
    knn_bf16_dist: bool = False
    use_flash: bool = False
    use_flash_train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_xyz: jnp.ndarray,  # (B, 799, 3)
        query_feats: jnp.ndarray,  # (B, 799, D)
        pt_xyz: jnp.ndarray,  # (B, N, 3)
        pt_feats: jnp.ndarray,  # (B, N, D)
        query_anchor_idx: Optional[jnp.ndarray] = None,
        pt_anchor_idx: Optional[jnp.ndarray] = None,
        anchor_xyz: Optional[jnp.ndarray] = None,
    ):
        deterministic = self.deterministic
        embed = nn.Dense(self.hidden_size, dtype=self.dtype, name="embedding")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        q_emb = drop(embed(query_feats))
        k_emb = drop(embed(pt_feats))

        attn_out = MultiHeadCrossAttention(
            self.hidden_size, self.num_heads, self.dropout, use_flash=self.use_flash,
            use_flash_train=self.use_flash_train,
            dtype=self.dtype, name="attn"
        )(q_emb, k_emb, deterministic=deterministic)
        attn_out = MultiHeadCrossAttention(
            self.hidden_size, self.num_heads, self.dropout, use_flash=self.use_flash,
            use_flash_train=self.use_flash_train,
            dtype=self.dtype, name="cross_attn"
        )(attn_out, k_emb, deterministic=deterministic)

        query_feats_new, query_xyz_new = PointerLayer(
            feat_dim=self.hidden_size,
            n_neighbor=self.n_neighbor,
            n_neighbor_query=self.n_neighbor_query,
            init_block=self.init_block,
            approx_knn=self.approx_knn,
            use_fused_knn=self.use_fused_knn and self.deterministic,
            use_fused_knn_train=self.use_fused_knn_train and not self.deterministic,
            knn_bf16_dist=self.knn_bf16_dist,
            use_fused=False,  # measured slower than the XLA fusion at POEM sizes
            dtype=self.dtype,
            name="vec_attn",
        )(pt_xyz, k_emb, query_xyz, attn_out, query_anchor_idx, pt_anchor_idx, anchor_xyz)

        query_feats_new = BertFFN(
            self.hidden_size, self.hidden_size * 4, self.dropout, dtype=self.dtype, name="ffn"
        )(query_feats_new, deterministic=deterministic)

        pred_pose = None
        pred_shape = None
        if self.parametric_output and self.final_block:
            # (B, 799, D) -> per-channel mix over the 799 tokens -> 106 params
            flat = jnp.swapaxes(query_feats_new, 1, 2)  # (B, D, 799)
            flat = nn.Dense(1, dtype=self.dtype, name="flat_verts")(flat)[..., 0]  # (B, D)
            params = nn.Dense(106, dtype=self.dtype, name="mano_linear")(flat)
            pred_pose = params[:, :96]  # 16 x 6D rotations
            pred_shape = params[:, 96:]

        return query_feats_new, query_xyz_new, pred_pose, pred_shape


@TRANSFORMER.register_module("PtEmbedTRv4")
class PtEmbedDecoder(nn.Module):
    """Stack of PointMetroBlocks collecting per-block coordinates.

    Configured from the same YAML schema as the reference
    (config/release/train_medium.yaml MODEL.HEAD.TRANSFORMER).
    """

    n_blocks: int = 3
    hidden_size: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    n_neighbor: int = 32
    n_neighbor_query: int = 32
    parametric_output: bool = False
    remat: bool = True
    approx_knn: bool = True
    use_fused_knn: bool = False
    use_fused_knn_train: bool = False
    knn_bf16_dist: bool = False
    use_flash: bool = False
    use_flash_train: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(
            n_blocks=cfg.N_BLOCKS,
            hidden_size=cfg.INPUT_FEAT_DIM,
            num_heads=cfg.NUM_ATTENTION_HEADS,
            dropout=cfg.get("DROPOUT", 0.1),
            n_neighbor=cfg.N_NEIGHBOR,
            n_neighbor_query=cfg.N_NEIGHBOR_QUERY,
            parametric_output=cfg.get("PARAMETRIC_OUTPUT", False),
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        query_xyz: jnp.ndarray,
        query_feats: jnp.ndarray,
        pt_xyz: jnp.ndarray,
        pt_feats: jnp.ndarray,
        query_anchor_idx: Optional[jnp.ndarray] = None,
        pt_anchor_idx: Optional[jnp.ndarray] = None,
        anchor_xyz: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        coords = []
        pred_pose = pred_shape = None
        use_remat = self.remat and not deterministic
        # save the named KNN indices across the remat boundary (int32,
        # (B, M, K) — a few hundred KB) so the backward's block replay
        # skips the (B, M, N) distance matmuls + top-k selections, plus
        # the Pallas kernel OUTPUTS ((B, M, D) bf16, a few MB per block):
        # the fused KNN / dense-attention custom calls were measured as
        # the top train-step ops (5.6 / 2.2 / 1.1 ms per instance on
        # v5e) and replaying them under plain remat doubled their cost —
        # 251.1 -> 231.2 ms/step flagship with the outputs saved, vs
        # 229.8 for no remat at all. Every other intermediate (the
        # (B, N, D) cloud tensors, MLPs, norms) is still recomputed, so
        # the activation-memory story stays ~that of full remat.
        block_cls = (
            nn.remat(
                PointMetroBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "knn_idx", "knn_attn_out", "dense_attn_out"
                ),
            )
            if use_remat
            else PointMetroBlock
        )
        for i in range(self.n_blocks):
            block = block_cls(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dropout=self.dropout,
                n_neighbor=self.n_neighbor,
                n_neighbor_query=self.n_neighbor_query,
                init_block=(i == 0),
                final_block=(i == self.n_blocks - 1),
                parametric_output=self.parametric_output,
                deterministic=deterministic,
                approx_knn=self.approx_knn,
                use_fused_knn=self.use_fused_knn,
                use_fused_knn_train=self.use_fused_knn_train,
                knn_bf16_dist=self.knn_bf16_dist,
                use_flash=self.use_flash,
                use_flash_train=self.use_flash_train,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            query_feats, query_xyz, pose_i, shape_i = block(
                query_xyz,
                query_feats,
                pt_xyz,
                pt_feats,
                query_anchor_idx,
                pt_anchor_idx,
                anchor_xyz,
            )
            if pose_i is not None:
                pred_pose, pred_shape = pose_i, shape_i
            coords.append(query_xyz)
        return jnp.stack(coords, axis=0), pred_pose, pred_shape
