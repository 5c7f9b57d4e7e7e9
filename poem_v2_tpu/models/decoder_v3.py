"""PtEmbedTRv3: METRO->PointTransformer hybrid decoder ("3+3").

Re-design of the reference hybrid (lib/models/layers/ptEmb_transformer.py:124-300):
a METRO-style BERT encoder stack first regresses a coarse 799-point mesh
from (template ‖ features) tokens; the coarse mesh is re-projected into
every view to re-sample per-vertex image features (masked multi-view
merge); a PtEmbedTRv2 point transformer then refines in normalised
space. All per-sample projection/merge loops are masked batched ops.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.camera import project_world_to_pixel
from ..ops.sampling import grid_sample_points_matmul, pixel_to_grid
from ..utils.registry import TRANSFORMER
from .decoder_v2 import PtEmbedTRv2
from .heads.ptemb_head import MergeFeaturesMV
from .metro import METROEncoderBlock


@TRANSFORMER.register_module("PtEmbedTRv3")
class PtEmbedTRv3(nn.Module):
    feat_dim: int = 256
    vt_hidden_dims: Tuple[int, ...] = (1024, 256, 64)
    vt_output_dims: Tuple[int, ...] = (512, 128, 3)
    vt_num_layers: int = 4
    vt_num_heads: int = 4
    pt_n_blocks: int = 3
    pt_n_neighbor: int = 16
    pt_n_neighbor_query: int = 16
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pt_xyz: jnp.ndarray,  # (B, N, 3) normalised BPS cloud
        pt_feats: jnp.ndarray,  # (B, N, F)
        query_xyz: jnp.ndarray,  # (B, 799, 3) normalised template
        query_feat: jnp.ndarray,  # (B, 799, F)
        feature_map: jnp.ndarray,  # (B, V, H, W, F) positional-encoded features
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        ref_center: jnp.ndarray,  # (B, 3) hand centre (world)
        radius: float,
        inp_res: Tuple[int, int] = (256, 256),
        deterministic: bool = True,
    ):
        B, V, H, W, F = feature_map.shape
        nq = query_xyz.shape[1]

        # ---- METRO stage: tokens = (xyz ‖ feat) over queries and BPS ------
        mesh_tokens = jnp.concatenate([query_xyz.astype(self.dtype), query_feat], axis=-1)
        bps_tokens = jnp.concatenate([pt_xyz.astype(self.dtype), pt_feats], axis=-1)
        tokens = jnp.concatenate([mesh_tokens, bps_tokens], axis=1)
        x = tokens
        for i, (h, o) in enumerate(zip(self.vt_hidden_dims, self.vt_output_dims)):
            x = METROEncoderBlock(
                hidden_size=h, output_dim=o, num_layers=self.vt_num_layers,
                num_heads=self.vt_num_heads, dropout=self.dropout,
                max_positions=tokens.shape[1], dtype=self.dtype, name=f"metro_block_{i}",
            )(x, deterministic=deterministic)
        pred_metro = x[:, :nq].astype(jnp.float32)  # (B, 799, 3) normalised

        # ---- re-sample vertex features at the coarse mesh -----------------
        pred_world = pred_metro * radius + ref_center[:, None]
        proj = project_world_to_pixel(pred_world, cam_extr.astype(jnp.float32), cam_intr.astype(jnp.float32))
        grid = pixel_to_grid(proj, inp_res)
        sampled = grid_sample_points_matmul(
            feature_map.reshape(B * V, H, W, F), grid.reshape(B * V, nq, 2).astype(feature_map.dtype)
        ).reshape(B, V, nq, F)
        query_feat2 = MergeFeaturesMV(F, dtype=self.dtype, name="merge_branch")(sampled, view_mask)

        # ---- PT refinement stage ------------------------------------------
        pt = PtEmbedTRv2(
            n_blocks=self.pt_n_blocks,
            n_neighbor=self.pt_n_neighbor,
            n_neighbor_query=self.pt_n_neighbor_query,
            feat_dim=F,
            transformer_dim=F,
            dtype=self.dtype,
            name="point_transformer",
        )
        refined = pt(pt_xyz, pt_feats, pred_metro, query_feat=query_feat2)
        return jnp.concatenate([pred_metro[None], refined], axis=0)
