"""Legacy POEM v1 heads, masked-batch TPU re-designs.

* :class:`POEMPositionEmbeddedAggregationHead` — the reference "ptemb"
  head (lib/models/heads/ptEmb_head.py:197-324): ball-query ``nsample``
  frustum points around the reference-mesh centroid, slice per-point
  features out of the positional-encoded feature volume, and decode with
  a PtEmbedTRv2 point transformer in position-range-normalised space.

* :class:`POEMProjectiveSelfAggregationHead` — the reference
  "proj_selfagg" head (ptEmb_head.py:327-680): ball-query world points,
  project them into every view, bilinear-sample per-view features,
  merge across views (master-attention or sum), and decode.

TPU-native changes: the random-permute + ball-query per-sample loops
become one batched randomized ball query; per-sample projection loops
become masked batched projection; the centroid shift MLP is retained
(CENTER_SHIFT, ptEmb_head.py:87-89,251-254).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geometry.camera import project_world_to_pixel
from ...ops.points import ball_query
from ...ops.sampling import grid_sample_points, pixel_to_grid
from ...utils.registry import HEAD
from ..bricks.attention import MLP
from ..decoder_v2 import PtEmbedTRv2
from ..frustum import FrustumPositionEncoder
from ..positional import pos2posemb3d, sine_positional_encoding_3d
from .ptemb_head import MergeFeaturesMV


def normalize_by_range(x: jnp.ndarray, position_range: Sequence[float]) -> jnp.ndarray:
    pr = jnp.asarray(position_range, dtype=x.dtype)
    return (x - pr[:3]) / (pr[3:] - pr[:3])


def denormalize_by_range(x: jnp.ndarray, position_range: Sequence[float]) -> jnp.ndarray:
    pr = jnp.asarray(position_range, dtype=x.dtype)
    return x * (pr[3:] - pr[:3]) + pr[:3]


class CenterShift(nn.Module):
    """centroid + 0.01 * MLP over the query axis (ptEmb_head.py:87-89)."""

    num_query: int = 799
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, reference_points: jnp.ndarray) -> jnp.ndarray:
        centre = jnp.mean(reference_points, axis=1, keepdims=True)  # (B, 1, 3)
        x = jnp.swapaxes(reference_points, 1, 2)  # (B, 3, num_query)
        shift = MLP(self.num_query, 1, dtype=self.dtype, name="center_shift")(x)  # (B, 3, 1)
        return centre + 0.01 * jnp.swapaxes(shift, 1, 2)


class _V1Base(nn.Module):
    embed_dims: int = 256
    pt_feat_dim: int = 256
    in_channels: int = 128
    num_query: int = 799
    nsample: int = 2048
    radius: float = 0.2
    depth_num: int = 32
    depth_start: float = 0.0
    depth_end: float = 1.2
    lid: bool = False
    position_range: Tuple[float, ...] = (-0.6, -0.6, 0.0, 0.6, 0.6, 1.2)
    pe_num_feats: int = 128
    center_shift: bool = False
    n_blocks: int = 6
    n_neighbor: int = 16
    n_neighbor_query: int = 16
    dtype: jnp.dtype = jnp.float32

    def _encode_features(self, mlvl_feat, view_mask, cam_intr, cam_extr, inp_res):
        """input_proj + sine PE + frustum PE (shared by both v1 heads)."""
        B, V, H, W, _ = mlvl_feat.shape
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="input_proj")(mlvl_feat)
        sin = sine_positional_encoding_3d(view_mask, H, W, num_feats=self.pe_num_feats)
        sin = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="adapt_pos3d")(
            sin.astype(self.dtype)
        )
        coords_embed, coords3d_abs, _ = FrustumPositionEncoder(
            embed_dims=self.embed_dims,
            depth_num=self.depth_num,
            depth_start=self.depth_start,
            depth_end=self.depth_end,
            lid=self.lid,
            position_range=self.position_range,
            dtype=self.dtype,
            name="position_encoder",
        )(cam_intr, cam_extr, (H, W), inp_res)
        posi = sin + coords_embed
        return x + posi, posi, coords3d_abs


@HEAD.register_module("POEM_PositionEmbeddedAggregationHead")
class POEMPositionEmbeddedAggregationHead(_V1Base):
    init_pt_feat_dim: int = 8

    @nn.compact
    def __call__(
        self,
        mlvl_feat: jnp.ndarray,  # (B, V, H, W, C_in)
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        reference_points: jnp.ndarray,  # (B, 799, 3) world space
        template_mesh: jnp.ndarray,  # (799, 3)
        inp_res: Tuple[int, int] = (256, 256),
        rng: Optional[jax.Array] = None,
    ):
        B, V, H, W, _ = mlvl_feat.shape
        x, _, coords3d_abs = self._encode_features(
            mlvl_feat, view_mask, cam_intr, cam_extr, inp_res
        )

        centre = jnp.mean(reference_points, axis=1, keepdims=True)
        if self.center_shift:
            centre = CenterShift(self.num_query, dtype=self.dtype)(reference_points)

        # feature volume -> per-point init features: channels = D x F_init
        D = self.depth_num
        f_init = self.embed_dims // D  # init_pt_feat_dim (8 for 256/32)
        x3d = x.reshape(B, V, H, W, f_init, D)
        x3d = jnp.transpose(x3d, (0, 1, 3, 2, 5, 4))  # (B, V, W, H, D, F)
        pts = coords3d_abs.reshape(B, -1, 3)
        feats = x3d.reshape(B, -1, f_init).astype(jnp.float32)

        # mask out padded views' frustum points by pushing them far away
        per_view = pts.shape[1] // V
        vm = jnp.repeat(view_mask, per_view, axis=1)
        pts = jnp.where(vm[..., None], pts, 1e6)

        idx, pt_xyz = ball_query(centre, pts, self.nsample, self.radius, rng=rng)
        pt_xyz = pt_xyz[:, 0]  # (B, nsample, 3)
        gather_idx = jnp.maximum(idx[:, 0], 0)
        pt_feats = jnp.take_along_axis(feats, gather_idx[..., None], axis=1)

        pt_feats = nn.Dense(self.pt_feat_dim, dtype=self.dtype, name="transition_up")(
            pt_feats.astype(self.dtype)
        )

        # queries: sine-embedded learned reference positions + template
        reference_embed = self.param(
            "reference_embed", nn.initializers.uniform(scale=1.0), (self.num_query, 3)
        )
        ref_emb = pos2posemb3d(reference_embed, num_pos_feats=self.embed_dims // 2)
        ref_emb = jnp.broadcast_to(ref_emb[None], (B,) + ref_emb.shape)

        ref_norm = normalize_by_range(reference_points, self.position_range)
        template = jnp.broadcast_to(template_mesh[None], (B, self.num_query, 3))
        query_in = jnp.concatenate([ref_emb, ref_norm, template], axis=-1)
        query_embeds = MLP(self.embed_dims, self.pt_feat_dim, dtype=self.dtype, name="query_embedding")(
            query_in.astype(self.dtype)
        )

        pt_xyz_n = normalize_by_range(pt_xyz, self.position_range)
        decoder = PtEmbedTRv2(
            n_blocks=self.n_blocks,
            n_neighbor=self.n_neighbor,
            n_neighbor_query=self.n_neighbor_query,
            feat_dim=self.pt_feat_dim,
            transformer_dim=self.pt_feat_dim,
            dtype=self.dtype,
            name="transformer",
        )
        coords = decoder(pt_xyz_n, pt_feats, ref_norm, query_emb=query_embeds)
        coords = jnp.nan_to_num(coords.astype(jnp.float32))
        return {"all_coords_preds": denormalize_by_range(coords, self.position_range)}


@HEAD.register_module("POEM_Projective_SelfAggregation_Head")
class POEMProjectiveSelfAggregationHead(_V1Base):
    merge_mode: str = "attn"
    query_type: str = "KPT"

    @nn.compact
    def __call__(
        self,
        mlvl_feat: jnp.ndarray,
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        reference_points: jnp.ndarray,  # (B, 799, 3) world
        template_mesh: jnp.ndarray,  # (799, 3)
        inp_res: Tuple[int, int] = (256, 256),
        global_feat: Optional[jnp.ndarray] = None,  # (B, V, 512)
        rng: Optional[jax.Array] = None,
    ):
        B, V, H, W, _ = mlvl_feat.shape
        x, posi_embed, coords3d_abs = self._encode_features(
            mlvl_feat, view_mask, cam_intr, cam_extr, inp_res
        )

        centre = jnp.mean(reference_points, axis=1, keepdims=True)
        if self.center_shift:
            centre = CenterShift(self.num_query, dtype=self.dtype)(reference_points)

        pts = coords3d_abs.reshape(B, -1, 3)
        per_view = pts.shape[1] // V
        vm = jnp.repeat(view_mask, per_view, axis=1)
        pts = jnp.where(vm[..., None], pts, 1e6)
        _, pt_xyz = ball_query(centre, pts, self.nsample, self.radius, rng=rng)
        pt_xyz = pt_xyz[:, 0]  # (B, nsample, 3) world

        # project sampled world points + reference points into every view
        def sample_all(points):  # (B, N, 3) -> (B, V, N, C)
            proj = project_world_to_pixel(points, cam_extr, cam_intr)
            grid = pixel_to_grid(proj, inp_res)
            flat = grid_sample_points(
                x.reshape(B * V, H, W, self.embed_dims),
                grid.reshape(B * V, points.shape[1], 2).astype(x.dtype),
            )
            return flat.reshape(B, V, points.shape[1], self.embed_dims)

        pt_sampled = sample_all(pt_xyz)
        query_sampled = sample_all(reference_points)

        if self.merge_mode == "attn":
            merge = MergeFeaturesMV(self.embed_dims, dtype=self.dtype, name="merge_feature")
            pt_feats = merge(pt_sampled, view_mask)
            query_feat = merge(query_sampled, view_mask)
        else:  # masked sum (reference "sum" mode, ptEmb_head.py:628-631)
            m = view_mask[:, :, None, None].astype(pt_sampled.dtype)
            pt_feats = jnp.sum(pt_sampled * m, axis=1)
            query_feat = jnp.sum(query_sampled * m, axis=1)

        # positional embedding of the sampled points, summed over valid views
        # (reference ptEmb_head.py:598-599,645-654)
        proj = project_world_to_pixel(pt_xyz, cam_extr, cam_intr)
        grid = pixel_to_grid(proj, inp_res)
        emb_flat = grid_sample_points(
            posi_embed.reshape(B * V, H, W, self.embed_dims),
            grid.reshape(B * V, self.nsample, 2).astype(posi_embed.dtype),
        ).reshape(B, V, self.nsample, self.embed_dims)
        pt_embed = jnp.sum(
            emb_flat * view_mask[:, :, None, None].astype(emb_flat.dtype), axis=1
        )

        # query construction by QUERY_TYPE (ptEmb_head.py:422-440)
        reference_embed = self.param(
            "reference_embed", nn.initializers.uniform(scale=1.0),
            (self.num_query, self.embed_dims),
        )
        ref_emb = jnp.broadcast_to(reference_embed[None], (B, self.num_query, self.embed_dims))
        ref_norm = normalize_by_range(reference_points, self.position_range)
        template = jnp.broadcast_to(template_mesh[None], (B, self.num_query, 3))

        if global_feat is not None and self.query_type != "KPT":
            g = nn.Dense(self.embed_dims, dtype=self.dtype, name="layer_global_feat")(global_feat)
            g = jnp.sum(g * view_mask[..., None].astype(g.dtype), axis=1)  # (B, C)
            g = jnp.broadcast_to(g[:, None], (B, self.num_query, self.embed_dims))
        else:
            g = None

        if self.query_type == "POEM":
            query_in = jnp.concatenate([ref_emb, ref_norm, template], axis=-1)
        elif self.query_type == "KPT":
            query_in = ref_emb
        elif self.query_type == "MVP":
            query_in = g + ref_emb
        elif self.query_type == "METRO":
            query_in = jnp.concatenate([g, template], axis=-1)
        else:
            raise ValueError(f"unknown query_type {self.query_type!r}")
        query_embeds = MLP(self.embed_dims, self.pt_feat_dim, dtype=self.dtype, name="query_embedding")(
            query_in.astype(self.dtype)
        )

        pt_xyz_n = normalize_by_range(pt_xyz, self.position_range)
        decoder = PtEmbedTRv2(
            n_blocks=self.n_blocks,
            n_neighbor=self.n_neighbor,
            n_neighbor_query=self.n_neighbor_query,
            feat_dim=self.pt_feat_dim,
            transformer_dim=self.pt_feat_dim,
            dtype=self.dtype,
            name="transformer",
        )
        coords = decoder(
            pt_xyz_n, pt_feats, ref_norm,
            query_feat=query_feat, pt_embed=pt_embed, query_emb=query_embeds,
        )
        coords = jnp.nan_to_num(coords.astype(jnp.float32))
        return {"all_coords_preds": denormalize_by_range(coords, self.position_range)}
