"""PETR multi-view baseline (flax).

TPU re-design of the reference PETR stack: ``PETRMultiView`` model
(lib/models/PETR.py:22-430), ``PETRHead`` (lib/models/heads/petr_head.py:31-222)
and the DETR-style ``PETRTransformer`` decoder
(lib/models/layers/petr_transformer.py:25-398). 799 learned 3D reference
points are sine-embedded into queries (+ template mesh), image tokens
from all views carry frustum + sine positional embeddings, and a 6-layer
decoder with per-layer sigmoid-space regression produces the mesh.

Masked-batch changes: images come padded (B, V_max, ...) with a view
mask that hides padded views' tokens from the cross-attention.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.camera import inverse_sigmoid
from ..utils.registry import HEAD, MODEL, TRANSFORMER
from .bricks.transformer_layer import BaseTransformerLayer
from .frustum import FrustumPositionEncoder
from .positional import pos2posemb3d, sine_positional_encoding_3d


@TRANSFORMER.register_module("PETRTransformer")
class PETRTransformer(nn.Module):
    """DETR decoder: N post-norm layers (self_attn, norm, cross_attn,
    norm, ffn, norm) over zero-initialised queries, returning every
    intermediate with the sequence-level ``post_norm`` applied — the
    reference ``PETRTransformerDecoderLayerSequence`` norms each
    intermediate before stacking (lib/models/layers/petr_transformer.py:
    117-165, ``intermediate.append(self.post_norm(query))``)."""

    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    post_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_pos, memory_mask, query_embed, deterministic=True):
        query = jnp.zeros_like(query_embed)
        pn = nn.LayerNorm(dtype=self.dtype, name="post_norm") if self.post_norm else None
        outs = []
        for i in range(self.num_layers):
            query = BaseTransformerLayer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout,
                operation_order=("self_attn", "norm", "cross_attn", "norm", "ffn", "norm"),
                dtype=self.dtype,
                name=f"layer_{i}",
            )(query, memory, query_embed, memory_pos, memory_mask, deterministic)
            outs.append(pn(query) if pn is not None else query)
        return jnp.stack(outs)  # (L, B, Q, C)


def _petr_reg_levels(
    outs, ref_sig, num_preds, num_reg_fcs, embed_dims,
    coord_relative, position_range, dtype,
):
    """ONE shared reg branch applied to every decoder level — the
    reference repeats the SAME Sequential object in its ModuleList
    (petr_head.py:67-75: ``[reg_branch for _ in range(num_preds)]``), so
    all levels regress through identical weights. Runs inside the head's
    compact scope (submodules bind to the ambient parent)."""
    reg_fcs = [
        nn.Dense(embed_dims, dtype=dtype, name=f"reg_fc{i}") for i in range(num_reg_fcs)
    ]
    reg_out = nn.Dense(3, dtype=dtype, name="reg_out")
    coords = []
    for lvl in range(num_preds):
        h = outs[lvl]
        for fc in reg_fcs:
            h = nn.relu(fc(h.astype(dtype)))
        delta = reg_out(h).astype(jnp.float32)
        if coord_relative:
            coords.append(nn.sigmoid(delta + inverse_sigmoid(ref_sig)))
        else:
            coords.append(nn.sigmoid(delta))
    all_coords = jnp.stack(coords)  # (L, B, Q, 3) in [0, 1]
    pr = jnp.asarray(position_range, dtype=jnp.float32)
    all_coords = all_coords * (pr[3:] - pr[:3]) + pr[:3]
    return {"all_coords_preds": all_coords}


@HEAD.register_module("PETRHead")
class PETRHead(nn.Module):
    embed_dims: int = 256
    in_channels: int = 256
    num_query: int = 799
    num_preds: int = 6
    num_reg_fcs: int = 2
    depth_num: int = 32
    depth_start: float = 0.0
    depth_end: float = 1.2
    lid: bool = False
    position_range: Tuple[float, ...] = (-0.6, -0.6, 0.0, 0.6, 0.6, 1.2)
    pe_num_feats: int = 128
    coord_relative: bool = False
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,  # (B, V, H, W, C) — the stride-16 level
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        template_mesh: jnp.ndarray,  # (799, 3)
        inp_res: Tuple[int, int] = (256, 256),
        deterministic: bool = True,
    ):
        B, V, H, W, _ = feat.shape
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="input_proj")(feat)

        coords_embed, _, _ = FrustumPositionEncoder(
            embed_dims=self.embed_dims,
            depth_num=self.depth_num,
            depth_start=self.depth_start,
            depth_end=self.depth_end,
            lid=self.lid,
            position_range=self.position_range,
            # the PETR head's position_encoder hides at embed_dims * 4
            # (petr_head.py:83-87), unlike the POEM head's * 2
            hidden_mult=4,
            dtype=self.dtype,
            name="position_encoder",
        )(cam_intr, cam_extr, (H, W), inp_res)

        sin = sine_positional_encoding_3d(view_mask, H, W, num_feats=self.pe_num_feats)
        sin = nn.Conv(self.embed_dims * 4, (1, 1), dtype=self.dtype, name="adapt_pos3d_1")(
            sin.astype(self.dtype)
        )
        sin = nn.relu(sin)
        sin = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="adapt_pos3d_2")(sin)
        pos_embed = coords_embed + sin

        memory = x.reshape(B, V * H * W, self.embed_dims)
        memory_pos = pos_embed.reshape(B, V * H * W, self.embed_dims)
        token_mask = jnp.repeat(view_mask, H * W, axis=1)  # (B, V*H*W)

        reference_points = self.param(
            "reference_points", nn.initializers.uniform(scale=1.0), (self.num_query, 3)
        )
        q_in = jnp.concatenate(
            [pos2posemb3d(reference_points, self.embed_dims // 2), template_mesh], axis=-1
        )
        query_embed = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_embedding_1")(
            q_in.astype(self.dtype)
        )
        query_embed = nn.relu(query_embed)
        query_embed = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_embedding_2")(
            query_embed
        )
        query_embed = jnp.broadcast_to(query_embed[None], (B,) + query_embed.shape)

        outs = PETRTransformer(
            self.embed_dims, self.num_preds, self.num_heads,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout, dtype=self.dtype, name="transformer",
        )(memory, memory_pos, token_mask, query_embed, deterministic)
        outs = jnp.nan_to_num(outs.astype(jnp.float32))

        ref_sig = nn.sigmoid(jnp.broadcast_to(reference_points[None], (B, self.num_query, 3)))
        return _petr_reg_levels(
            outs, ref_sig, self.num_preds, self.num_reg_fcs,
            self.embed_dims, self.coord_relative, self.position_range, self.dtype,
        )


class PETRMultiView(nn.Module):
    """Backbone + PETR head; same padded-batch interface as POEMNet."""

    backbone: nn.Module
    head: nn.Module
    template_mesh: Optional[object] = None  # np (799, 3)
    num_joints: int = 21
    center_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, V, H, W, 3)
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        master_joints_3d=None,
        train: bool = False,
    ):
        B, V, H, W, _ = images.shape
        feats = self.backbone(images.reshape(B * V, H, W, 3).astype(self.dtype))
        lvl = feats["res_layer3"] if isinstance(feats, dict) else feats[2]
        fh, fw = lvl.shape[1], lvl.shape[2]
        lvl = lvl.reshape(B, V, fh, fw, lvl.shape[-1])

        template = jnp.asarray(self.template_mesh, dtype=jnp.float32)
        preds = self.head(
            lvl, view_mask, cam_intr, cam_extr, template,
            inp_res=(W, H), deterministic=not train,
        )
        all_coords = preds["all_coords_preds"]
        pred_joints = all_coords[-1, :, : self.num_joints]
        pred_verts = all_coords[-1, :, self.num_joints :]
        centre = pred_joints[:, self.center_idx][:, None]
        preds.update(
            pred_joints_3d=pred_joints,
            pred_verts_3d=pred_verts,
            pred_joints_3d_rel=pred_joints - centre,
            pred_verts_3d_rel=pred_verts - centre,
        )
        return preds


def create_petr_model(cfg, dtype=jnp.float32):
    """Build PETRMultiView from a reference-schema config."""
    import numpy as np

    from ..mano import ManoLayer
    from .backbones.resnet import ResNet

    bb = ResNet.from_config(cfg.BACKBONE, dtype=dtype)
    head_cfg = cfg.HEAD
    head = PETRHead(
        embed_dims=head_cfg.EMBED_DIMS,
        in_channels=head_cfg.IN_CHANNELS,
        num_query=head_cfg.NUM_QUERY,
        num_preds=head_cfg.NUM_PREDS,
        num_reg_fcs=head_cfg.get("NUM_REG_FCS", 2),
        depth_num=head_cfg.DEPTH_NUM,
        depth_start=head_cfg.DEPTH_START,
        depth_end=head_cfg.DEPTH_END,
        lid=head_cfg.get("LID", False),
        position_range=tuple(head_cfg.POSITION_RANGE),
        pe_num_feats=head_cfg.POSITIONAL_ENCODING.NUM_FEATS,
        coord_relative=head_cfg.get("COORD_RELATIVE_TO_REFERENCE", False),
        dtype=dtype,
    )
    mano = ManoLayer(center_idx=cfg.DATA_PRESET.CENTER_IDX if "DATA_PRESET" in cfg else 0)
    out = mano(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32))
    template = np.asarray(
        jnp.concatenate([out.joints, out.verts], axis=1)[0]
    )
    model = PETRMultiView(
        backbone=bb,
        head=head,
        template_mesh=template,
        num_joints=cfg.DATA_PRESET.NUM_JOINTS if "DATA_PRESET" in cfg else 21,
        center_idx=cfg.DATA_PRESET.CENTER_IDX if "DATA_PRESET" in cfg else 0,
        dtype=dtype,
    )
    return model, {"mano_layer": ManoLayer(center_idx=None)}


class FTLayer(nn.Module):
    """Feature Transform Layer (reference petr_FTL_head.py:45-72):
    lift feature channels into per-depth 3D point triplets, map them
    camera->world with P^-1, mix, map back world->camera with P, project
    back to feature channels. All 1x1 convs + tiny matmuls."""

    embed_dims: int = 256
    depth: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, cam_intr, cam_extr):
        # feat: (B, V, H, W, C)
        B, V, H, W, C = feat.shape
        d = self.depth

        def cam_p_transf(p, x):  # p: (B, V, 3, 4); x: (B, V, M, 3)
            x_h = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
            return jnp.einsum("bvij,bvmj->bvmi", p, x_h)

        from ..geometry.camera import invert_rigid

        intr_h = cam_intr.astype(jnp.float32)
        p_inv = jnp.einsum(
            "bvij,bvjk->bvik", jnp.linalg.inv(intr_h), cam_extr[..., :3, :].astype(jnp.float32)
        )
        p_fwd = jnp.einsum(
            "bvij,bvjk->bvik", intr_h, invert_rigid(cam_extr.astype(jnp.float32))[..., :3, :]
        )

        x = nn.Conv(3 * d, (1, 1), dtype=self.dtype, name="conv1")(feat)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln1")(x))
        pts = x.reshape(B, V, H * W * d, 3).astype(jnp.float32)
        pts = cam_p_transf(p_inv, pts)  # camera -> world triplets

        x = pts.reshape(B, V, H, W, 3 * d).astype(self.dtype)
        x = nn.Conv(3 * d, (1, 1), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln2")(x))

        pts = x.reshape(B, V, H * W * d, 3).astype(jnp.float32)
        pts = cam_p_transf(p_fwd, pts)  # world -> camera
        x = pts.reshape(B, V, H, W, 3 * d).astype(self.dtype)
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="conv3")(x)
        return nn.LayerNorm(dtype=self.dtype, name="ln3")(x)


@HEAD.register_module("PETRHead_FTL")
class PETRHeadFTL(PETRHead):
    """PETR head with the feature-transform-layer memory
    (reference lib/models/heads/petr_FTL_head.py:27-124): image tokens
    are geometry-mixed by FTL instead of carrying a frustum embedding,
    and queries come from sine-embedded reference points only."""

    @nn.compact
    def __call__(
        self,
        feat,
        view_mask,
        cam_intr,
        cam_extr,
        template_mesh,
        inp_res=(256, 256),
        deterministic: bool = True,
    ):
        B, V, H, W, _ = feat.shape
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="input_proj")(feat)

        sin = sine_positional_encoding_3d(view_mask, H, W, num_feats=self.pe_num_feats)
        sin = nn.Conv(self.embed_dims * 4, (1, 1), dtype=self.dtype, name="adapt_pos3d_1")(
            sin.astype(self.dtype)
        )
        sin = nn.relu(sin)
        pos_embed = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="adapt_pos3d_2")(sin)

        ftl = FTLayer(self.embed_dims, self.depth_num, dtype=self.dtype, name="ftl")(
            x, cam_intr, cam_extr
        )

        memory = ftl.reshape(B, V * H * W, self.embed_dims)
        memory_pos = pos_embed.reshape(B, V * H * W, self.embed_dims)
        token_mask = jnp.repeat(view_mask, H * W, axis=1)

        reference_points = self.param(
            "reference_points", nn.initializers.uniform(scale=1.0), (self.num_query, 3)
        )
        q_in = pos2posemb3d(reference_points, self.embed_dims // 2)
        query_embed = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_embedding_1")(
            q_in.astype(self.dtype)
        )
        query_embed = nn.relu(query_embed)
        query_embed = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_embedding_2")(
            query_embed
        )
        query_embed = jnp.broadcast_to(query_embed[None], (B,) + query_embed.shape)

        outs = PETRTransformer(
            self.embed_dims, self.num_preds, self.num_heads,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout, dtype=self.dtype, name="transformer",
        )(memory, memory_pos, token_mask, query_embed, deterministic)
        outs = jnp.nan_to_num(outs.astype(jnp.float32))

        ref_sig = nn.sigmoid(jnp.broadcast_to(reference_points[None], (B, self.num_query, 3)))
        return _petr_reg_levels(
            outs, ref_sig, self.num_preds, self.num_reg_fcs,
            self.embed_dims, self.coord_relative, self.position_range, self.dtype,
        )


MODEL.register_module("PETRMultiView", module=create_petr_model)
