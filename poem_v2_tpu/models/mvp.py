"""MVP baseline: multi-view pose with projective deformable attention.

TPU re-design of the reference MVP stack (lib/models/MVP.py:5-9,
lib/models/heads/mvp_head.py:76-298, lib/models/layers/mvp_decoder.py:66-497):
21 joint queries are refined by decoder layers whose cross-attention
*projects* each query's current 3D position into every view and gathers
multi-scale image features around it — the reference's custom
``Deformable`` CUDA extension (mvp_decoder.py:36-94) becomes learnable
sampling offsets + the batched bilinear gather
(:func:`poem_v2_tpu.ops.sampling.grid_sample_points`), which XLA fuses
on-TPU. The final layer regresses MANO pose (6D) + shape; the mesh comes
from the first-party JAX MANO layer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.camera import project_world_to_pixel
from ..geometry.rotations import rot6d_to_aa
from ..ops.sampling import grid_sample_points, pixel_to_grid
from ..utils.registry import HEAD, MODEL
from .bricks.attention import BertFFN, MLP


class ProjectiveAttention(nn.Module):
    """Multi-scale deformable projective attention.

    For each query: project its 3D point to each view, predict
    ``num_points`` 2D offsets + attention weights per (head, level),
    bilinear-sample each pyramid level's view features, and combine
    with view masking — the TPU re-design of the reference's
    multi-scale ``ProjAttn`` CUDA op (mvp_decoder.py:97-324).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        query_xyz: jnp.ndarray,  # (B, Q, 3) world
        feats,  # (B, V, H, W, C) or list of such pyramid levels
        view_mask: jnp.ndarray,  # (B, V)
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        inp_res: Tuple[int, int],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        B, Q, C = query.shape
        V = feats[0].shape[1]
        nh, npt = self.num_heads, self.num_points
        nl = len(feats)
        hd = self.embed_dims // nh

        proj = project_world_to_pixel(query_xyz.astype(jnp.float32), cam_extr, cam_intr)
        base = pixel_to_grid(proj, inp_res)  # (B, V, Q, 2) in [-1, 1]

        # per-(head, level, point) offsets and softmax weights from the query
        offsets = nn.Dense(nh * nl * npt * 2, dtype=self.dtype, name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, nh, nl, npt, 2).astype(jnp.float32)
        weights = nn.Dense(nh * nl * npt, dtype=self.dtype, name="attention_weights")(query)
        weights = nn.softmax(weights.reshape(B, Q, nh, nl * npt), axis=-1)
        weights = weights.reshape(B, Q, nh, nl, npt)

        value_proj = nn.Dense(self.embed_dims, dtype=self.dtype, name="value_proj")

        out = jnp.zeros((B, Q, nh, hd), dtype=self.dtype)
        vm = view_mask[:, :, None, None, None].astype(self.dtype)
        n_views = jnp.maximum(jnp.sum(view_mask, axis=1).astype(self.dtype), 1.0)
        idx = jnp.arange(nh)
        for li, feat in enumerate(feats):
            H, W = feat.shape[2], feat.shape[3]
            value = value_proj(feat).reshape(B, V, H, W, nh, hd)
            off = offsets[:, :, :, li] / jnp.asarray([W, H], dtype=jnp.float32)
            pos = base[:, :, :, None, None, :] + off[:, None]  # (B, V, Q, nh, npt, 2)
            pos_flat = pos.reshape(B * V, Q * nh * npt, 2)
            val_flat = value.reshape(B * V, H, W, nh * hd)
            sampled = grid_sample_points(val_flat, pos_flat.astype(val_flat.dtype))
            sampled = sampled.reshape(B, V, Q, nh, npt, nh, hd)
            sampled = sampled[:, :, :, idx, :, idx, :]  # diag over heads
            sampled = jnp.moveaxis(sampled, 0, 3)  # (B, V, Q, nh, npt, hd)
            lvl = jnp.einsum(
                "bvqhpd,bqhp->bvqhd", sampled, weights[:, :, :, li].astype(sampled.dtype)
            )
            out = out + jnp.sum(lvl * vm, axis=1) / n_views[:, None, None, None]

        out = out.reshape(B, Q, self.embed_dims)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(out + query)


class MvPDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, query, query_xyz, feat, view_mask, cam_intr, cam_extr, inp_res,
        deterministic=True,
    ):
        # query self attention
        from .bricks.attention import MultiHeadCrossAttention

        query = MultiHeadCrossAttention(
            self.embed_dims, self.num_heads, self.dropout, dtype=self.dtype, name="self_attn"
        )(query, query, deterministic=deterministic)
        # projective cross attention
        query = ProjectiveAttention(
            self.embed_dims, self.num_heads, self.num_points, self.dropout,
            dtype=self.dtype, name="proj_attn",
        )(query, query_xyz, feat, view_mask, cam_intr, cam_extr, inp_res, deterministic)
        query = BertFFN(self.embed_dims, self.embed_dims * 4, self.dropout,
                        dtype=self.dtype, name="ffn")(query, deterministic=deterministic)
        # refine 3D positions
        delta = MLP(self.embed_dims, 3, dtype=self.dtype, name="reg_branch")(query)
        return query, query_xyz + delta.astype(query_xyz.dtype) * 0.01


@HEAD.register_module("MVPHead")
class MVPHead(nn.Module):
    """21 joint queries -> refined joints + MANO mesh (mvp_head.py:76-298)."""

    embed_dims: int = 256
    num_layers: int = 4
    num_heads: int = 8
    num_points: int = 4
    num_joints: int = 21
    dropout: float = 0.1
    mano_layer: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat,  # (B, V, H, W, C_in) or list of pyramid levels
        view_mask: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        ref_center: jnp.ndarray,  # (B, 3) initial hand centre (world)
        inp_res: Tuple[int, int] = (256, 256),
        deterministic: bool = True,
    ):
        feats = feat if isinstance(feat, (list, tuple)) else [feat]
        B = feats[0].shape[0]
        # per-level input projection (the reference projects each pyramid
        # level separately before ProjAttn, mvp_decoder.py:97-130)
        x = [
            nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(f)
            for i, f in enumerate(feats)
        ]

        query = self.param(
            "joint_queries", nn.initializers.normal(0.02), (self.num_joints, self.embed_dims)
        )
        query = jnp.broadcast_to(query[None].astype(self.dtype), (B, self.num_joints, self.embed_dims))
        query_xyz = jnp.broadcast_to(ref_center[:, None], (B, self.num_joints, 3))

        joints_per_layer = []
        for i in range(self.num_layers):
            query, query_xyz = MvPDecoderLayer(
                self.embed_dims, self.num_heads, self.num_points, self.dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(query, query_xyz, x, view_mask, cam_intr, cam_extr, inp_res, deterministic)
            joints_per_layer.append(query_xyz)

        # MANO regression from pooled query features (mvp_decoder.py:325-341)
        pooled = jnp.mean(query, axis=1)  # (B, C)
        mano_params = nn.Dense(16 * 6 + 10, dtype=self.dtype, name="mano_head")(pooled)
        pose6d = mano_params[:, :96].astype(jnp.float32)
        shape = mano_params[:, 96:].astype(jnp.float32)
        pose_aa = rot6d_to_aa(pose6d.reshape(B, 16, 6)).reshape(B, 48)
        mano_out = self.mano_layer(pose_aa, shape)

        centre = query_xyz[:, 9:10]  # align mesh at the middle-MCP query
        verts = mano_out.verts + centre
        joints = mano_out.joints + centre
        mesh = jnp.concatenate([joints, verts], axis=1)  # (B, 799, 3)
        all_coords = jnp.concatenate(
            [
                jnp.stack([jnp.concatenate([j, jnp.zeros((B, 778, 3))], axis=1) for j in joints_per_layer]),
                mesh[None],
            ],
            axis=0,
        )
        return {
            "all_coords_preds": all_coords,
            "pred_pose": pose_aa.reshape(B, 16, 3),
            "pred_shape": shape,
            "pred_joints_per_layer": jnp.stack(joints_per_layer),
        }


class MVP(nn.Module):
    """Backbone + MVPHead (reference MVP.py:5-9 subclasses PETRMultiView)."""

    backbone: nn.Module
    head: nn.Module
    num_joints: int = 21
    center_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, view_mask, cam_intr, cam_extr, master_joints_3d=None, train=False):
        B, V, H, W, _ = images.shape
        feats = self.backbone(images.reshape(B * V, H, W, 3).astype(self.dtype))
        if isinstance(feats, dict):
            levels = [feats["res_layer2"], feats["res_layer3"], feats["res_layer4"]]
        else:
            levels = list(feats[1:4])
        lvl = [f.reshape(B, V, f.shape[1], f.shape[2], f.shape[-1]) for f in levels]

        if master_joints_3d is not None:
            ref_center = master_joints_3d[:, 9]
        else:
            ref_center = jnp.tile(jnp.asarray([[0.0, 0.0, 0.6]]), (B, 1))

        preds = self.head(
            lvl, view_mask, cam_intr, cam_extr, ref_center,
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


def create_mvp_model(cfg, dtype=jnp.float32):
    from ..mano import ManoLayer
    from .backbones.resnet import ResNet

    bb = ResNet.from_config(cfg.BACKBONE, dtype=dtype)
    head_cfg = cfg.HEAD
    head = MVPHead(
        embed_dims=head_cfg.EMBED_DIMS,
        num_layers=head_cfg.get("NUM_PREDS", 4),
        num_points=head_cfg.get("NUM_POINTS", 4),
        dropout=head_cfg.get("DROPOUT", 0.1),
        mano_layer=ManoLayer(center_idx=head_cfg.get("TRANSFORMER_CENTER_IDX", 9)),
        dtype=dtype,
    )
    model = MVP(
        backbone=bb,
        head=head,
        num_joints=cfg.DATA_PRESET.NUM_JOINTS if "DATA_PRESET" in cfg else 21,
        center_idx=cfg.DATA_PRESET.CENTER_IDX if "DATA_PRESET" in cfg else 0,
        dtype=dtype,
    )
    return model, {"mano_layer": ManoLayer(center_idx=None)}


MODEL.register_module("MVP", module=create_mvp_model)
