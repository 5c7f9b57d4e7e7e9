"""METRO single-view baseline (flax).

TPU re-design of the vendored METRO hand network
(lib/external/metro/base_model.py:37-267 + metro.py:33-140): a global
CNN feature is broadcast to 216 tokens (21 joints + 195 coarse
vertices), concatenated with the template-mesh token positions, run
through 3 BERT-style encoder blocks with decreasing widths
(1024/256/64 hidden; 512/128/3 outputs) with learned positional
embeddings and a linear "cls head" dimensionality reduction + residual,
then the coarse vertices are upsampled 195 -> 778 with a learned linear
map. A weak-perspective camera head regresses (s, tx, ty).

The mesh down/upsampling matrices (reference assets/mano_downsampling.npz,
base_model.py:346-420) are synthesised deterministically from the MANO
template via farthest-point vertex selection + nearest-vertex averaging
when the original asset is absent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..mano import ManoLayer
from ..utils.registry import MODEL
from .bricks.attention import BertFFN, MultiHeadCrossAttention


def load_mesh_sampler(path: str):
    """Load the reference METRO mesh sampler ``mano_downsampling.npz``.

    Format (external/metro/base_model.py:336-344): npz with object arrays
    ``A`` (adjacency), ``U`` (upsampling), ``D`` (downsampling) holding
    scipy sparse matrices. Returns dense float32 ``(D0 (n_sub, 778),
    U0 (778, n_sub))`` — the single-level sampler the reference uses
    (MeshSampler num_downsampling=1).
    """
    data = np.load(path, allow_pickle=True, encoding="latin1")

    def _dense(m):
        if hasattr(m, "todense"):
            return np.asarray(m.todense(), dtype=np.float32)
        return np.asarray(m, dtype=np.float32)

    return _dense(data["D"][0]), _dense(data["U"][0])


def synthetic_mesh_sampler(v_template: np.ndarray, n_sub: int = 195, k: int = 3):
    """Deterministic (D (n_sub, 778), U (778, n_sub)) sampling matrices."""
    n = v_template.shape[0]
    # farthest point selection of n_sub vertices
    chosen = [0]
    d = np.linalg.norm(v_template - v_template[0], axis=1)
    for _ in range(n_sub - 1):
        idx = int(np.argmax(d))
        chosen.append(idx)
        d = np.minimum(d, np.linalg.norm(v_template - v_template[idx], axis=1))
    chosen = np.asarray(chosen)

    D = np.zeros((n_sub, n), dtype=np.float32)
    D[np.arange(n_sub), chosen] = 1.0

    # upsample: each full vertex = inverse-distance blend of k nearest chosen
    U = np.zeros((n, n_sub), dtype=np.float32)
    sub_pos = v_template[chosen]
    for v in range(n):
        dist = np.linalg.norm(sub_pos - v_template[v], axis=1)
        nearest = np.argsort(dist)[:k]
        w = 1.0 / (dist[nearest] + 1e-6)
        U[v, nearest] = w / w.sum()
    return D, U


class METROEncoderBlock(nn.Module):
    """BERT encoder + learned positional embeddings + cls-head reduction.

    Reference base_model.py:37-188 (METRO_Encoder + METROBlock).
    """

    hidden_size: int
    output_dim: int
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    max_positions: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, S, _ = tokens.shape
        pos_table = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_positions, self.hidden_size),
        )
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="img_embedding")(tokens)
        x = x + pos_table[None, :S].astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = MultiHeadCrossAttention(
                self.hidden_size, self.num_heads, self.dropout, dtype=self.dtype,
                name=f"layer{i}_attn",
            )(x, x, deterministic=deterministic)
            x = BertFFN(
                self.hidden_size, self.hidden_size * 4, self.dropout, dtype=self.dtype,
                name=f"layer{i}_ffn",
            )(x, deterministic=deterministic)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="cls_head")(x)
        res = nn.Dense(self.output_dim, dtype=self.dtype, name="residual")(tokens)
        return out + res


class METRONetwork(nn.Module):
    """Single-view METRO hand network."""

    backbone: nn.Module
    downsample_mat: Optional[object] = None  # np (195, 778)
    upsample_init: Optional[object] = None  # np (778, 195) for the linear init
    template_joints: Optional[object] = None  # np (21, 3) root-relative
    template_verts_sub: Optional[object] = None  # np (195, 3) root-relative
    input_feat_dims: Tuple[int, ...] = (2051, 512, 128)
    hidden_feat_dims: Tuple[int, ...] = (1024, 256, 64)
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        B = image.shape[0]
        feats = self.backbone(image.astype(self.dtype))
        global_feat = feats["res_layer4_mean"] if isinstance(feats, dict) else jnp.mean(
            feats[-1], axis=(1, 2)
        )
        gdim = global_feat.shape[-1]

        tj = jnp.asarray(self.template_joints, dtype=jnp.float32)
        tv = jnp.asarray(self.template_verts_sub, dtype=jnp.float32)
        ref = jnp.concatenate([tj, tv], axis=0)  # (216, 3)
        S = ref.shape[0]

        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(ref[None], (B, S, 3)).astype(self.dtype),
                jnp.broadcast_to(global_feat[:, None], (B, S, gdim)),
            ],
            axis=-1,
        )

        output_dims = tuple(self.input_feat_dims[1:]) + (3,)
        x = tokens
        for i, (h, o) in enumerate(zip(self.hidden_feat_dims, output_dims)):
            x = METROEncoderBlock(
                hidden_size=h, output_dim=o, num_layers=self.num_layers,
                num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=not train)

        coords = x.astype(jnp.float32)  # (B, 216, 3)
        pred_joints = coords[:, :21]
        pred_verts_sub = coords[:, 21:]

        # 195 -> 778 learned upsampling (base_model.py:200,259-261)
        up = nn.Dense(
            778,
            dtype=self.dtype,
            name="upsampling",
            kernel_init=(
                (lambda key, shape, dtype=jnp.float32: jnp.asarray(self.upsample_init.T))
                if self.upsample_init is not None
                else nn.initializers.lecun_normal()
            ),
        )
        pred_verts = jnp.swapaxes(
            up(jnp.swapaxes(pred_verts_sub, 1, 2).astype(self.dtype)), 1, 2
        ).astype(jnp.float32)

        # weak-perspective camera head (base_model.py:201-203,252-258)
        cam = nn.Dense(1, dtype=self.dtype, name="cam_param_fc")(coords.astype(self.dtype))
        cam = jnp.swapaxes(cam, 1, 2)  # (B, 1, 216)
        cam = nn.Dense(150, dtype=self.dtype, name="cam_param_fc2")(cam)
        cam = nn.Dense(3, dtype=self.dtype, name="cam_param_fc3")(cam)[:, 0]

        return {
            "pred_joints_3d_rel": pred_joints,
            "pred_verts_sub_3d_rel": pred_verts_sub,
            "pred_verts_3d_rel": pred_verts,
            "pred_cam": cam.astype(jnp.float32),
        }


def create_metro_model(cfg=None, dtype=jnp.float32):
    from .backbones.resnet import ResNet

    backbone_cfg = cfg.BACKBONE if cfg is not None and "BACKBONE" in cfg else None
    if backbone_cfg is not None and backbone_cfg.TYPE.lower().startswith("resnet"):
        bb = ResNet.from_config(backbone_cfg, dtype=dtype)
    else:
        bb = ResNet(arch="resnet50", norm="gn", dtype=dtype)

    mano = ManoLayer(center_idx=0)
    out = mano(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32))
    joints = np.asarray(out.joints[0])
    verts = np.asarray(out.verts[0])
    sampler_path = cfg.get("MESH_SAMPLER_PATH", None) if cfg is not None else None
    if sampler_path:
        # original reference sampling matrices (assets/mano_downsampling.npz)
        D, U = load_mesh_sampler(sampler_path)
    else:
        D, U = synthetic_mesh_sampler(verts)
    verts_sub = D @ verts

    model = METRONetwork(
        backbone=bb,
        downsample_mat=D,
        upsample_init=U,
        template_joints=joints,
        template_verts_sub=verts_sub,
        input_feat_dims=tuple(cfg.INPUT_FEAT_DIM) if cfg is not None and "INPUT_FEAT_DIM" in cfg else (2051, 512, 128),
        hidden_feat_dims=tuple(cfg.HIDDEN_FEAT_DIM) if cfg is not None and "HIDDEN_FEAT_DIM" in cfg else (1024, 256, 64),
        dtype=dtype,
    )
    return model, {"mano_layer": mano, "downsample": D, "upsample": U}


MODEL.register_module("METRO", module=create_metro_model)
