"""POEM: Point-Embedded Multi-view Stereo model (flax).

TPU-native re-design of the reference ``PtEmbedMultiviewStereoV2``
(lib/models/POEM.py:30-333). One static-shape SPMD forward:

  images (B, V, 256, 256, 3) padded to V_max with a (B, V) view mask
  -> backbone (per view, batched as B*V)
  -> feat neck (BN, 32, 32, C) + heatmap neck -> integral 2D joints
  -> reference joints: train = GT + noise (reference POEM.py:274-281);
     eval = masked batched DLT triangulation of the predicted 2D joints
     (POEM.py:285-299), falling back to GT for single-view samples
     (POEM.py:282-283)
  -> POEM generalized head (BPS fusion + point-embedded decoder).

The reference's ragged (ΣN_i) batching and all its per-sample loops are
gone; every sample has the same shape and the mask carries raggedness.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import invert_rigid
from ..geometry.heatmap import integral_heatmap2d, normalize_heatmap
from ..geometry.triangulation import triangulate_dlt
from ..mano import ManoLayer
from ..utils.config import Config
from ..utils.registry import MODEL
from .backbones.resnet import ResNet
from .backbones.hrnet import HRNet
from .heads.ptemb_head import POEMGeneralizedHead, generate_bps_basis
from .neck import HRNetFeatNeck, ResNetFeatNeck, UVDecodeNeck


class POEMNet(nn.Module):
    """End-to-end POEM forward. See module docstring."""

    backbone: nn.Module
    feat_neck: nn.Module
    uv_neck: nn.Module
    head: nn.Module
    num_joints: int = 21
    center_idx: int = 0  # DATA_PRESET.CENTER_IDX (root for noise jitter)
    # train-time ref-joint noise std in metres (reference POEM.py:275-276
    # hardcodes 0.01; configurable via MODEL.REF_NOISE so overfit/fine-tune
    # protocols can anneal the anchor jitter)
    ref_noise: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, V, H, W, 3)
        view_mask: jnp.ndarray,  # (B, V) bool
        cam_intr: jnp.ndarray,  # (B, V, 3, 3)
        cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->master
        master_joints_3d: Optional[jnp.ndarray] = None,  # (B, 21, 3)
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        B, V, H, W, _ = images.shape
        f32 = jnp.float32

        imgs = images.reshape(B * V, H, W, 3).astype(self.dtype)
        feats = self.backbone(imgs)
        if isinstance(feats, dict):
            pyramid = [feats[k] for k in ("res_layer1", "res_layer2", "res_layer3", "res_layer4")]
        else:
            pyramid = list(feats)

        mlvl = self.feat_neck(pyramid)  # (BN, h, w, C_in)
        uv_hmap, _ = self.uv_neck(pyramid)  # (BN, 32, 32, 21)

        # integral heatmap -> 2D joints in pixels (reference POEM.py:211-222)
        hm = jnp.transpose(uv_hmap, (0, 3, 1, 2)).astype(f32)  # (BN, 21, 32, 32)
        uv_pdf = normalize_heatmap(hm)
        uv_coord = integral_heatmap2d(uv_pdf)  # (BN, 21, 2) in [0, 1)
        uv_coord_im = uv_coord * jnp.asarray([W, H], dtype=f32)
        uv_coord_im = uv_coord_im.reshape(B, V, self.num_joints, 2)

        # ---- reference joints --------------------------------------------
        if train:
            assert master_joints_3d is not None
            gt = master_joints_3d.astype(f32)
            key = self.make_rng("noise")
            k1, k2, k3 = jax.random.split(key, 3)
            noise = self.ref_noise * (
                jax.random.normal(k1, gt.shape) + jax.random.normal(k2, (1,))
            )
            ref = gt + noise
            root = ref[:, self.center_idx][:, None]
            scale = 0.01 * (jax.random.uniform(k3, (1,)) * 2.0 - 1.0) + 1.0
            ref_joints = scale * (ref - root) + root
        else:
            extr_m2c = invert_rigid(cam_extr.astype(f32))
            tri = triangulate_dlt(uv_coord_im, cam_intr.astype(f32), extr_m2c, view_mask)
            n_views = jnp.sum(view_mask.astype(f32), axis=1)
            if master_joints_3d is not None:
                # single-view eval uses GT reference joints (reference POEM.py:282-283)
                is_single = (n_views <= 1.0)[:, None, None]
                ref_joints = jnp.where(is_single, master_joints_3d.astype(f32), tri)
            else:
                ref_joints = tri

        head_out = self.head(
            mlvl.reshape(B, V, *mlvl.shape[1:]),
            view_mask,
            cam_intr,
            cam_extr,
            ref_joints,
            inp_res=(W, H),
            deterministic=not train,
        )

        all_coords = head_out["all_coords_preds"]  # (n_blocks, B, 799, 3)
        preds: Dict[str, jnp.ndarray] = dict(head_out)
        pred_joints = all_coords[-1, :, : self.num_joints]
        pred_verts = all_coords[-1, :, self.num_joints :]
        centre = pred_joints[:, self.center_idx][:, None]
        preds.update(
            pred_joints_3d=pred_joints,
            pred_verts_3d=pred_verts,
            pred_joints_3d_rel=pred_joints - centre,
            pred_verts_3d_rel=pred_verts - centre,
            pred_joints_uv=uv_coord_im,
            pred_ref_joints_3d=ref_joints,
        )
        return preds


# repo-level static assets (the reference's released checkpoints are coupled
# to the exact contents of assets/{bps,anchor,anchor_idx}.npy — reference
# ptEmb_head.py:790-809 and point_transformers.py:10-32 load them verbatim)
import os

_ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets")


def load_static_assets(head_cfg: Config, nsample: int, radius: float, num_query: int = 799):
    """Resolve the BPS basis and init-block anchors.

    Paths come from cfg (``HEAD.BPS_PATH`` / ``HEAD.ANCHOR_PATH`` /
    ``HEAD.ANCHOR_IDX_PATH``), defaulting to the repo ``assets/`` copies of
    the reference arrays when present. An explicit cfg path is strict
    (shape mismatch raises); the implicit repo default is skipped when the
    model geometry doesn't match it (tiny test configs), falling back to
    the deterministic generator + FPS.

    Returns ``(bps (nsample, 3) meters, anchor_xyz (32, 3) normalized or
    None, anchor_idx (32,) or None)``.
    """

    def _resolve(key: str, fname: str):
        p = head_cfg.get(key, None) if hasattr(head_cfg, "get") else None
        if p:
            return p, True  # explicit: strict
        default = os.path.join(_ASSETS_DIR, fname)
        return (default if os.path.exists(default) else None), False

    bps_path, bps_strict = _resolve("BPS_PATH", "bps.npy")
    anchor_path, a_strict = _resolve("ANCHOR_PATH", "anchor.npy")
    anchor_idx_path, ai_strict = _resolve("ANCHOR_IDX_PATH", "anchor_idx.npy")

    bps = None
    if bps_path is not None:
        bps = np.load(bps_path).reshape(-1, 3).astype(np.float32)
        if bps.shape[0] != nsample:
            if bps_strict:
                raise ValueError(
                    f"BPS asset {bps_path} has {bps.shape[0]} points, cfg wants {nsample}"
                )
            bps = None
    if bps is None:
        from .heads.ptemb_head import generate_bps_basis

        bps = generate_bps_basis(nsample, radius)

    anchor_xyz = anchor_idx = None
    if anchor_path is not None and anchor_idx_path is not None:
        anchor_xyz = np.load(anchor_path).reshape(-1, 3).astype(np.float32)
        anchor_idx = np.load(anchor_idx_path).reshape(-1).astype(np.int32)
        # the shared idx gathers features from BOTH the query cloud and the
        # BPS cloud (reference anchor_points file-load semantics), so every
        # index must be valid for the smaller of the two
        if int(anchor_idx.max()) >= min(num_query, nsample):
            if a_strict or ai_strict:
                raise ValueError(
                    f"anchor_idx from {anchor_idx_path} max {int(anchor_idx.max())} "
                    f"out of range for num_query={num_query}, nsample={nsample}"
                )
            anchor_xyz = anchor_idx = None
    return bps, anchor_xyz, anchor_idx


def _default_use_flash() -> bool:
    """Pallas flash attention only lowers on real TPU backends."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform not in ("cpu",)
    return jax.default_backend() not in ("cpu",)


def create_poem_model(
    cfg: Config, dtype=jnp.float32, use_flash: bool = None, remat: bool = True,
    use_flash_train: bool = True, exact_knn: bool = False,
    knn_bf16_dist: bool = False, fused_knn: bool = None,
    fused_knn_train: bool = None,
) -> Tuple[POEMNet, Dict[str, Any]]:
    """Build a POEMNet + auxiliary constants from a reference-schema config.

    Returns (model, aux) where aux carries the MANO layer (for losses /
    joints-from-mesh metrics) and the static BPS/anchor assets.
    """
    bb_cfg = cfg.BACKBONE
    head_cfg = cfg.HEAD
    tr_cfg = head_cfg.TRANSFORMER
    norm = bb_cfg.get("NORM", "gn")

    bb_type = bb_cfg.TYPE
    if bb_type.lower().startswith("resnet"):
        backbone = ResNet(arch=bb_type.lower(), norm=norm, dtype=dtype)
        feat_size = backbone.feat_size
        feat_neck = ResNetFeatNeck(feat_size=feat_size, norm=norm, dtype=dtype)
        uv_neck = UVDecodeNeck(feat_size=feat_size, hrnet=False, norm=norm, dtype=dtype)
    elif bb_type == "HRNet":
        backbone = HRNet.from_config(bb_cfg, dtype=dtype)
        feat_size = tuple(backbone.stage4_channels)  # (40, 80, 160, 320)
        feat_neck = HRNetFeatNeck(feat_size=feat_size, norm=norm, dtype=dtype)
        uv_neck = UVDecodeNeck(feat_size=feat_size, hrnet=True, norm=norm, dtype=dtype)
    else:
        raise ValueError(f"Unsupported backbone {bb_type!r} for POEM")

    if use_flash is None:
        use_flash = _default_use_flash()
    nsample = head_cfg.N_SAMPLE
    radius = head_cfg.RADIUS_SAMPLE
    parametric = tr_cfg.get("PARAMETRIC_OUTPUT", False)
    transformer_center_idx = tr_cfg.get("TRANSFORMER_CENTER_IDX", 9)

    # static geometry assets: the reference arrays from assets/ when present
    # (ptEmb_head.py:790-809, point_transformers.py:10-32 — released
    # checkpoints are coupled to them), deterministic generation otherwise
    bps, anchor_xyz, anchor_idx = load_static_assets(head_cfg, nsample, radius)
    mano_layer = ManoLayer(center_idx=transformer_center_idx)
    # one jitted dispatch: running LBS eagerly costs ~100 op-by-op compiles
    # (minutes over a tunneled device) for a value computed once at build
    mano_out = jax.jit(mano_layer.__call__)(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
    template = np.asarray(
        jnp.concatenate([mano_out.joints, mano_out.verts], axis=1)[0]
    )  # (799, 3), centered at joint 9

    if anchor_idx is not None:
        # one shared anchor set for both init-block attentions, exactly as
        # the reference's anchor_points() file load behaves
        q_anchor_idx = pt_anchor_idx = anchor_idx
    else:
        from ..ops.points import farthest_point_sampling

        _, pt_anchor_idx = farthest_point_sampling(jnp.asarray(bps[None] / radius), 32)
        _, q_anchor_idx = farthest_point_sampling(jnp.asarray(template[None] / radius), 32)
        pt_anchor_idx = np.asarray(pt_anchor_idx[0])
        q_anchor_idx = np.asarray(q_anchor_idx[0])

    head = POEMGeneralizedHead(
        embed_dims=head_cfg.EMBED_DIMS,
        pt_feat_dim=head_cfg.POINTS_FEAT_DIM,
        in_channels=head_cfg.IN_CHANNELS,
        num_query=head_cfg.NUM_QUERY,
        nsample=nsample,
        radius=radius,
        pe_num_feats=head_cfg.POSITIONAL_ENCODING.NUM_FEATS,
        center_idx=transformer_center_idx,
        parametric_output=parametric,
        petr_embedding=bool(head_cfg.get("PETR_EMBEDDING", False)),
        depth_num=head_cfg.get("DEPTH_NUM", 32),
        depth_start=head_cfg.get("DEPTH_START", 0.0),
        depth_end=head_cfg.get("DEPTH_END", 1.2),
        lid=head_cfg.get("LID", False),
        position_range=tuple(head_cfg.get("POSITION_RANGE", (-0.6, -0.6, 0.0, 0.6, 0.6, 1.2))),
        bps_basis=bps,
        template_mesh=template,
        query_anchor_idx=np.asarray(q_anchor_idx),
        pt_anchor_idx=np.asarray(pt_anchor_idx),
        anchor_xyz=anchor_xyz,
        approx_knn=not exact_knn,
        # fused (exact Pallas) KNN follows use_flash unless overridden —
        # fused_knn=False + exact_knn=False selects the approx_max_k XLA
        # path for the `--approx_knn` eval bench (docs/performance.md)
        use_fused_knn=use_flash if fused_knn is None else fused_knn,
        # training-path fused exact KNN (custom VJP): defaults to on
        # whenever the eval fused kernels and the training Pallas kernels
        # are both on — train then selects neighbours EXACTLY like eval
        # (the reference uses exact pytorch3d KNN in both modes)
        use_fused_knn_train=(
            use_flash_train and (use_flash if fused_knn is None else fused_knn)
            if fused_knn_train is None else fused_knn_train
        ),
        knn_bf16_dist=knn_bf16_dist,
        use_fused_sampling=use_flash,
        mano_layer=mano_layer if parametric else None,
        n_blocks=tr_cfg.N_BLOCKS,
        num_heads=tr_cfg.NUM_ATTENTION_HEADS,
        dropout=tr_cfg.get("DROPOUT", 0.1),
        n_neighbor=tr_cfg.N_NEIGHBOR,
        n_neighbor_query=tr_cfg.N_NEIGHBOR_QUERY,
        use_flash=use_flash,
        use_flash_train=use_flash_train,
        remat=remat,
        decoder_type=(
            "PtEmbedTRv3"
            if tr_cfg.get("TYPE", "PtEmbedTR") == "PtEmbedTRv3"
            else "PtEmbedTR"
        ),
        dtype=dtype,
    )

    model = POEMNet(
        backbone=backbone,
        feat_neck=feat_neck,
        uv_neck=uv_neck,
        head=head,
        num_joints=cfg.DATA_PRESET.NUM_JOINTS if "DATA_PRESET" in cfg else 21,
        center_idx=cfg.DATA_PRESET.CENTER_IDX if "DATA_PRESET" in cfg else 0,
        ref_noise=float(cfg.get("REF_NOISE", 0.01)),
        dtype=dtype,
    )
    aux = {
        "mano_layer": ManoLayer(center_idx=None),
        "bps_basis": bps,
        "template_mesh": template,
        "parametric_output": parametric,
        "transformer_center_idx": transformer_center_idx,
    }
    return model, aux


# registry entry keeping the reference model name & cfg schema
MODEL.register_module("PtEmbedMultiviewStereoV2", module=create_poem_model)
