"""Torch-differential parity for the MVP baseline head.

Loads the REFERENCE ``lib/models/heads/mvp_head.py`` +
``lib/models/layers/mvp_decoder.py`` with their real numeric chain, the
custom ``Deformable`` CUDA extension replaced by a pure-torch oracle of
``DeformFunction.forward`` (mvp_decoder.py:66-76) — per level, bilinear
sampling of the per-head value slices at ``2*loc-1`` with
``align_corners=False`` and attention-weight folding — and diffs our
flax ``MVPHead`` (poem_v2_tpu/models/mvp.py) per decoder layer on
converted weights.
"""

import importlib.machinery
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.parity

REF = "/root/reference"


# ------------------------------------------------------------------ stubs
class _DummyLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


class _MiniRegistry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls

        return deco

    def __call__(self, *a, **k):
        return self.register_module()


class _CN(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return dict.get(self, k, default)


class _ManoOut:
    def __init__(self, verts, joints):
        self.verts = verts
        self.joints = joints


class _StubManoLayer:
    """manotorch.ManoLayer facade over OUR JAX MANO layer — both sides of
    the differential get identical MANO numerics (axisang, no PCA,
    flat_hand_mean, reference mvp_head.py:126-131)."""

    def __init__(self, joint_rot_mode="axisang", use_pca=False, ncomps=45,
                 mano_assets_root=None, center_idx=None, flat_hand_mean=True, **kw):
        from poem_v2_tpu.mano import ManoLayer

        assert joint_rot_mode == "axisang" and not use_pca and flat_hand_mean
        assert ncomps == 45, "full axis-angle pose only"
        self._layer = ManoLayer(center_idx=center_idx, flat_hand_mean=flat_hand_mean)

    def __call__(self, pose, betas):
        import jax.numpy as jnp

        out = self._layer(jnp.asarray(pose.detach().numpy()),
                          jnp.asarray(betas.detach().numpy()))
        return _ManoOut(verts=torch.from_numpy(np.asarray(out.verts)),
                        joints=torch.from_numpy(np.asarray(out.joints)))


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _stub_package(name):
    mod = _stub_module(name)
    mod.__path__ = []
    mod.__spec__.submodule_search_locations = []
    return mod


def _load_ref_module(fullname, relpath):
    spec = importlib.util.spec_from_file_location(fullname, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------- pure-torch oracles
def _torch_inverse_sigmoid(x, eps=1e-5):
    # transform.py:1145-1161
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def _torch_cam_extr_transf(batch_cam_extr, batch_joints):
    # transform.py:898-911
    res = (batch_cam_extr[..., :3, :3] @ batch_joints.transpose(2, 3)).transpose(2, 3)
    return res + batch_cam_extr[..., :3, 3].unsqueeze(2)


def _torch_cam_intr_projection(batch_cam_intr, batch_joints, eps=1e-7):
    # transform.py:914-930
    res = (batch_cam_intr @ batch_joints.transpose(2, 3)).transpose(2, 3)
    xy = res[..., 0:2]
    z = res[..., 2:].clone()
    z[torch.abs(z) < eps] = eps
    return xy / z


def _deform_forward(value, spatial_shapes, level_start_index, sampling_locations,
                    attention_weights, im2col_step):
    """CPU oracle of the Deformable CUDA forward: multi-scale deformable
    attention (bilinear, zeros padding, align_corners=False)."""
    N, S, M, D = value.shape
    _, Lq, M, L, P, _ = sampling_locations.shape
    out_per_level = []
    for lid in range(L):
        H, W = int(spatial_shapes[lid, 0]), int(spatial_shapes[lid, 1])
        s0 = int(level_start_index[lid])
        v = value[:, s0:s0 + H * W]  # (N, HW, M, D)
        v = v.permute(0, 2, 3, 1).reshape(N * M, D, H, W)
        g = 2 * sampling_locations[:, :, :, lid] - 1  # (N, Lq, M, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(N * M, Lq, P, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                align_corners=False)  # (N*M, D, Lq, P)
        out_per_level.append(sampled)
    stacked = torch.stack(out_per_level, dim=-2)  # (N*M, D, Lq, L, P)
    w = attention_weights.permute(0, 2, 1, 3, 4).reshape(N * M, 1, Lq, L, P)
    out = (stacked * w).sum((-2, -1))  # (N*M, D, Lq)
    return out.reshape(N, M * D, Lq).transpose(1, 2).contiguous()


@pytest.fixture(scope="module")
def ref_mvp():
    from helpers import restore_stub_modules, snapshot_stub_modules

    saved = snapshot_stub_modules()
    try:
        _stub_module("Deformable", deform_forward=_deform_forward,
                     deform_backward=None)
        mano_pkg = _stub_package("manotorch")
        _stub_module("manotorch.manolayer", ManoLayer=_StubManoLayer)
        mano_pkg.manolayer = sys.modules["manotorch.manolayer"]

        _stub_package("lib")
        _stub_package("lib.models")
        _stub_package("lib.models.bricks")
        _stub_package("lib.models.layers")
        _stub_package("lib.models.heads")
        _stub_package("lib.utils")
        _stub_module("lib.utils.logger", logger=_DummyLogger())
        _stub_module("lib.utils.config", CN=_CN)
        _stub_module("lib.utils.misc", param_size=lambda m: 0)
        _stub_module("lib.utils.net_utils", xavier_init=lambda *a, **k: None)
        _stub_module(
            "lib.utils.transform",
            inverse_sigmoid=_torch_inverse_sigmoid,
            batch_cam_extr_transf=_torch_cam_extr_transf,
            batch_cam_intr_projection=_torch_cam_intr_projection,
        )
        _stub_module("lib.utils.builder", HEAD=_MiniRegistry())
        _stub_module("lib.models.bricks.transformer",
                     build_transformer=lambda *a, **k: None)
        conv = _load_ref_module("lib.models.bricks.conv", "lib/models/bricks/conv.py")
        sys.modules["lib.models.bricks"].conv = conv
        dec = _load_ref_module(
            "lib.models.layers.mvp_decoder", "lib/models/layers/mvp_decoder.py")
        # the reference's `import Deformable as DF` sits in a try/except
        # that silently leaves DF unbound when the CUDA ext is absent;
        # bind the oracle explicitly
        dec.DF = sys.modules["Deformable"]
        sys.modules["lib.models.layers"].mvp_decoder = dec
        head = _load_ref_module("lib.models.heads.mvp_head", "lib/models/heads/mvp_head.py")
        yield types.SimpleNamespace(dec=dec, head=head)
    finally:
        restore_stub_modules(saved)


# ------------------------------------------------------------- fixture cfg
E = 32          # d_model
NH = 4          # heads
NP = 2          # sampling points per (head, level)
NLAYER = 2      # decoder layers
B, V = 2, 3
INP = 64        # input image resolution
PRANGE = [-0.6, -0.6, 0.0, 0.6, 0.6, 1.2]
FEAT_SIZE = [32, 24, 16]      # channels of the three DEEPEST levels
LVL_SHAPES = [(4, 4), (8, 8), (16, 16)]  # deepest-first (H, W)


def _ref_cfg():
    return _CN(
        NUM_QUERY=21,
        DEPTH_NUM=8,
        POSITION_RANGE=PRANGE,
        LID=False,
        DEPTH_START=0.0,
        DEPTH_END=1.2,
        EMBED_DIMS=E,
        IN_CHANNELS=FEAT_SIZE[0],
        MANO_POSE_NCOMPS=45,
        CENTER_IDX=0,
        NUM_PREDS=NLAYER,
        NUM_REG_FCS=2,
        FEAT_SIZE=FEAT_SIZE,
        DATA_PRESET=_CN(NUM_JOINTS=21),
        DECODER=_CN(
            IMAGE_SIZE=[INP, INP],
            d_model=E,
            dim_feedforward=2 * E,
            dropout=0.0,
            activation="relu",
            num_feature_levels=1,
            nhead=NH,
            dec_n_points=NP,
            detach_refpoints_cameraprj_firstlayer=True,
            fuse_view_feats="mean",
            CAMERA_NUM=V,
            projattn_posembed_mode="use_rayconv",
            num_decoder_layers=NLAYER,
            return_intermediate_dec=True,
        ),
    )


def _fixture_batch(seed=11):
    rs = np.random.RandomState(seed)
    # 4 backbone levels (B, V, C, H, W), shallowest first (PETR.py:93-99)
    mlvl = [
        rs.normal(0, 1.0, (B, V, 8, 32, 32)).astype(np.float32),
        rs.normal(0, 1.0, (B, V, FEAT_SIZE[2]) + LVL_SHAPES[2]).astype(np.float32),
        rs.normal(0, 1.0, (B, V, FEAT_SIZE[1]) + LVL_SHAPES[1]).astype(np.float32),
        rs.normal(0, 1.0, (B, V, FEAT_SIZE[0]) + LVL_SHAPES[0]).astype(np.float32),
    ]
    intr = np.zeros((B, V, 3, 3), np.float32)
    intr[..., 0, 0] = 60.0 + rs.rand(B, V) * 5
    intr[..., 1, 1] = 60.0 + rs.rand(B, V) * 5
    intr[..., 0, 2] = INP / 2 + rs.randn(B, V)
    intr[..., 1, 2] = INP / 2 + rs.randn(B, V)
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for b in range(B):
        for v in range(V):
            a = rs.randn(3) * 0.2
            ca, sa = np.cos(a), np.sin(a)
            rx = np.array([[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
            ry = np.array([[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]])
            rz = np.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
            extr[b, v, :3, :3] = (rz @ ry @ rx).astype(np.float32)
            extr[b, v, :3, 3] = rs.randn(3) * 0.05
    return mlvl, intr, extr


def test_mvp_head_forward_parity(ref_mvp):
    import jax
    import jax.numpy as jnp

    from poem_v2_tpu.mano import ManoLayer
    from poem_v2_tpu.models.mvp import MVPHead
    from poem_v2_tpu.utils.torch_convert import convert_mvp_head

    mlvl, intr, extr = _fixture_batch()

    # ---- reference forward -------------------------------------------
    torch.manual_seed(0)
    ref = ref_mvp.head.MVPHead(_ref_cfg())
    ref.eval()
    img_metas = {
        "cam_intr": torch.from_numpy(intr),
        "cam_extr": torch.from_numpy(extr),
    }
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(m) for m in mlvl], img_metas,
                      template_mesh=None)
    ref_coords = ref_out["all_coords_preds"].numpy()      # (L, B, 799, 3)
    ref_mano = ref_out["mano_pose_shape"].numpy()         # (L, B, 58)

    # ---- ours on converted weights ------------------------------------
    head = MVPHead(
        embed_dims=E, num_layers=NLAYER, num_heads=NH, num_points=NP,
        d_ffn=2 * E, dropout=0.0, center_idx=0,
        position_range=tuple(PRANGE), image_size=(INP, INP),
        delayer_norm="frozen_bn", mano_layer=ManoLayer(center_idx=0),
    )
    mlvl_j = [jnp.asarray(np.transpose(m, (0, 1, 3, 4, 2))) for m in mlvl]
    view_mask = jnp.ones((B, V), bool)
    variables = head.init(
        jax.random.PRNGKey(0), mlvl_j, view_mask, jnp.asarray(intr),
        jnp.asarray(extr),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    state = {k: v for k, v in ref.state_dict().items()}
    used = convert_mvp_head(state, params)
    leftover = [k for k in state if k not in set(used)]
    assert not leftover, f"unconverted torch keys: {leftover[:8]}"

    with jax.default_matmul_precision("highest"):
        out = head.apply(
            {"params": params}, mlvl_j, view_mask, jnp.asarray(intr),
            jnp.asarray(extr), deterministic=True,
        )
    got = np.asarray(out["all_coords_preds"], np.float32)
    got_mano = np.asarray(out["mano_pose_shape"], np.float32)

    assert got.shape == ref_coords.shape
    for lvl in range(NLAYER):
        err_m = np.abs(got_mano[lvl] - ref_mano[lvl]).max()
        assert err_m < 1e-4, f"layer {lvl}: mano params deviation {err_m}"
        err = np.abs(got[lvl] - ref_coords[lvl]).max()
        assert err < 1e-4, f"layer {lvl}: coords deviation {err}"
