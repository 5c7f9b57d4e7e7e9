"""Torch-differential parity: PETR baseline head vs the reference.

Runs the REAL reference ``PETRHead`` (lib/models/heads/petr_head.py:31-222)
with the REAL ``PETRTransformer`` decoder stack
(lib/models/layers/petr_transformer.py:25-165 — post-norm DETR layers via
the mmcv-style kit lib/models/bricks/transformer.py) on CPU, converts the
full state dict with :func:`poem_v2_tpu.utils.torch_convert.convert_petr_head`,
and diffs ``all_coords_preds`` against our flax PETRHead on an identical
fixture batch. Covers exactly the glue structural tests can't see: the
frustum embedding's depth-major channel packing, the blocked sine-PE
layout through adapt_pos3d, the n/h/w token flatten order, packed-QKV
attention conversion, the post-norm applied to every intermediate, and
the SHARED reg branch across prediction levels.
"""

from __future__ import annotations

import copy
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch-differential tier: pytest -m parity


# ---------------------------------------------------------------- stubs
class _CN(dict):
    """Attribute-access dict standing in for the reference's yacs CN."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def defrost(self):
        pass

    def freeze(self):
        pass

    def set_new_allowed(self, *a, **k):
        pass

    def merge_from_other_cfg(self, other):
        self.update(other)


class _MiniRegistry:
    name = "mini"

    def __init__(self):
        self._m = {}

    def register_module(self, name=None):
        def deco(cls):
            self._m[name or cls.__name__] = cls
            return cls

        return deco

    def get(self, name):
        return self._m.get(name)


def _build_from_cfg(cfg, registry, **kwargs):
    cls = registry.get(cfg.TYPE)
    assert cls is not None, cfg.TYPE
    return cls(cfg)


class _DummyLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


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


def _torch_inverse_sigmoid(x, eps=1e-5):
    # mirrors lib/utils/transform.py:1145-1161
    x = x.clamp(min=0, max=1)
    x1 = x.clamp(min=eps)
    x2 = (1 - x).clamp(min=eps)
    return torch.log(x1 / x2)


@pytest.fixture(scope="module")
def ref_petr():
    from helpers import restore_stub_modules, snapshot_stub_modules

    saved = snapshot_stub_modules()
    try:
        regs = {
            name: _MiniRegistry()
            for name in (
                "ATTENTION", "FEEDFORWARD_NETWORK", "TRANSFORMER",
                "TRANSFORMER_LAYER", "TRANSFORMER_LAYER_SEQUENCE", "HEAD",
                "POSITIONAL_ENCODING",
            )
        }
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
        _stub_module("lib.utils.transform", inverse_sigmoid=_torch_inverse_sigmoid)
        _stub_module("lib.utils.builder", build_from_cfg=_build_from_cfg, **regs)

        kit = _load_ref_module("lib.models.bricks.transformer", "lib/models/bricks/transformer.py")
        sys.modules["lib.models.bricks"].transformer = kit
        petr_tr = _load_ref_module(
            "lib.models.layers.petr_transformer", "lib/models/layers/petr_transformer.py"
        )
        sys.modules["lib.models.layers"].petr_transformer = petr_tr
        petr_head = _load_ref_module("lib.models.heads.petr_head", "lib/models/heads/petr_head.py")
        yield types.SimpleNamespace(kit=kit, petr_tr=petr_tr, petr_head=petr_head, CN=_CN)
    finally:
        restore_stub_modules(saved)


# ------------------------------------------------------------- fixture cfg
E = 256         # embed dims — the reference head hardcodes its query
                # pos2posemb3d at 128 feats (petr_head.py:176), so only
                # embed 256 satisfies its own query_embedding input width
NH = 8          # heads
FF = 256        # ffn hidden
NQ = 21         # queries
NL = 3          # decoder layers == prediction levels
D = 8           # depth bins
CIN = 32        # backbone feature channels
B, V, H, W = 2, 2, 8, 8
INP = 64        # input image resolution
PRANGE = (-0.6, -0.6, 0.0, 0.6, 0.6, 1.2)


def _ref_cfg():
    attn = _CN(TYPE="PETRMultiheadAttention", EMBED_DIMS=E, NUM_HEADS=NH,
               ATTN_DROP=0.0, PROJ_DROP=0.0, BATCH_FIRST=False)
    ffn = _CN(TYPE="FFN", EMBED_DIMS=E, FEEDFORWARD_CHANNELS=FF, NUM_FCS=2,
              FFN_DROP=0.0)
    layer = _CN(
        TYPE="PETRTransformerDecoderLayer",
        ATTN_CFGS=[attn, copy.deepcopy(attn)],
        FFN_CFGS=ffn,
        OPERATION_ORDER=("self_attn", "norm", "cross_attn", "norm", "ffn", "norm"),
        WITH_CP=False,
        BATCH_FIRST=False,
    )
    decoder = _CN(
        TYPE="PETRTransformerDecoderLayerSequence",
        TRANSFORMER_LAYER=layer,
        NUM_LAYERS=NL,
        RETURN_INTERMEDIATE=True,
        POST_NORM=True,
    )
    return _CN(
        TRANSFORMER=_CN(TYPE="PETRTransformer", ENCODER=None, DECODER=decoder),
        POSITIONAL_ENCODING=_CN(NUM_FEATS=E // 2, NORMALIZE=True),
        DATA_PRESET=_CN(NUM_JOINTS=21),
        WITH_POSITION=True,
        WITH_MULTIVIEW=True,
        NUM_QUERY=NQ,
        DEPTH_NUM=D,
        POSITION_RANGE=list(PRANGE),
        LID=False,
        DEPTH_START=0.0,
        DEPTH_END=1.2,
        EMBED_DIMS=E,
        IN_CHANNELS=CIN,
        NUM_PREDS=NL,
        NUM_REG_FCS=2,
    )


def _fixture_batch(seed=3):
    rs = np.random.RandomState(seed)
    feat = rs.normal(0, 1.0, (B, V, CIN, H, W)).astype(np.float32)
    intr = np.zeros((B, V, 3, 3), np.float32)
    intr[..., 0, 0] = 60.0 + rs.rand(B, V) * 5
    intr[..., 1, 1] = 60.0 + rs.rand(B, V) * 5
    intr[..., 0, 2] = INP / 2 + rs.randn(B, V)
    intr[..., 1, 2] = INP / 2 + rs.randn(B, V)
    intr[..., 2, 2] = 1.0
    # camera->master rigid transforms with small rotations
    extr = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    for b in range(B):
        for v in range(V):
            a = rs.randn(3) * 0.2
            t = rs.randn(3) * 0.05
            ca, sa = np.cos(a), np.sin(a)
            rx = np.array([[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
            ry = np.array([[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]])
            rz = np.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
            extr[b, v, :3, :3] = (rz @ ry @ rx).astype(np.float32)
            extr[b, v, :3, 3] = t
    template = (rs.randn(NQ, 3) * 0.05).astype(np.float32)
    return feat, intr, extr, template


def test_petr_head_forward_parity(ref_petr):
    import jax
    import jax.numpy as jnp

    from poem_v2_tpu.models.petr import PETRHead
    from poem_v2_tpu.utils.torch_convert import convert_petr_head

    feat, intr, extr, template = _fixture_batch()

    # ---- reference forward -------------------------------------------
    torch.manual_seed(0)
    ref = ref_petr.petr_head.PETRHead(_ref_cfg())
    ref.eval()
    ft = torch.from_numpy(feat)
    mlvl = [ft, ft]  # only level 1 is consumed; level 0 supplies .device
    img_metas = {
        "inp_img_shape": (INP, INP),
        "cam_intr": torch.from_numpy(intr),
        "cam_extr": torch.from_numpy(extr),
    }
    with torch.no_grad():
        ref_out = ref(mlvl, img_metas, torch.from_numpy(template))
    ref_coords = ref_out["all_coords_preds"].numpy()  # (NL, B, NQ, 3)

    # ---- ours on converted weights ------------------------------------
    head = PETRHead(
        embed_dims=E, in_channels=CIN, num_query=NQ, num_preds=NL,
        num_reg_fcs=2, depth_num=D, depth_start=0.0, depth_end=1.2,
        lid=False, position_range=PRANGE, pe_num_feats=E // 2,
        num_heads=NH, feedforward_channels=FF, dropout=0.0,
    )
    feat_j = jnp.asarray(np.transpose(feat, (0, 1, 3, 4, 2)))  # (B,V,H,W,C)
    view_mask = jnp.ones((B, V), bool)
    variables = head.init(
        jax.random.PRNGKey(0), feat_j, view_mask, jnp.asarray(intr),
        jnp.asarray(extr), jnp.asarray(template), inp_res=(INP, INP),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    state = {k: v for k, v in ref.state_dict().items()}
    used = convert_petr_head(state, params)
    leftover = [k for k in state if k not in set(used)]
    assert not leftover, f"unconverted torch keys: {leftover[:8]}"

    with jax.default_matmul_precision("highest"):
        out = head.apply(
            {"params": params}, feat_j, view_mask, jnp.asarray(intr),
            jnp.asarray(extr), jnp.asarray(template), inp_res=(INP, INP),
            deterministic=True,
        )
    got = np.asarray(out["all_coords_preds"], np.float32)

    assert got.shape == ref_coords.shape
    for lvl in range(NL):
        err = np.abs(got[lvl] - ref_coords[lvl]).max()
        assert err < 1e-4, f"level {lvl}: max deviation {err}"
