"""FULL-MODEL differential parity vs the torch reference.

Instantiates the reference's complete flagship —
``PtEmbedMultiviewStereoV2`` (lib/models/POEM.py:250-333) with the REAL
HRNet-W40 trunk (lib/models/backbones/hrnet.py:242-455), the real necks
(POEM.py:59-112), the real ``POEM_Generalized_Head``
(lib/models/heads/ptEmb_head.py:684-964 incl. SinePositionalEncoding3D,
generate_grid_sample_proj and the released bps.npy/anchor npys) and the
real 3-block ``PtEmbedTRv4`` — runs ``_forward_impl`` in test mode on a
fixture batch, converts the whole state dict with
``utils/torch_convert.convert_poem_checkpoint``, and diffs every stage
of the flax model's forward against it:

  heatmap uv coords -> DLT reference joints -> per-block decoder
  coordinates -> final joints/verts.

manotorch is stubbed with the repo's synthetic MANO constants fed to
BOTH sides (the licensed MANO_RIGHT.pkl is absent by design), exact KNN
everywhere, fp32 with ``default_matmul_precision('highest')``.

This is the local substitute for the (environment-impossible)
released-checkpoint metric gate: it proves the ASSEMBLED graph —
HRNet/neck conversion at full width, heatmap normalization, grid-sample
projection, sine PE + BPS wiring — matches, not just each module.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys
import types
from typing import NamedTuple

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch-differential tier: pytest -m parity

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "assets")


# --------------------------------------------------------------------------
# stubs
# --------------------------------------------------------------------------

class _ManoOut(NamedTuple):
    verts: "torch.Tensor"
    joints: "torch.Tensor"


class _StubManoLayer:
    """manotorch.ManoLayer facade over the repo's synthetic MANO model.

    Both sides of the differential receive the SAME constants: the
    reference head's template mesh (ptEmb_head.py:885-891) comes from
    this stub, the flax model's from poem_v2_tpu.mano.ManoLayer — which
    is exactly what this stub wraps.
    """

    def __init__(self, joint_rot_mode="axisang", use_pca=False,
                 mano_assets_root=None, center_idx=None, flat_hand_mean=True,
                 **kw):
        from poem_v2_tpu.mano import ManoLayer

        assert joint_rot_mode == "axisang" and not use_pca and flat_hand_mean
        self._layer = ManoLayer(center_idx=center_idx, flat_hand_mean=flat_hand_mean)
        self.th_faces = torch.from_numpy(np.asarray(self._layer.faces).astype(np.int64))

    @property
    def th_J_regressor(self):
        return torch.from_numpy(np.asarray(self._layer.j_regressor))

    def __call__(self, pose, betas):
        import jax.numpy as jnp

        out = self._layer(jnp.asarray(pose.detach().numpy()),
                          jnp.asarray(betas.detach().numpy()))
        return _ManoOut(verts=torch.from_numpy(np.asarray(out.verts)),
                        joints=torch.from_numpy(np.asarray(out.joints)))


class _AnyStub:
    """Constructor-and-method sink for metrics/recorder stubs."""

    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        return lambda *a, **k: None


class _DummyLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


class _Registry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls

        return deco

    def __call__(self, *a, **k):
        return self.register_module()


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # capability probing) sees a valid module instead of crashing
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
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


class _HRNetCfg(dict):
    """Minimal dict view for HighResolutionNet (dict-access only)."""


def _hrnet_update_config(config, yaml_path):
    with open(os.path.join(REF, yaml_path)) as f:
        loaded = yaml.safe_load(f)
    config.clear()
    config.update(loaded)


@pytest.fixture(scope="module")
def ref_poem():
    """Import the reference POEM.py with the full real compute chain."""
    from helpers import restore_stub_modules, snapshot_stub_modules

    saved = snapshot_stub_modules()

    def index_points(points, idx):
        raw_size = idx.size()
        idx = idx.reshape(raw_size[0], -1)
        res = torch.gather(points, 1, idx[..., None].expand(-1, -1, points.size(-1)))
        return res.reshape(*raw_size, -1)

    def knn_points(query, points, K, return_nn=False):
        d2 = torch.cdist(query, points) ** 2
        dists, idx = torch.topk(d2, K, dim=-1, largest=False)
        nn = None
        if return_nn:
            B, Q, _ = idx.shape
            nn = torch.gather(
                points.unsqueeze(1).expand(B, Q, points.shape[1], points.shape[2]),
                2, idx.unsqueeze(-1).expand(B, Q, K, points.shape[2]))
        return dists, idx, nn

    # transformers-version compat: the reference pins an HF release whose
    # BertSelfAttention IGNORED the query-side attention_mask in
    # cross-attention; current HF applies it and trips on the shape
    # (all-zero (B,1,1,799) vs 4096 keys). Emulate the pinned semantics:
    # drop a mask that provably contributes nothing and cannot broadcast.
    orig_sdpa = torch.nn.functional.scaled_dot_product_attention

    def _sdpa_compat(q, k, v, attn_mask=None, **kw):
        if attn_mask is not None and attn_mask.shape[-1] != k.shape[-2]:
            assert bool((attn_mask == 0).all()), "non-neutral mask dropped"
            attn_mask = None
        return orig_sdpa(q, k, v, attn_mask=attn_mask, **kw)

    torch.nn.functional.scaled_dot_product_attention = _sdpa_compat

    try:
        # ---- third-party stubs ------------------------------------------
        p3d = _stub_package("pytorch3d")
        _stub_module("pytorch3d.ops", knn_points=knn_points,
                     sample_farthest_points=None, ball_query=None)
        p3d.ops = sys.modules["pytorch3d.ops"]
        # transform.py imports these names; none are on the _forward_impl path
        _stub_module(
            "pytorch3d.transforms",
            axis_angle_to_matrix=None, axis_angle_to_quaternion=None,
            euler_angles_to_matrix=None, matrix_to_euler_angles=None,
            matrix_to_quaternion=None, matrix_to_rotation_6d=None,
            quaternion_to_axis_angle=None, quaternion_to_matrix=None,
            rotation_6d_to_matrix=None,
        )
        p3d.transforms = sys.modules["pytorch3d.transforms"]
        mano_pkg = _stub_package("manotorch")
        _stub_module("manotorch.manolayer", ManoLayer=_StubManoLayer)
        mano_pkg.manolayer = sys.modules["manotorch.manolayer"]
        tv = _stub_package("torchvision")
        tvt = _stub_package("torchvision.transforms")
        _stub_module("torchvision.transforms.functional")
        tv.transforms = tvt
        for extra in ("imageio",):
            if extra not in sys.modules:
                _stub_module(extra)

        # ---- fake `lib` tree with real numeric modules ------------------
        _stub_package("lib")
        _stub_package("lib.models")
        _stub_package("lib.models.bricks")
        _stub_package("lib.models.layers")
        _stub_package("lib.models.heads")
        _stub_package("lib.models.backbones")
        _stub_package("lib.utils")
        _stub_package("lib.metrics")
        _stub_package("lib.viztools")
        _stub_package("lib.external")

        _stub_module("lib.utils.logger", logger=_DummyLogger())
        _stub_module("lib.utils.config", CN=dict)
        _stub_module("lib.utils.misc", param_size=lambda m: 0,
                     enable_lower_param=lambda f: f, CONST=types.SimpleNamespace())
        _stub_module("lib.utils.net_utils",
                     load_weights=lambda *a, **k: None,
                     xavier_init=lambda *a, **k: None,
                     init_weights=lambda *a, **k: None)
        _stub_module("lib.utils.recorder", Recorder=_AnyStub)
        _stub_module("lib.utils.points_utils", index_points=index_points,
                     sample_points_from_ball_query=None)
        _stub_module(
            "lib.utils.builder",
            MODEL=_Registry(), HEAD=_Registry(), BACKBONE=_Registry(),
            TRANSFORMER=_Registry(), ATTENTION=_Registry(),
            POSITIONAL_ENCODING=_Registry(), TRANSFORMER_LAYER=_Registry(),
            TRANSFORMER_LAYER_SEQUENCE=_Registry(), TRANSFORM=_Registry(),
            build_from_cfg=None, build_transformer=None, build_backbone=None,
            build_head=None,
        )
        _stub_module("lib.metrics.basic_metric", LossMetric=_AnyStub)
        _stub_module("lib.metrics.mean_epe", MeanEPE=_AnyStub)
        _stub_module("lib.metrics.pa_eval", PAEval=_AnyStub)
        _stub_module("lib.viztools.draw",
                     draw_batch_joint_images=None, draw_batch_verts_images=None)

        # real numeric leaf modules
        _load_ref_module("lib.utils.heatmap", "lib/utils/heatmap.py")
        transform = _load_ref_module("lib.utils.transform", "lib/utils/transform.py")
        _load_ref_module("lib.utils.collation", "lib/utils/collation.py")
        _load_ref_module("lib.utils.triangulation", "lib/utils/triangulation.py")
        _load_ref_module("lib.models.model_abc", "lib/models/model_abc.py")
        _load_ref_module("lib.models.bricks.conv", "lib/models/bricks/conv.py")

        # real HRNet trunk (vendored metro config replaced by a yaml loader)
        _stub_package("lib.external.metro")
        _stub_package("lib.external.metro.hrnet")
        _stub_module("lib.external.metro.hrnet.config",
                     config=_HRNetCfg(), update_config=_hrnet_update_config)
        hrnet = _load_ref_module("lib.models.backbones.hrnet", "lib/models/backbones/hrnet.py")
        bb_pkg = sys.modules["lib.models.backbones"]
        bb_pkg.hrnet = hrnet
        bb_pkg.build_backbone = lambda cfg, **kw: hrnet.HRNet(cfg)
        bb_pkg.create_backbone = lambda cfg, **kw: None

        # integral pose (imports metrics/builder stubs above)
        integral = _load_ref_module("lib.models.integal_pose", "lib/models/integal_pose.py")

        # petr transformer: real SinePositionalEncoding3D; its DETR-layer
        # bases are stubbed (not on the POEM path)
        def _build_transformer(cfg, **kw):
            tr_mod = sys.modules["lib.models.layers.ptEmb_transformer"]
            return getattr(tr_mod, cfg["TYPE"])(cfg)

        _stub_module(
            "lib.models.bricks.transformer",
            BaseTransformerLayer=type("BaseTransformerLayer", (torch.nn.Module,), {}),
            TransformerLayerSequence=type("TransformerLayerSequence", (torch.nn.Module,), {}),
            build_transformer_layer_sequence=lambda *a, **k: None,
            build_transformer=_build_transformer,
        )
        petr = _load_ref_module(
            "lib.models.layers.petr_transformer", "lib/models/layers/petr_transformer.py"
        )
        sys.modules["lib.models.layers"].petr_transformer = petr

        # point/METRO bricks + PtEmbedTRv4 (as in test_parity_torch)
        pt = _load_ref_module(
            "lib.models.bricks.point_transformers", "lib/models/bricks/point_transformers.py"
        )
        sys.modules["lib.models.bricks"].point_transformers = pt
        pmt = _load_ref_module(
            "lib.models.bricks.pt_metro_transformer", "lib/models/bricks/pt_metro_transformer.py"
        )
        sys.modules["lib.models.bricks"].pt_metro_transformer = pmt
        metro = _load_ref_module(
            "lib.models.bricks.metro_transformer", "lib/models/bricks/metro_transformer.py"
        )
        sys.modules["lib.models.bricks"].metro_transformer = metro
        tr = _load_ref_module(
            "lib.models.layers.ptEmb_transformer", "lib/models/layers/ptEmb_transformer.py"
        )

        # real generalized head
        head_mod = _load_ref_module(
            "lib.models.heads.ptEmb_head", "lib/models/heads/ptEmb_head.py"
        )
        sys.modules["lib.models.heads"].ptEmb_head = head_mod

        # builder facade wired to the real classes
        sys.modules["lib.utils.builder"].build_backbone = (
            lambda cfg, **kw: hrnet.HRNet(cfg)
        )
        sys.modules["lib.utils.builder"].build_head = (
            lambda cfg, **kw: head_mod.POEM_Generalized_Head(cfg)
        )
        sys.modules["lib.utils.builder"].build_transformer = (
            lambda cfg, **kw: tr.PtEmbedTRv4(cfg)
        )
        sys.modules["lib.models.heads"].build_head = (
            sys.modules["lib.utils.builder"].build_head)

        # patch the head/transformer modules' own build fns
        head_mod.build_transformer = sys.modules["lib.utils.builder"].build_transformer
        integral.build_backbone = sys.modules["lib.utils.builder"].build_backbone

        poem = _load_ref_module("lib.models.POEM", "lib/models/POEM.py")
        poem.build_backbone = sys.modules["lib.utils.builder"].build_backbone
        poem.build_head = sys.modules["lib.utils.builder"].build_head
        yield {"poem": poem, "transform": transform}
    finally:
        torch.nn.functional.scaled_dot_product_attention = orig_sdpa
        restore_stub_modules(saved)


# --------------------------------------------------------------------------
# the differential
# --------------------------------------------------------------------------

def _reference_cfg():
    """The reference's own release recipe (config/release/train_medium.yaml)
    as an attribute-dict, PRETRAINED cleared (no checkpoint files here)."""
    from poem_v2_tpu.utils.config import Config

    with open(os.path.join(REF, "config/release/train_medium.yaml")) as f:
        raw = yaml.safe_load(f)
    cfg = Config(raw)
    cfg.MODEL.PRETRAINED = None
    cfg.MODEL.BACKBONE.PRETRAINED = ""
    cfg.MODEL.TRAIN = cfg.TRAIN
    cfg.MODEL.DATA_PRESET = cfg.DATA_PRESET
    return cfg


def _calibrate_bn_stats(model, img):
    """One momentum-1 train-mode pass sets every BatchNorm's running stats
    to the fixture batch statistics. This (a) keeps activations at
    realistic O(1) magnitudes through the 40-layer trunk — fresh kaiming
    weights with identity stats blow up to ~1e6 where fp32 parity is
    meaningless — and (b) makes the frozen-BN stat conversion load-bearing
    instead of converting identity stats."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    model.train()
    with torch.no_grad():
        feats = model.extract_img_feat(img, "HRNet")
        model.feat_decode(feats, "HRNet")
        model.uv_decode(feats)
    model.eval()


def test_full_model_forward_parity(ref_poem, tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.utils.torch_convert import convert_poem_checkpoint

    # reference-relative file layout: config/ (bert + hrnet yamls) and the
    # released static assets (bps/anchor npys — byte-identical repo copies)
    os.symlink(os.path.join(REF, "config"), tmp_path / "config")
    os.symlink(ASSETS, tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    B, V, S = 1, 3, 256

    # ---- fixture batch (identical numerics on both sides) ---------------
    ds = SyntheticMultiviewDataset(batch_size=B, view_max=V, image_size=S, seed=17,
                                   random_views=False, view_range=(V, V))
    batch = ds.sample_batch()

    # ---- reference forward ----------------------------------------------
    torch.manual_seed(0)
    cfg = _reference_cfg()
    ref_model = ref_poem["poem"].PtEmbedMultiviewStereoV2(cfg.MODEL)
    ref_model.eval()

    img_bchw = np.transpose(batch["image"].reshape(B * V, S, S, 3), (0, 3, 1, 2))
    _calibrate_bn_stats(ref_model, torch.from_numpy(np.ascontiguousarray(img_bchw)))
    ref_batch = {
        "image": torch.from_numpy(np.ascontiguousarray(img_bchw)),
        "cam_view_num": np.full(B, V, dtype=np.int64),
        "target_cam_intr": torch.from_numpy(batch["cam_intr"].reshape(-1, 3, 3)),
        "target_cam_extr": torch.from_numpy(batch["cam_extr"].reshape(-1, 4, 4)),
        "master_joints_3d": torch.from_numpy(np.repeat(batch["master_joints_3d"], V, axis=0)),
        "master_verts_3d": torch.from_numpy(np.repeat(batch["master_verts_3d"], V, axis=0)),
        "master_id": [0] * B,
        "target_joints_2d": torch.from_numpy(batch["target_joints_2d"].reshape(-1, 21, 2)),
    }
    with torch.no_grad():
        ref_preds = ref_model._forward_impl(ref_batch, mode="test")

    # ---- flax model from the repo's own release recipe ------------------
    repo_cfg = Config.from_yaml(os.path.join(REPO, "configs/release/train_medium.yaml"))
    model_cfg = repo_cfg.MODEL
    model_cfg.BACKBONE.NORM = "frozen_bn"
    model, _ = create_poem_model(model_cfg, dtype=jnp.float32, use_flash=False,
                                 exact_knn=True)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        jb["image"], jb["view_mask"], jb["cam_intr"], jb["cam_extr"],
        jb["master_joints_3d"], train=False,
    )
    params = jax.tree.map(np.asarray, variables["params"])

    state = {k: v for k, v in ref_model.state_dict().items()}
    params, leftover = convert_poem_checkpoint(state, params, arch="HRNet")
    # everything live in _forward_impl must be consumed; the known-dead
    # groups are the HRNet ImageNet classifier head, the base-head layers
    # the generalized head never calls (PETR position_encoder,
    # reference_embed, reg_branches, center_shift_layer, the query-feature
    # merge nets, layer_global_feat) and BN num_batches_tracked counters.
    # ("embeddings.", "pooler.", "position_embeddings" are the BERT
    # input/pooler stacks point_METRO_block never calls — same dead set the
    # block-level test asserts)
    DEAD = ("incre_modules", "downsamp_modules", "final_layer", "classifier",
            "position_encoder", "reference_embed", "reg_branches",
            "center_shift_layer", "merge_net_query_feature", "layer_global_feat",
            "query_embedding", "num_batches_tracked",
            "embeddings.", "pooler.", "position_embeddings")
    unexpected = [k for k in leftover if not any(d in k for d in DEAD)]
    assert not unexpected, f"unconverted live torch weights: {unexpected[:20]}"

    with jax.default_matmul_precision("highest"):
        preds = model.apply(
            {"params": params},
            jb["image"], jb["view_mask"], jb["cam_intr"], jb["cam_extr"],
            jb["master_joints_3d"], train=False,
        )

    # ---- stage-by-stage diff --------------------------------------------
    # 1. heatmap uv from the full test-mode forward (backbone + uv neck +
    # sigmoid/normalize + integral heatmap)
    uv_ref = ref_preds["pred_joints_uv"].numpy().reshape(B, V, 21, 2)
    uv_jax = np.asarray(preds["pred_joints_uv"])
    np.testing.assert_allclose(uv_jax, uv_ref, atol=5e-3, rtol=1e-4,
                               err_msg="integral heatmap uv diverged (backbone/uv-neck)")

    # 1b. test-mode DLT reference joints agree in relative terms (random
    # weights give near-uniform heatmaps -> ill-conditioned triangulation;
    # the well-conditioned DLT check is stage 2)
    ref_j = ref_preds["pred_ref_joints_3d"].numpy()
    jax_j = np.asarray(preds["pred_ref_joints_3d"])
    np.testing.assert_allclose(jax_j, ref_j, rtol=1e-3, atol=1e-4,
                               err_msg="test-mode DLT reference joints diverged")

    # 2. DLT on the GT 2D joints: the reference's own triangulation
    # (lib/utils/triangulation.py batch_triangulate_dlt_torch) vs
    # geometry/triangulation.triangulate_dlt on identical, well-conditioned
    # inputs — isolates the triangulator from heatmap noise
    from poem_v2_tpu.geometry.camera import invert_rigid
    from poem_v2_tpu.geometry.triangulation import triangulate_dlt

    tri_mod = sys.modules["lib.utils.triangulation"]
    uv_gt = batch["target_joints_2d"]  # (B, V, 21, 2)
    t_K = torch.from_numpy(batch["cam_intr"])
    t_T = torch.linalg.inv(torch.from_numpy(batch["cam_extr"]))
    with torch.no_grad():
        tri_ref = tri_mod.batch_triangulate_dlt_torch(
            torch.from_numpy(uv_gt), t_K, t_T).numpy()
    with jax.default_matmul_precision("highest"):
        tri_jax = np.asarray(triangulate_dlt(
            jnp.asarray(uv_gt), jb["cam_intr"],
            invert_rigid(jb["cam_extr"]), jb["view_mask"]))
    np.testing.assert_allclose(tri_jax, tri_ref, atol=2e-5, rtol=1e-4,
                               err_msg="DLT on GT uv diverged")

    # 3. multi-level feature map (backbone + feat neck) — the head input
    with torch.no_grad():
        t_feats = ref_model.extract_img_feat(ref_batch["image"], "HRNet")
        t_mlvl = ref_model.feat_decode(t_feats, "HRNet").numpy()  # (BN, 160, h, w)
    imgs = jb["image"].reshape(B * V, S, S, 3)
    with jax.default_matmul_precision("highest"):
        pyramid = model.backbone.apply({"params": params["backbone"]}, imgs)
        j_mlvl = model.feat_neck.apply({"params": params["feat_neck"]}, list(pyramid))
    j_mlvl_nchw = np.transpose(np.asarray(j_mlvl), (0, 3, 1, 2))
    # activations are O(10); 2e-3 abs ~ 1e-4 relative = accumulated fp32
    # rounding across the ~50-conv trunk (oneDNN vs XLA reduction orders)
    np.testing.assert_allclose(j_mlvl_nchw, t_mlvl, atol=2e-3, rtol=2e-3,
                               err_msg="mlvl feature map diverged (backbone/feat-neck)")

    # 4. head + full decoder stack on identical inputs: the torch mlvl and
    # the (sane, deterministic) GT reference joints drive both heads —
    # sine PE, input_proj, BPS projection + bilinear sampling, mv merge,
    # query init from the shared MANO template, 3 decoder blocks, unscale
    gt_joints = torch.from_numpy(batch["master_joints_3d"])
    img_metas = {
        "inp_img_shape": (S, S),
        "cam_intr": ref_batch["target_cam_intr"],
        "cam_extr": ref_batch["target_cam_extr"],
        "master_id": [0] * B,
        "ref_mesh_gt": torch.cat([ref_batch["master_joints_3d"][:B],
                                  ref_batch["master_verts_3d"][:B]], dim=1),
        "cam_view_num": np.full(B, V, dtype=np.int64),
    }
    with torch.no_grad():
        head_ref = ref_model.ptEmb_head(
            mlvl_feat=torch.from_numpy(t_mlvl), img_metas=img_metas,
            reference_joints=gt_joints)
    t_coords = head_ref["all_coords_preds"].numpy()  # (n_blocks, B, 799, 3)

    mlvl_jax = jnp.asarray(np.transpose(t_mlvl, (0, 2, 3, 1))).reshape(
        B, V, *t_mlvl.shape[2:], t_mlvl.shape[1])
    with jax.default_matmul_precision("highest"):
        head_jax = model.head.apply(
            {"params": params["head"]}, mlvl_jax, jb["view_mask"],
            jb["cam_intr"], jb["cam_extr"], jb["master_joints_3d"],
            inp_res=(S, S), deterministic=True)
    j_coords = np.asarray(head_jax["all_coords_preds"])
    assert j_coords.shape == t_coords.shape
    for blk in range(t_coords.shape[0]):
        np.testing.assert_allclose(
            j_coords[blk], t_coords[blk], atol=1e-4, rtol=1e-3,
            err_msg=f"decoder block {blk} coordinates diverged")

    # 5. approx-KNN deviation measurement (VERDICT r2 #6): the training
    # path's approx_max_k (recall ~0.95) vs this exact run, on the same
    # converted reference weights — per-block coordinate deviation in
    # METERS, printed for PARITY.md deviation #5
    model_approx, _ = create_poem_model(model_cfg, dtype=jnp.float32,
                                        use_flash=False, exact_knn=False)
    with jax.default_matmul_precision("highest"):
        head_approx = model_approx.head.apply(
            {"params": params["head"]}, mlvl_jax, jb["view_mask"],
            jb["cam_intr"], jb["cam_extr"], jb["master_joints_3d"],
            inp_res=(S, S), deterministic=True)
    a_coords = np.asarray(head_approx["all_coords_preds"])
    for blk in range(a_coords.shape[0]):
        d = np.abs(a_coords[blk] - j_coords[blk])
        print(f"approx-KNN deviation block {blk}: "
              f"max {d.max() * 1e3:.3f} mm, mean {d.mean() * 1e3:.4f} mm")
    assert np.isfinite(a_coords).all()

    # NOTE: on CPU ``approx_max_k`` is exact (the measured 0.000 mm here is
    # vacuous) — the honest number comes from the TPU, where the op really
    # approximates. Dump the converted head weights + inputs so
    # scripts/measure_approx_knn.py can replay this exact fixture on the
    # real chip.
    dump = os.environ.get("POEM_DUMP_HEAD")
    if dump:
        import pickle

        with open(dump, "wb") as f:
            pickle.dump({
                "head_params": jax.tree.map(np.asarray, params["head"]),
                "mlvl": np.asarray(mlvl_jax),
                "view_mask": batch["view_mask"] if "view_mask" in batch
                             else np.asarray(jb["view_mask"]),
                "cam_intr": np.asarray(jb["cam_intr"]),
                "cam_extr": np.asarray(jb["cam_extr"]),
                "master_joints_3d": np.asarray(jb["master_joints_3d"]),
                "inp_res": (S, S),
                "t_coords": t_coords,
            }, f)
        print(f"head fixture dumped to {dump}")
