"""Torch-differential parity: reference CMR_G baseline vs our flax CMRG.

Runs the REAL reference ``CMR_G`` network (lib/external/cmr/model.py:77-302
with net.py:6-196: EncodeUV/EncodeMesh dual ResNet-18 trunks, both
skip-connected UV decoders, the 15 relation maps, latent SelfAttention and
the 5-level coarse-to-fine spiral decoder with Pool-averaged hierarchy
residuals) on CPU, converts the full state dict with
:func:`poem_v2_tpu.utils.torch_convert.convert_cmr_network`, and diffs
every ``_forward_impl`` output (uv_prior, mesh_pred hierarchy, uv_pred,
mask_pred) against our flax model on an identical fixture batch.

Shared fixtures fed to BOTH sides (the reference's template assets are
not in the snapshot — lib/external/cmr/template/ holds only .gitkeep, and
its spiral preprocessing needs openmesh/psbody which are deliberately
absent): the mesh hierarchy/spirals/up-matrices come from our
``build_mesh_hierarchy`` on the repo's synthetic MANO template, injected
into the reference via its own ``spiral_tramsform`` seam
(model.py:118-121,278-285). ``torch_scatter.scatter_add`` (a CUDA dep per
external/cmr/README.md) is replaced by an exact ``index_add`` equivalent,
so the reference ``Pool`` runs its real code path.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
CMR_DIR = os.path.join(REF, "lib/external/cmr")

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch-differential tier: pytest -m parity


class _AnyStub:
    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        return lambda *a, **k: None


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


def _scatter_add(src, index, dim, dim_size=None):
    """Exact pure-torch torch_scatter.scatter_add (net.py:6-19 Pool)."""
    shape = list(src.shape)
    shape[dim] = int(dim_size)
    return torch.zeros(shape, dtype=src.dtype).index_add(dim, index, src)


def _shared_hierarchy():
    """Mesh hierarchy + spirals + up matrices fed to BOTH frameworks."""
    from poem_v2_tpu.mano import ManoLayer
    from poem_v2_tpu.models.cmr import build_mesh_hierarchy

    mano = ManoLayer(center_idx=0)
    v = np.asarray(mano(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32)).verts[0])
    verts, spirals, ups = build_mesh_hierarchy(v, spiral_len=27)
    return verts, spirals, ups


@pytest.fixture(scope="module")
def ref_cmr():
    """Import the reference CMR_G with its real numeric compute chain."""
    from helpers import restore_stub_modules, snapshot_stub_modules

    saved = snapshot_stub_modules()
    verts, spirals, ups = _shared_hierarchy()

    def spiral_tramsform(transform_fp, template_fp, ds_factors=None,
                         seq_length=None, dilation=None):
        # the reference's preprocessing seam (utils.py:16-52); hands the
        # SHARED fixture hierarchy to the torch side in its native types
        spiral_list = [torch.from_numpy(np.asarray(s, np.int64)) for s in spirals[:4]]
        up_list = [torch.from_numpy(np.asarray(u, np.float32)).to_sparse().coalesce()
                   for u in ups]
        down_list = [torch.eye(ups[i].shape[1], ups[i].shape[0]).to_sparse()
                     for i in range(len(ups))]
        faces = [np.zeros((1, 3), np.int64) for _ in verts]
        tmp = {"vertices": verts, "face": faces}
        return spiral_list, down_list, up_list, tmp

    class _StubMANO:
        def __init__(self, *a, **k):
            self.mano_layer = types.SimpleNamespace(
                th_J_regressor=torch.zeros(21, 778)
            )

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    try:
        # ---- third-party stubs -------------------------------------------
        _stub_module("torch_scatter", scatter_add=_scatter_add)

        # ---- fake `lib` tree ----------------------------------------------
        _stub_package("lib")
        _stub_package("lib.models")
        _stub_package("lib.models.layers")
        _stub_package("lib.models.backbones")
        _stub_package("lib.utils")
        _stub_package("lib.metrics")
        _stub_package("lib.viztools")
        _stub_module("lib.utils.logger", logger=_DummyLogger())
        _stub_module("lib.utils.misc", param_size=lambda m: 0,
                     enable_lower_param=lambda f: f,
                     CONST=types.SimpleNamespace())
        _stub_module("lib.utils.builder", MODEL=_Registry(), BACKBONE=_Registry())
        _stub_module("lib.utils.net_utils", init_weights=lambda *a, **k: None)
        _stub_module("lib.utils.transform", batch_persp_project=None,
                     mano_to_openpose=None)
        _stub_module("lib.metrics", LossMetric=_AnyStub, MeanEPE=_AnyStub,
                     PAEval=_AnyStub)
        _stub_module("lib.models.layers.mano_wrapper", MANO=_StubMANO,
                     kpId2vertices=None)
        _stub_module("lib.viztools.draw", draw_batch_joint_images=None)
        _load_ref_module("lib.models.model_abc", "lib/models/model_abc.py")

        # real reference ResNet, with the model-zoo download forced off
        # (zero egress; the differential runs on random init anyway)
        resnet_real = _load_ref_module(
            "lib.models.backbones.resnet", "lib/models/backbones/resnet.py"
        )
        for fn_name in ("resnet18", "resnet34", "resnet50"):
            real_fn = getattr(resnet_real, fn_name)
            setattr(
                resnet_real, fn_name,
                (lambda f: lambda pretrained=False, **kw: f(False, **kw))(real_fn),
            )

        # ---- the reference cmr package ------------------------------------
        # model.py only needs .loss and .net numerically; .utils (openmesh/
        # psbody imports) and the dataset/registration helpers are seamed out
        refcmr = _stub_package("refcmr")
        refcmr.__path__ = [CMR_DIR]
        refcmr.__spec__.submodule_search_locations = [CMR_DIR]
        _stub_module("refcmr.utils", spiral_tramsform=spiral_tramsform,
                     tensor2array=None)
        _stub_module("refcmr.data_adaptor", map2uv=None, uv2map=None)
        _stub_module("refcmr.regitstration", registration_one=None, cnt_area=None)

        import importlib as _il

        model_mod = _il.import_module("refcmr.model")
        yield types.SimpleNamespace(model=model_mod, spirals=spirals, ups=ups)
    finally:
        restore_stub_modules(saved)


class _CN(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _make_cfg():
    return _CN(
        TRAIN=_CN(LOG_INTERVAL=10),
        DATA_PRESET=_CN(CENTER_IDX=9, IMAGE_SIZE=(64, 64)),
        METRIC=None,
        IN_CHANNELS=3,
        OUT_CHANNELS=[32, 64, 128, 256],
        ATT=True,
        BACKBONE="resnet18",
        PRETRAINED="",
    )


def test_cmr_full_network_parity(ref_cmr):
    """Full CMR_G _forward_impl matches the converted flax CMRG."""
    import jax
    import jax.numpy as jnp

    from poem_v2_tpu.models.cmr import CMRG
    from poem_v2_tpu.utils.torch_convert import convert_cmr_network

    torch.manual_seed(0)
    ref_net = ref_cmr.model.CMR_G(_make_cfg())
    ref_net.eval()

    # randomize every normalisation buffer: FrozenBatchNorm keeps its
    # affine params as buffers initialised to identity (resnet.py:31-48),
    # so without this the stat conversion would go untested
    rs = np.random.RandomState(7)
    with torch.no_grad():
        for name, buf in ref_net.named_buffers():
            if name.endswith("num_batches_tracked"):
                continue
            if name.endswith("running_var"):
                buf.copy_(torch.from_numpy(rs.rand(*buf.shape).astype(np.float32) * 0.5 + 0.75))
            elif name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(rs.randn(*buf.shape).astype(np.float32) * 0.1))
            elif name.endswith("weight"):
                buf.copy_(torch.from_numpy(1.0 + rs.randn(*buf.shape).astype(np.float32) * 0.2))
            elif name.endswith("bias"):
                buf.copy_(torch.from_numpy(rs.randn(*buf.shape).astype(np.float32) * 0.1))

    B, H, W = 2, 64, 64
    images = rs.randn(B, 3, H, W).astype(np.float32) * 0.5

    with torch.no_grad():
        t_out = ref_net._forward_impl({"img": torch.from_numpy(images)})

    # ---- our network on converted weights --------------------------------
    model = CMRG(
        arch="resnet18",
        norm="frozen_bn",
        spirals=tuple(np.asarray(s) for s in ref_cmr.spirals[:4]),
        up_mats=tuple(np.asarray(u) for u in ref_cmr.ups[:4]),
        out_channels=(32, 64, 128, 256),
        att=True,
    )
    image_nhwc = jnp.asarray(np.transpose(images, (0, 2, 3, 1)))
    with jax.default_matmul_precision("highest"):
        variables = model.init(jax.random.PRNGKey(0), image_nhwc)
        params = jax.tree.map(np.asarray, variables["params"])

        state = {k: v for k, v in ref_net.state_dict().items()}
        used = convert_cmr_network(state, params, arch="resnet18")
        live = {k for k in state if not k.endswith("num_batches_tracked")}
        assert live <= set(used), sorted(live - set(used))

        out = model.apply({"params": params}, image_nhwc)

    # ---- stage diffs -------------------------------------------------------
    uv_prior = np.transpose(np.asarray(out["uv_prior"]), (0, 3, 1, 2))
    np.testing.assert_allclose(uv_prior, t_out["uv_prior"].numpy(), atol=2e-5,
                               err_msg="uv_prior")

    for lv, (ours, theirs) in enumerate(zip(out["mesh_pred"], t_out["mesh_pred"])):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-4,
            err_msg=f"mesh_pred level {lv}"
        )

    uv_pred = np.transpose(np.asarray(out["uv_pred"]), (0, 3, 1, 2))
    np.testing.assert_allclose(uv_pred, t_out["uv_pred"].numpy(), atol=2e-5,
                               err_msg="uv_pred")
    np.testing.assert_allclose(np.asarray(out["mask_pred"]),
                               t_out["mask_pred"].numpy(), atol=2e-5,
                               err_msg="mask_pred")
