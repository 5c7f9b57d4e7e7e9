"""Differential parity: reference METRO external baseline vs our flax METRO.

Runs the *actual* reference ``METRO_Hand_Network`` / ``METROBlock`` /
``MeshSampler`` from ``/root/reference/lib/external/metro/base_model.py``
on CPU (the file only needs torch + transformers + scipy, all installed),
converts the full state dict with ``convert_metro_network``, and asserts
our :class:`poem_v2_tpu.models.metro.METRONetwork` produces identical
outputs (camera params, joints, sub-vertices, upsampled vertices) on an
identical fixture batch.

Both sides share the same template mesh (our JAX MANO zero pose) and the
same fabricated ``mano_downsampling.npz`` sampling matrices; the CNN
backbone is a mean-pool + linear stub converted like every other weight,
so everything numeric under test is the reference's own module code.

Reference: lib/external/metro/base_model.py:37-267 (network),
metro.py:59-85 (per-block BertConfig construction).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch-differential tier: pytest -m parity

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_base_model():
    path = os.path.join(REF, "lib/external/metro/base_model.py")
    spec = importlib.util.spec_from_file_location("ref_metro_base_model", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_metro_base_model"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_metro():
    saved_cuda = torch.Tensor.cuda
    # METRO_Encoder.forward hard-codes .cuda() on its dummy input_ids
    # (base_model.py:79); neutralise it for the CPU run
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield _load_ref_base_model()
    finally:
        torch.Tensor.cuda = saved_cuda
        sys.modules.pop("ref_metro_base_model", None)


def _make_block_config(input_dim, output_dim, hidden, heads, layers, dropout=0.1):
    """Replicate metro.py:59-85 per-block BertConfig construction."""
    from transformers import BertConfig

    config = BertConfig.from_json_file(
        os.path.join(REF, "lib/external/metro/bert_cfg.json")
    )
    config.output_attentions = False
    config.output_hidden_states = False
    config.hidden_dropout_prob = dropout
    config.img_feature_dim = input_dim
    config.output_feature_dim = output_dim
    config.num_hidden_layers = layers
    config.hidden_size = hidden
    config.num_attention_heads = heads
    config.intermediate_size = hidden * 4
    config._attn_implementation = "eager"
    return config


class _TorchGlobalFeatBackbone(torch.nn.Module):
    """Mean-pool + linear stand-in for the 2048-d HRNet global feature."""

    def __init__(self, feat_dim=2048):
        super().__init__()
        self.fc = torch.nn.Linear(3, feat_dim)

    def forward(self, x):  # (B, 3, H, W)
        return self.fc(x.mean(dim=(2, 3)))


def test_metro_network_full_parity(ref_metro, tmp_path):
    """Full METRO_Hand_Network forward (template -> 3 blocks -> cam head +
    195->778 upsampling) matches the torch reference to <=2e-5."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from poem_v2_tpu.mano import ManoLayer
    from poem_v2_tpu.models.metro import METRONetwork, synthetic_mesh_sampler
    from poem_v2_tpu.utils.torch_convert import (
        convert_linear,
        convert_metro_network,
        set_in_tree,
    )

    B, H, W = 2, 32, 32
    root_idx = 9
    # reduced dims (the release dims 2051/512/128 + 1024/256/64 only scale
    # the same modules); the token count (21 + 195) and the 2051-d input
    # are structural — METRO_Network.forward hard-codes the 2048 view
    input_dims = (2051, 32, 16)
    hidden_dims = (64, 32, 16)
    output_dims = input_dims[1:] + (3,)
    heads, layers = 4, 2

    # ---- shared template + sampler --------------------------------------
    mano = ManoLayer(center_idx=None)
    out = mano(np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32))
    t_verts = np.asarray(out.verts, np.float32)  # (1, 778, 3)
    t_joints = np.asarray(out.joints, np.float32)  # (1, 21, 3)

    D, U = synthetic_mesh_sampler(t_verts[0])  # (195, 778), (778, 195)
    npz = tmp_path / "mano_downsampling.npz"
    np.savez(
        npz,
        A=np.asarray([sp.eye(778, format="coo"), sp.eye(195, format="coo")], dtype=object),
        U=np.asarray([sp.coo_matrix(U)], dtype=object),
        D=np.asarray([sp.coo_matrix(D)], dtype=object),
    )
    mesh_sampler = ref_metro.MeshSampler(
        filename=str(npz), num_downsampling=1, device=torch.device("cpu")
    )

    class _MeshModelStub:
        """mesh_model contract used by METRO_Network.forward
        (base_model.py:212-219): call -> (verts, joints), center_idx."""

        center_idx = root_idx

        def __call__(self, pose, betas):
            return types.SimpleNamespace(
                verts=torch.from_numpy(t_verts), joints=torch.from_numpy(t_joints)
            )

    # ---- reference network ----------------------------------------------
    torch.manual_seed(0)
    blocks = []
    for i in range(3):
        cfg_i = _make_block_config(input_dims[i], output_dims[i], hidden_dims[i],
                                   heads, layers)
        blocks.append(ref_metro.METROBlock(cfg_i))
    trans_encoder = torch.nn.Sequential(*blocks)
    backbone = _TorchGlobalFeatBackbone()
    ref_net = ref_metro.METRO_Hand_Network(cfg_i, backbone, trans_encoder)
    ref_net.eval()

    rs = np.random.RandomState(5)
    images = rs.randn(B, 3, H, W).astype(np.float32)

    with torch.no_grad():
        t_cam, t_joints3d, t_verts_sub, t_verts_full = ref_net(
            torch.from_numpy(images), _MeshModelStub(), mesh_sampler, is_train=False
        )

    # ---- our network on converted weights --------------------------------
    class _FlaxGlobalFeatBackbone(nn.Module):
        feat_dim: int = 2048

        @nn.compact
        def __call__(self, x):  # (B, H, W, 3)
            return {"res_layer4_mean": nn.Dense(self.feat_dim, name="fc")(
                jnp.mean(x, axis=(1, 2))
            )}

    # template exactly as the reference computes it in-forward
    # (base_model.py:216-222: downsample FIRST, then root-centre)
    troot = t_joints[0, root_idx]
    tj_rel = t_joints[0] - troot
    tvs_rel = (D @ t_verts[0]) - troot

    model = METRONetwork(
        backbone=_FlaxGlobalFeatBackbone(),
        template_joints=tj_rel,
        template_verts_sub=tvs_rel,
        input_feat_dims=input_dims,
        hidden_feat_dims=hidden_dims,
        num_layers=layers,
        num_heads=heads,
    )
    image_nhwc = np.transpose(images, (0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(image_nhwc), train=False)
    params = jax.tree.map(np.asarray, variables["params"])

    state = {k: v for k, v in ref_net.state_dict().items()}
    set_in_tree(params, ["backbone", "fc", "kernel"], convert_linear(state["backbone.fc.weight"]))
    set_in_tree(params, ["backbone", "fc", "bias"], state["backbone.fc.bias"].numpy())
    used = convert_metro_network(state, params)
    used += ["backbone.fc.weight", "backbone.fc.bias"]
    live = [k for k in state if ".embeddings." not in k and ".pooler." not in k]
    assert set(live) <= set(used), sorted(set(live) - set(used))

    preds = model.apply({"params": params}, jnp.asarray(image_nhwc), train=False)

    np.testing.assert_allclose(
        np.asarray(preds["pred_cam"]), t_cam.numpy(), atol=2e-5, rtol=1e-4,
        err_msg="camera params diverged from the torch METRO reference",
    )
    np.testing.assert_allclose(
        np.asarray(preds["pred_joints_3d_rel"]), t_joints3d.numpy(), atol=2e-5, rtol=1e-4,
        err_msg="joints diverged from the torch METRO reference",
    )
    np.testing.assert_allclose(
        np.asarray(preds["pred_verts_sub_3d_rel"]), t_verts_sub.numpy(), atol=2e-5,
        rtol=1e-4, err_msg="sub-vertices diverged from the torch METRO reference",
    )
    np.testing.assert_allclose(
        np.asarray(preds["pred_verts_3d_rel"]), t_verts_full.numpy(), atol=2e-5,
        rtol=1e-4, err_msg="upsampled vertices diverged from the torch METRO reference",
    )
