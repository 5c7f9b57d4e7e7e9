"""MVP baseline + single-view pose models: forward shapes/finiteness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from helpers import tiny_batch
from poem_v2_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_mvp_forward():
    from poem_v2_tpu.models.mvp import create_mvp_model

    cfg = Config(
        {
            "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
            "HEAD": {"TYPE": "MVPHead", "EMBED_DIMS": 64, "NUM_PREDS": 2, "NUM_POINTS": 2},
            "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21},
        }
    )
    model, aux = create_mvp_model(cfg)
    batch = tiny_batch(batch_size=2, view_max=3, image_size=64)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["image"], batch["view_mask"], batch["cam_intr"], batch["cam_extr"],
        batch["master_joints_3d"],
    )
    preds = model.apply(
        variables,
        batch["image"], batch["view_mask"], batch["cam_intr"], batch["cam_extr"],
        batch["master_joints_3d"],
    )
    assert preds["pred_verts_3d"].shape == (2, 778, 3)
    assert preds["pred_pose"].shape == (2, 16, 3)
    assert np.isfinite(np.asarray(preds["pred_verts_3d"])).all()


def test_integral_pose_forward():
    from poem_v2_tpu.models.pose2d import create_integral_pose

    cfg = Config(
        {
            "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
            "HEAD": {"TYPE": "IntegralDeconvHead", "NCLASSES": 21, "DEPTH_RESOLUTION": 0,
                     "NUM_DECONV": 2, "DECONV_FEATURES": 64, "NORM_TYPE": "softmax"},
        }
    )
    model = create_integral_pose(cfg)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["uv"].shape == (2, 21, 2)
    assert (np.asarray(out["uv"]) >= 0).all() and (np.asarray(out["uv"]) <= 1).all()


def test_integral_pose_3d_head():
    from poem_v2_tpu.models.pose2d import IntegralDeconvHead

    head = IntegralDeconvHead(num_joints=21, depth_resolution=8, num_deconv=1, deconv_features=32)
    feat = jnp.zeros((2, 8, 8, 64))
    variables = head.init(jax.random.PRNGKey(0), feat)
    out = head.apply(variables, feat)
    assert out["uvd"].shape == (2, 21, 3)


def test_dark_decode_subpixel():
    from poem_v2_tpu.models.pose2d import dark_decode
    from poem_v2_tpu.geometry.heatmap import gaussian_heatmap2d

    uv = jnp.asarray([[[0.43, 0.61]]])  # one joint, off-grid position
    hm = gaussian_heatmap2d(uv, hm_size=32, sigma=2.0)  # (1, 1, 32, 32)
    got = dark_decode(np.asarray(hm))
    want = np.asarray(uv)[0, 0] * 32
    np.testing.assert_allclose(got[0, 0], want, atol=0.25)


def test_joints_mse_loss():
    from poem_v2_tpu.models.pose2d import joints_mse_loss

    a = jnp.ones((2, 21, 8, 8))
    b = jnp.zeros((2, 21, 8, 8))
    assert float(joints_mse_loss(a, b)) == 0.5
    vis = jnp.zeros((2, 21))
    assert float(joints_mse_loss(a, b, vis)) == 0.0


def test_metro_forward():
    from poem_v2_tpu.models.metro import create_metro_model

    cfg = Config(
        {
            "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
            "INPUT_FEAT_DIM": [515, 128, 32],
            "HIDDEN_FEAT_DIM": [256, 64, 16],
        }
    )
    model, aux = create_metro_model(cfg)
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, img)
    out = model.apply(variables, img)
    assert out["pred_verts_3d_rel"].shape == (2, 778, 3)
    assert out["pred_joints_3d_rel"].shape == (2, 21, 3)
    assert out["pred_cam"].shape == (2, 3)


def test_cmr_forward():
    from poem_v2_tpu.models.cmr import create_cmr_model

    model, aux = create_cmr_model()
    img = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out["pred_verts_3d_rel"].shape == (2, 778, 3)
    assert np.isfinite(np.asarray(out["pred_verts_3d_rel"])).all()


def test_mesh_hierarchy_properties():
    from poem_v2_tpu.models.cmr import build_mesh_hierarchy

    v = np.random.RandomState(0).randn(778, 3).astype(np.float32)
    verts, spirals, ups = build_mesh_hierarchy(v)
    assert [x.shape[0] for x in verts] == [778, 389, 194, 97, 49]
    assert spirals[0].shape == (778, 9)
    assert ups[0].shape == (778, 389)
    # upsample rows are convex combinations
    np.testing.assert_allclose(ups[0].sum(1), np.ones(778), atol=1e-5)
