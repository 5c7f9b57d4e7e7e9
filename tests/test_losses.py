"""Loss tests: masked means must equal the reference's ragged means."""

import math

import numpy as np
import jax.numpy as jnp

from poem_v2_tpu.mano import ManoLayer, synthetic_mano
from poem_v2_tpu.models.losses import masked_view_mean, poem_loss, reprojection_loss
from poem_v2_tpu.utils.config import Config

rng = np.random.RandomState(0)


def test_masked_view_mean_equals_ragged_mean():
    B, V, N = 3, 4, 21
    x = rng.randn(B, V, N).astype(np.float32)
    counts = [1, 3, 4]
    mask = np.arange(V)[None] < np.asarray(counts)[:, None]

    got = float(masked_view_mean(jnp.asarray(x), jnp.asarray(mask)))
    # reference semantics: concatenate valid views of all samples, then mean
    ragged = np.concatenate([x[b, : counts[b]] for b in range(B)], axis=0)
    np.testing.assert_allclose(got, ragged.mean(), rtol=1e-5)


def test_reprojection_loss_clamps_and_masks():
    B, V, N = 2, 3, 21
    pts = rng.randn(B, N, 3).astype(np.float32) * 0.05 + [0, 0, 0.6]
    intr = np.zeros((B, V, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 500.0
    intr[..., 0, 2] = intr[..., 1, 2] = 128.0
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    # ground truth 2D = exact projection -> zero loss
    m2c = np.linalg.inv(extr)
    cam = np.einsum("bvij,bnj->bvni", m2c[..., :3, :3], pts) + m2c[..., :3, 3][:, :, None]
    proj = np.einsum("bvni,bvji->bvnj", cam, intr)
    gt2d = proj[..., :2] / proj[..., 2:]
    mask = np.ones((B, V), bool)

    zero = float(
        reprojection_loss(jnp.asarray(pts), jnp.asarray(extr), jnp.asarray(intr),
                          jnp.asarray(gt2d), jnp.asarray(mask), 362.0)
    )
    assert zero < 1e-8

    # huge offsets are clamped to (0.5)^2 * 2 per point
    far = gt2d + 1e6
    clamped = float(
        reprojection_loss(jnp.asarray(pts), jnp.asarray(extr), jnp.asarray(intr),
                          jnp.asarray(far), jnp.asarray(mask), 362.0)
    )
    np.testing.assert_allclose(clamped, 0.5, atol=1e-5)  # 2 * 0.25

    # invalid views with absurd targets must not contribute
    mask2 = mask.copy()
    mask2[:, 2] = False
    bad = gt2d.copy()
    bad[:, 2] += 1e6
    unaffected = float(
        reprojection_loss(jnp.asarray(pts), jnp.asarray(extr), jnp.asarray(intr),
                          jnp.asarray(bad), jnp.asarray(mask2), 362.0)
    )
    assert unaffected < 1e-8


def test_poem_loss_terms_and_weights():
    B, V = 2, 2
    mano = ManoLayer(model=synthetic_mano())
    n_blocks = 2
    gt_j = rng.randn(B, 21, 3).astype(np.float32) * 0.05
    gt_v = rng.randn(B, 778, 3).astype(np.float32) * 0.05
    coords = np.concatenate([gt_j, gt_v], axis=1)[None].repeat(n_blocks, 0)

    batch = {
        "view_mask": jnp.ones((B, V), bool),
        "image": jnp.zeros((B, V, 64, 64, 3)),
        "master_joints_3d": jnp.asarray(gt_j),
        "master_verts_3d": jnp.asarray(gt_v),
        "target_joints_2d": jnp.zeros((B, V, 21, 2)),
        "cam_intr": jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)),
        "cam_extr": jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)),
    }
    preds = {
        "all_coords_preds": jnp.asarray(coords),
        "pred_joints_uv": jnp.zeros((B, V, 21, 2)),
    }
    loss_cfg = Config(
        {"JOINTS_LOSS_TYPE": "l2", "VERTICES_LOSS_TYPE": "l1",
         "HEATMAP_JOINTS_WEIGHT": 10.0, "JOINTS_LOSS_WEIGHT": 1.0,
         "VERTICES_LOSS_WEIGHT": 1.0, "JOINTS_2D_LOSS_WEIGHT": 0.0}
    )
    loss, ld = poem_loss(preds, batch, mano.j_regressor, loss_cfg)
    # predictions == GT -> recon terms vanish; heatmap term is 0 (targets 0)
    assert float(ld["loss_3d_joints"]) < 1e-10
    assert float(ld["loss_3d_verts"]) < 1e-10
    assert float(ld["loss_3d_joints_from_mesh"]) < 1e-10
    assert np.isfinite(float(loss))

    # perturb verts -> L1 term equals mean abs perturbation
    pred2 = coords.copy()
    pred2[-1, :, 21:] += 0.01
    preds2 = dict(preds, all_coords_preds=jnp.asarray(pred2))
    _, ld2 = poem_loss(preds2, batch, mano.j_regressor, loss_cfg)
    np.testing.assert_allclose(float(ld2["loss_3d_verts"]), 0.01, rtol=1e-4)
