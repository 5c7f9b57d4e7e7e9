"""Eval callback artifacts: AUC files, prediction pickles, draw overlays."""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from poem_v2_tpu.training.evaluator import AUCCallback, PredictionSaverCallback


def fake_preds_batch(B=2, V=2):
    rs = np.random.RandomState(0)
    preds = {
        "pred_joints_3d": rs.randn(B, 21, 3) * 0.01,
        "pred_verts_3d": rs.randn(B, 778, 3) * 0.01,
        "pred_joints_3d_rel": rs.randn(B, 21, 3) * 0.01,
        "pred_verts_3d_rel": rs.randn(B, 778, 3) * 0.01,
    }
    batch = {
        "image": rs.rand(B, V, 32, 32, 3).astype(np.float32) - 0.5,
        "view_mask": np.ones((B, V), bool),
        "cam_intr": np.tile(np.eye(3, dtype=np.float32) * 100, (B, V, 1, 1)),
        "cam_extr": np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1)),
        "master_joints_3d": preds["pred_joints_3d"] + 0.001,
        "master_verts_3d": preds["pred_verts_3d"] + 0.001,
        "master_joints_3d_rel": preds["pred_joints_3d_rel"] + 0.001,
        "master_verts_3d_rel": preds["pred_verts_3d_rel"] + 0.001,
    }
    return preds, batch


def test_auc_callback_artifacts(tmp_path):
    cb = AUCCallback(exp_dir=str(tmp_path))
    preds, batch = fake_preds_batch()
    cb(preds, batch, 0)
    cb.on_finished()
    assert (tmp_path / "auc.txt").exists()
    curve = pickle.load(open(tmp_path / "res_auc_j.pkl", "rb"))
    assert len(curve) == 2 and len(curve[0]) == 20
    # preds within 1mm of GT -> AUC near 1 over the 0..20mm range
    assert cb.pck_j.get_auc() > 0.9


def test_prediction_saver(tmp_path):
    cb = PredictionSaverCallback(exp_dir=str(tmp_path))
    preds, batch = fake_preds_batch()
    cb(preds, batch, 3)
    payload = pickle.load(open(tmp_path / "preds_000003.pkl", "rb"))
    assert payload["pred_verts_3d"].shape == (2, 778, 3)


def test_drawing_callback(tmp_path):
    from poem_v2_tpu.training.draw_callback import DrawingHandCallback

    cb = DrawingHandCallback(exp_dir=str(tmp_path), max_samples=2)
    preds, batch = fake_preds_batch()
    # place the hand in front of the camera so projection is sane
    preds["pred_joints_3d"][..., 2] += 0.5
    preds["pred_verts_3d"][..., 2] += 0.5
    batch["master_joints_3d"][..., 2] += 0.5
    batch["master_verts_3d"][..., 2] += 0.5
    cb(preds, batch, 0)
    files = os.listdir(tmp_path / "draws")
    # 2 tiled grids + per valid view a PRED and a GT composite
    # (reference testing.py:171-193 artifact set): 2 samples x 2 views x 2
    grids = [f for f in files if f.endswith(".png")]
    comps = [f for f in files if f.endswith(".jpg")]
    assert len(grids) == 2
    assert len(comps) == 8
    assert sum(1 for f in comps if f.endswith("_GT.jpg")) == 4


def test_mesh_renderer_overlay():
    from poem_v2_tpu.viztools.renderer import draw_batch_mesh_images, render_mesh_overlay

    rs = np.random.RandomState(0)
    img = np.zeros((48, 48, 3), np.uint8)
    # small tetra in front of the camera
    verts = np.array([[0, 0, 0.5], [0.05, 0, 0.5], [0, 0.05, 0.55], [0.02, 0.02, 0.45]])
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    intr = np.array([[200.0, 0, 24], [0, 200.0, 24], [0, 0, 1]])
    out = render_mesh_overlay(img, verts, faces, intr)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.sum() > 0  # something was drawn

    images = np.zeros((1, 2, 48, 48, 3), np.uint8)
    extr = np.tile(np.eye(4), (1, 2, 1, 1))
    intrs = np.tile(intr, (1, 2, 1, 1))
    batch_out = draw_batch_mesh_images(images, verts[None], intrs, extr, faces,
                                       view_mask=np.ones((1, 2), bool))
    assert batch_out.sum() > 0


def test_drawing_callback_with_mesh(tmp_path):
    from poem_v2_tpu.training.draw_callback import DrawingHandCallback

    cb = DrawingHandCallback(exp_dir=str(tmp_path), max_samples=1, render_mesh=True,
                             composites=False)
    preds, batch = fake_preds_batch()
    preds["pred_joints_3d"][..., 2] += 0.5
    preds["pred_verts_3d"][..., 2] += 0.5
    batch["master_joints_3d"][..., 2] += 0.5
    cb(preds, batch, 0)
    assert len(os.listdir(tmp_path / "draws")) == 1


def test_save_a_image_with_mesh_joints(tmp_path):
    from poem_v2_tpu.viztools.draw import save_a_image_with_mesh_joints

    rs = np.random.RandomState(0)
    img = (rs.rand(48, 48, 3) * 255).astype(np.uint8)
    intr = np.array([[200.0, 0, 24], [0, 200.0, 24], [0, 0, 1]])
    verts = rs.randn(778, 3) * 0.02 + [0, 0, 0.5]
    joints = rs.randn(21, 3) * 0.02 + [0, 0, 0.5]
    uv = (joints @ intr.T)[:, :2] / joints[:, 2:3]
    faces = np.stack([np.arange(776), np.arange(1, 777), np.arange(2, 778)], 1)

    out = os.path.join(tmp_path, "comp.jpg")
    grid = save_a_image_with_mesh_joints(img, intr, verts, faces, uv, joints, out)
    # composite row: [raw | skeleton | mesh render] at source resolution
    assert grid.shape == (48, 3 * 48, 3) and os.path.exists(out)
    # left panel is the untouched image; mesh panel differs from it
    np.testing.assert_array_equal(grid[:, :48], img)
    assert np.abs(grid[:, 96:].astype(int) - img.astype(int)).mean() > 1

    g4 = save_a_image_with_mesh_joints(
        img, intr, verts, faces, uv, joints, ret=True, with_skeleton_3d=True)
    assert g4.shape == (48, 4 * 48, 3)
