"""Static-asset loading + exact-KNN plumbing (checkpoint-parity hooks).

The reference's released checkpoints are coupled to the exact contents
of ``assets/{bps,anchor,anchor_idx}.npy`` (ptEmb_head.py:790-809,
point_transformers.py:10-32). These tests pin that the repo copies are
loaded verbatim into the flagship build and that the exact-KNN knob
reaches the decoder.
"""

import os

import numpy as np
import pytest

from poem_v2_tpu.models.poem import create_poem_model, load_static_assets
from poem_v2_tpu.utils.config import Config

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def _flagship_cfg(nsample=4096, embed=64):
    return Config({
        "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
        "HEAD": {
            "TYPE": "POEM_Generalized_Head",
            "EMBED_DIMS": embed, "POINTS_FEAT_DIM": embed, "IN_CHANNELS": 128,
            "NUM_QUERY": 799, "N_SAMPLE": nsample, "RADIUS_SAMPLE": 0.1,
            "POSITIONAL_ENCODING": {"NUM_FEATS": 32},
            "TRANSFORMER": {
                "TYPE": "PtEmbedTRv4", "N_BLOCKS": 2, "INPUT_FEAT_DIM": embed,
                "NUM_ATTENTION_HEADS": 4, "N_NEIGHBOR": 16, "N_NEIGHBOR_QUERY": 16,
            },
        },
    })


def test_default_assets_loaded_verbatim():
    cfg = _flagship_cfg()
    bps, anchor_xyz, anchor_idx = load_static_assets(cfg.HEAD, 4096, 0.1, num_query=799)
    np.testing.assert_array_equal(bps, np.load(os.path.join(ASSETS, "bps.npy")).reshape(-1, 3))
    np.testing.assert_array_equal(
        anchor_xyz, np.load(os.path.join(ASSETS, "anchor.npy")).reshape(-1, 3)
    )
    np.testing.assert_array_equal(
        anchor_idx, np.load(os.path.join(ASSETS, "anchor_idx.npy")).reshape(-1)
    )


def test_flagship_head_gets_assets_and_shared_anchors():
    cfg = _flagship_cfg()
    model, aux = create_poem_model(cfg)
    head = model.head
    np.testing.assert_array_equal(
        head.bps_basis, np.load(os.path.join(ASSETS, "bps.npy")).reshape(-1, 3)
    )
    # one shared anchor set for both init-block attentions (reference
    # anchor_points() loads the same file for both)
    np.testing.assert_array_equal(head.query_anchor_idx, head.pt_anchor_idx)
    np.testing.assert_array_equal(
        head.anchor_xyz, np.load(os.path.join(ASSETS, "anchor.npy")).reshape(-1, 3)
    )


def test_tiny_config_falls_back_to_generated():
    """Implicit repo assets are skipped when geometry doesn't match."""
    cfg = _flagship_cfg(nsample=256)
    bps, anchor_xyz, anchor_idx = load_static_assets(cfg.HEAD, 256, 0.1, num_query=799)
    assert bps.shape == (256, 3)
    assert anchor_xyz is None and anchor_idx is None


def test_explicit_bad_asset_path_is_strict(tmp_path):
    bad = tmp_path / "bps.npy"
    np.save(bad, np.zeros((1, 128, 3), np.float32))
    cfg = _flagship_cfg()
    cfg.HEAD.BPS_PATH = str(bad)
    with pytest.raises(ValueError, match="128 points"):
        load_static_assets(cfg.HEAD, 4096, 0.1)


def test_exact_knn_reaches_decoder():
    """--exact_knn must flip every KNN site to lax.top_k (approx off)."""
    cfg = _flagship_cfg()
    model, _ = create_poem_model(cfg, exact_knn=True)
    assert model.head.approx_knn is False
    model2, _ = create_poem_model(cfg, exact_knn=False)
    assert model2.head.approx_knn is True


def test_eval_single_passes_exact_knn_by_default():
    import poem_v2_tpu.cli.eval_single as es

    captured = {}

    def fake_eval_main(argv):
        captured["argv"] = argv
        return {}

    orig = es.main.__globals__  # patch the lazily imported symbol path
    import poem_v2_tpu.cli.eval as ev
    real = ev.main
    ev.main = fake_eval_main
    try:
        es.main(["-d", "DexYCB", "-m", "small", "--reload", "/dev/null"])
    finally:
        ev.main = real
    assert "--exact_knn" in captured["argv"]
