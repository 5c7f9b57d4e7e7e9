"""CLI entry smoke tests (argument plumbing + end-to-end eval run)."""

import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # full CLI epochs; excluded from the smoke tier

cv2 = pytest.importorskip("cv2")

from helpers import TINY_MODEL_CFG
from test_data import make_shard

from poem_v2_tpu.utils.config import Config


def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    from poem_v2_tpu.cli.eval import main as eval_main

    shard = make_shard(str(tmp_path / "Test_mv_test-000000.tar"), n_samples=4, img_size=64)
    cfg = Config(
        {
            "TRAIN": {"BATCH_SIZE": 2, "MANUAL_SEED": 1, "EPOCH": 1,
                      "OPTIMIZER": "adam", "LR": 1e-4, "SCHEDULER": "constant"},
            "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21, "NUM_VERTS": 778,
                            "IMAGE_SIZE": [64, 64]},
            "DATASET": {
                "TEST": {
                    "TYPE": "MultiviewWebDataset",
                    "URLS": shard,
                    "DATA_SPLIT": "test",
                    "EPOCH_SIZE": 4,
                    "RANDOM_N_VIEWS": False,
                    "TRANSFORM": {"TYPE": "SimpleTransform3DMultiView", "AUG": False},
                }
            },
            "MODEL": TINY_MODEL_CFG.to_dict(),
        }
    )
    cfg_path = tmp_path / "eval_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    monkeypatch.chdir(tmp_path)
    results = eval_main(
        ["-c", str(cfg_path), "--exp_id", "default", "--view_max", "3",
         "--eval_extra", "auc", "--dtype", "fp32"]
    )
    assert np.isfinite(results["joints_3d_mepe"])
    assert "pa_mpjpe" in results


def test_train_cli_one_epoch_synthetic(tmp_path, monkeypatch):
    from poem_v2_tpu.cli.train import main as train_main

    cfg = Config(
        {
            "TRAIN": {"BATCH_SIZE": 2, "MANUAL_SEED": 1, "EPOCH": 1, "OPTIMIZER": "adam",
                      "LR": 1e-3, "SCHEDULER": "constant", "LOG_INTERVAL": 1,
                      "GRAD_CLIP_ENABLED": True, "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0}},
            "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21, "NUM_VERTS": 778,
                            "IMAGE_SIZE": [64, 64]},
            "DATASET": {"TRAIN": {"TYPE": "Synthetic", "VIEW_MAX": 2, "IMAGE_SIZE": 64,
                                  "EPOCH_SIZE": 4}},
            "MODEL": TINY_MODEL_CFG.to_dict(),
        }
    )
    cfg_path = tmp_path / "train_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    monkeypatch.chdir(tmp_path)
    state = train_main(
        ["-c", str(cfg_path), "--exp_id", "default", "--view_max", "2",
         "--mesh_data", "1", "--dtype", "fp32"]
    )
    assert int(state.step) == 2  # 4 samples / batch 2
    # checkpoint written
    exps = [p for p in os.listdir(tmp_path / "exp")]
    assert exps


def test_train_cli_fixed_set_device_cache_equivalence(tmp_path, monkeypatch):
    """FIXED_SET runs cache sharded device batches and run each epoch as
    one lax.scan launch; that must be step-for-step equivalent to the
    streaming prefetch feed (batch_iterator is deterministic, so the only
    allowed deviation is float rounding from XLA fusing the scan body
    differently than the standalone step)."""
    import jax
    import numpy as np

    from poem_v2_tpu.cli import train as train_mod

    cfg = Config(
        {
            "TRAIN": {"BATCH_SIZE": 2, "MANUAL_SEED": 1, "EPOCH": 2, "OPTIMIZER": "adam",
                      "LR": 1e-3, "SCHEDULER": "constant", "LOG_INTERVAL": 1,
                      "GRAD_CLIP_ENABLED": True, "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0}},
            "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21, "NUM_VERTS": 778,
                            "IMAGE_SIZE": [64, 64]},
            "DATASET": {"TRAIN": {"TYPE": "Synthetic", "VIEW_MAX": 2, "IMAGE_SIZE": 64,
                                  "EPOCH_SIZE": 4, "FIXED_SET": True, "SEED": 3}},
            "MODEL": TINY_MODEL_CFG.to_dict(),
        }
    )
    cfg_path = tmp_path / "train_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    monkeypatch.chdir(tmp_path)
    argv = ["-c", str(cfg_path), "--exp_id", "default", "--view_max", "2",
            "--mesh_data", "1", "--dtype", "fp32"]

    state_cached = train_mod.main(argv)
    # force the streaming path (cap 0 -> cache disabled) on the same config
    monkeypatch.setattr(train_mod, "FIXED_FEED_CACHE_CAP_BYTES", 0)
    state_streamed = train_mod.main(argv)

    assert int(state_cached.step) == int(state_streamed.step) == 4
    leaves_c = jax.tree_util.tree_leaves(state_cached.params)
    leaves_s = jax.tree_util.tree_leaves(state_streamed.params)
    for lc, ls in zip(leaves_c, leaves_s):
        # rounding-scale drift only (measured ~5e-4 after 4 Adam steps at
        # lr 1e-3; Adam's normalisation amplifies ulp-level grad diffs)
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(ls), atol=5e-3, rtol=0
        )


def test_persistent_compile_cache_helper(tmp_path, monkeypatch):
    """enable_persistent_cache pins the repo-local .jax_cache dir (the
    CLIs reuse bench.py's cache so --resume relaunches skip the
    multi-minute tunneled compile); POEM_NO_COMPILE_CACHE opts out."""
    import jax

    from poem_v2_tpu.utils.compile_cache import enable_persistent_cache

    monkeypatch.delenv("POEM_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = enable_persistent_cache(root=str(tmp_path))
        assert path == str(tmp_path / ".jax_cache")
        assert os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path

        monkeypatch.setenv("POEM_NO_COMPILE_CACHE", "1")
        assert enable_persistent_cache(root=str(tmp_path)) is None
        # opt-out leaves the prior setting untouched
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
