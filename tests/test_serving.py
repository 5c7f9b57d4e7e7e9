"""Serving predictor: bucket padding, compile cache, output contract."""

import numpy as np
import pytest
import jax.numpy as jnp

from helpers import TINY_MODEL_CFG, tiny_batch
from poem_v2_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_predictor_end_to_end():
    from poem_v2_tpu.serving import Predictor

    cfg = Config({"MODEL": TINY_MODEL_CFG.to_dict(),
                  "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21,
                                  "NUM_VERTS": 778, "IMAGE_SIZE": [64, 64]}})
    pred = Predictor.from_config(cfg, view_bucket=4, dtype=jnp.float32)
    batch = tiny_batch(batch_size=2, view_max=3, image_size=64, random_views=False)

    out = pred(np.asarray(batch["image"])[:, :3],
               np.asarray(batch["cam_intr"])[:, :3],
               np.asarray(batch["cam_extr"])[:, :3])
    assert out["joints_3d"].shape == (2, 21, 3)
    assert out["verts_3d"].shape == (2, 778, 3)
    assert out["joints_uv"].shape == (2, 3, 21, 2)  # un-padded back to 3 views
    for v in out.values():
        assert np.isfinite(v).all()

    # second call with same shapes hits the compile cache
    n_compiled = len(pred._compiled)
    _ = pred(np.asarray(batch["image"])[:, :3],
             np.asarray(batch["cam_intr"])[:, :3],
             np.asarray(batch["cam_extr"])[:, :3])
    assert len(pred._compiled) == n_compiled

    # uint8 input path
    img8 = ((np.asarray(batch["image"])[:, :3] + 0.5) * 255).astype(np.uint8)
    out8 = pred(img8, np.asarray(batch["cam_intr"])[:, :3],
                np.asarray(batch["cam_extr"])[:, :3])
    assert np.isfinite(out8["joints_3d"]).all()

    # batch bucketing: ragged batch sizes share one padded compile and
    # padded rows never leak into the outputs
    b4 = tiny_batch(batch_size=4, view_max=3, image_size=64, random_views=False)
    img4 = np.asarray(b4["image"])[:, :3]
    ki4 = np.asarray(b4["cam_intr"])[:, :3]
    ke4 = np.asarray(b4["cam_extr"])[:, :3]
    out4 = pred(img4, ki4, ke4)
    n_compiled = len(pred._compiled)
    out3 = pred(img4[:3], ki4[:3], ke4[:3])  # pads 3 -> bucket 4
    assert len(pred._compiled) == n_compiled  # reused the B4 compile
    assert out3["joints_3d"].shape == (3, 21, 3)
    np.testing.assert_allclose(out3["joints_3d"], out4["joints_3d"][:3],
                               atol=1e-5, rtol=1e-5)


def test_demo_cli(tmp_path, monkeypatch):
    import pytest
    pytest.importorskip("cv2")
    import yaml
    from poem_v2_tpu.cli.demo import main as demo_main

    cfg = {"MODEL": TINY_MODEL_CFG.to_dict(),
           "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21,
                           "NUM_VERTS": 778, "IMAGE_SIZE": [64, 64]}}
    cfg_path = tmp_path / "demo_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = demo_main(["-c", str(cfg_path), "--out", str(tmp_path / "demo"),
                     "--batch", "1", "--views", "2", "--dtype", "fp32"])
    import os as _os
    assert _os.path.exists(tmp_path / "demo" / "demo_0.png")
    assert np.isfinite(out["verts_3d"]).all()
