"""Recorder: directories, cfg dump round-trip, metric/loss text files."""

import os

import numpy as np

from poem_v2_tpu.metrics import LossMetric, MeanEPE
from poem_v2_tpu.utils.config import Config
from poem_v2_tpu.utils.recorder import Recorder


def test_dirs_and_cfg_dump(tmp_path):
    cfg = Config({"TRAIN": {"LR": 1e-4}, "MODEL": {"TYPE": "X"}})
    rec = Recorder("default", cfg=cfg, root=str(tmp_path))
    assert os.path.isdir(os.path.join(rec.dump_path, "checkpoints"))
    assert os.path.isdir(os.path.join(rec.dump_path, "evaluations"))
    dumped = Config.from_yaml(os.path.join(rec.dump_path, "dump_cfg.yaml"))
    assert dumped.TRAIN.LR == 1e-4


def test_metric_and_loss_files(tmp_path):
    rec = Recorder("default", root=str(tmp_path))
    epe = MeanEPE("joints_3d")
    epe.feed(np.zeros((2, 21, 3)), np.ones((2, 21, 3)) * 0.001)
    rec.record_metric([epe], epoch_idx=0, comment="val")
    lm = LossMetric()
    lm.feed({"loss": 0.5}, 4)
    rec.record_loss(lm, epoch_idx=0, comment="train")

    metric_file = os.path.join(rec.dump_path, "evaluations", "metric_val.txt")
    loss_file = os.path.join(rec.dump_path, "evaluations", "loss_train.txt")
    assert "joints_3d_mepe" in open(metric_file).read()
    assert "loss" in open(loss_file).read()


def test_git_check_skippable(tmp_path, monkeypatch):
    monkeypatch.setenv("POEM_SKIP_GIT_CHECK", "1")
    Recorder("named_experiment", root=str(tmp_path))  # must not raise
