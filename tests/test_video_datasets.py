"""Per-dataset multiview VIDEO variants (reference *MultiView_Video).

Windows must be serial-consistent (same sequence at window start and
end), honour INTERVAL_FRAMES subsampling, load the released index-pkl
format when present, and stack every sample key into a time-major list —
reference dexycb.py:520-589, ho3d.py:931, oakink.py:631.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

import poem_v2_tpu.data.adapters  # noqa: F401  (registers the *_Video types)
from poem_v2_tpu.data.video import MultiviewVideoDataset
from poem_v2_tpu.utils.config import Config
from poem_v2_tpu.utils.registry import DATASET, build_from_cfg

from test_adapters import make_dexycb_root, make_ho3d_root


class _StubMV:
    """Multiview stand-in: 10 frames over sequences A(0-5) and B(6-9)."""

    seqs = ["A"] * 6 + ["B"] * 4

    def __len__(self):
        return len(self.seqs)

    def __getitem__(self, idx):
        return {"idx": idx, "seq": self.seqs[idx]}


def test_windows_are_sequence_consistent():
    mv = _StubMV()
    ds = MultiviewVideoDataset(mv, lambda i: mv.seqs[i], seq_len=3)
    # A: starts 0..3 (4 windows); B: starts 6..7 (2 windows); starts 4,5
    # would cross into B and are excluded
    assert len(ds) == 6
    for w in ds.windows:
        assert len(w) == 3
        assert mv.seqs[w[0]] == mv.seqs[w[-1]]
    item = ds[0]
    assert item["idx"] == [0, 1, 2]  # time-major list per key


def test_interval_frames_subsampling():
    mv = _StubMV()
    ds = MultiviewVideoDataset(mv, lambda i: mv.seqs[i], seq_len=2,
                               interval_frames=2)
    # entries 0,2,4,6,8 -> windows (0,2),(2,4),(6,8); (4,6) crosses A->B
    assert [w for w in ds.windows] == [[0, 2], [2, 4], [6, 8]]


def test_reference_pkl_index_format(tmp_path):
    mv = _StubMV()
    # released format: [multiview_idx, [single_idxs], [seq_names]]
    entries = [[i, [i * 2, i * 2 + 1], [mv.seqs[i]]] for i in range(len(mv))]
    pkl = tmp_path / "idx.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(entries, f)
    ds = MultiviewVideoDataset(mv, lambda i: "unused", seq_len=3,
                               index_pkl=str(pkl))
    ref = MultiviewVideoDataset(mv, lambda i: mv.seqs[i], seq_len=3)
    assert ds.windows == ref.windows


def test_dexycb_video_variant(tmp_path, monkeypatch):
    root = make_dexycb_root(str(tmp_path), frames=5)
    monkeypatch.chdir(tmp_path)  # no assets/video_task pkl -> derived index
    cfg = Config({"DATA_ROOT": root, "DATA_SPLIT": "train", "SEQ_LEN": 3})
    ds = build_from_cfg(Config({"TYPE": "DexYCBMultiView_Video", **cfg.to_dict()}), DATASET)
    # one sequence, 5 frames -> 3 windows of 3
    assert len(ds) == 3
    item = ds[0]
    assert len(item["images"]) == 3  # time axis
    assert len(item["images"][0]) == 2  # views per frame
    assert len(item["label"]) > 0

    with pytest.raises(AssertionError):
        build_from_cfg(Config({"TYPE": "DexYCBMultiView_Video",
                              **cfg.to_dict(),
                              "MASTER_SYSTEM": "as_first_camera"}), DATASET)


def test_ho3d_video_variant(tmp_path, monkeypatch):
    root = make_ho3d_root(str(tmp_path), frames=4)
    monkeypatch.chdir(tmp_path)
    cfg = Config({"DATA_ROOT": root, "DATA_SPLIT": "train", "SEQ_LEN": 2})
    ds = build_from_cfg(Config({"TYPE": "HO3Dv3MultiView_Video", **cfg.to_dict()}), DATASET)
    assert len(ds) >= 1
    item = ds[0]
    assert len(item["images"]) == 2  # seq_len frames
