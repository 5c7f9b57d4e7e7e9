"""Temporal (video) dataset variants.

Capability parity with the reference's *_Video multi-view datasets
(DexYCBMultiView_Video dexycb.py:520-589, HO3D/Oakink video variants):
groups a stream of per-frame multi-view samples into T-frame windows of
the same sequence, batched as an extra leading time axis. Sequence
identity comes from the sample key prefix (``<seq>/<frame>`` in the
released tars).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np


def sequence_of(key: str) -> str:
    return key.rsplit("/", 1)[0] if "/" in key else key.rsplit("_", 1)[0]


class TemporalWindowDataset:
    """Wrap a (frame-ordered) sample stream into sliding T-frame windows."""

    def __init__(self, dataset, window: int = 4, stride: int = 1, key_field: str = "__key__"):
        self.dataset = dataset
        self.window = window
        self.stride = stride
        self.key_field = key_field

    def __iter__(self) -> Iterator[List[Dict]]:
        buf: List[Dict] = []
        current_seq: Optional[str] = None
        for sample in self.dataset:
            seq = sequence_of(str(sample.get(self.key_field, "")))
            if seq != current_seq:
                buf = []
                current_seq = seq
            buf.append(sample)
            if len(buf) == self.window:
                yield list(buf)
                buf = buf[self.stride :]


def collate_video(windows, view_max: int) -> Dict[str, np.ndarray]:
    """Collate a batch of T-frame windows -> arrays with a (B, T, ...) layout."""
    from .collate import collate_padded

    per_t = []
    T = len(windows[0])
    for t in range(T):
        per_t.append(collate_padded([w[t] for w in windows], view_max))
    out = {}
    for k in per_t[0]:
        out[k] = np.stack([per_t[t][k] for t in range(T)], axis=1)
    return out
