"""Procrustes-aligned MPJPE/MPVPE (reference lib/metrics/pa_eval.py:15-124).

The alignment itself runs batched on device
(:func:`poem_v2_tpu.geometry.procrustes.align_w_scale`) instead of the
reference's per-sample SciPy loop.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..geometry.procrustes import align_w_scale
from .meters import AverageMeter, Metric


class PAEval(Metric):
    def __init__(self, mesh_score: bool = True):
        self.mesh_score = mesh_score
        self.pa_mpjpe = AverageMeter()
        self.mpjpe = AverageMeter()
        self.pa_mpvpe = AverageMeter()
        self.mpvpe = AverageMeter()

    def reset(self):
        for m in (self.pa_mpjpe, self.mpjpe, self.pa_mpvpe, self.mpvpe):
            m.reset()

    @staticmethod
    def _dist(a, b):
        return np.linalg.norm(np.asarray(a) - np.asarray(b), axis=2).mean(axis=1)

    def feed(self, pred_joints, gt_joints, pred_verts=None, gt_verts=None, **kw):
        B = pred_joints.shape[0]
        aligned_j = align_w_scale(jnp.asarray(gt_joints), jnp.asarray(pred_joints))
        self.pa_mpjpe.update(self._dist(aligned_j, gt_joints).sum(), B)
        self.mpjpe.update(self._dist(pred_joints, gt_joints).sum(), B)
        if self.mesh_score and pred_verts is not None:
            aligned_v = align_w_scale(jnp.asarray(gt_verts), jnp.asarray(pred_verts))
            self.pa_mpvpe.update(self._dist(aligned_v, gt_verts).sum(), B)
            self.mpvpe.update(self._dist(pred_verts, gt_verts).sum(), B)

    def get_measures(self) -> Dict[str, float]:
        out = {"pa_mpjpe": self.pa_mpjpe.avg, "mpjpe": self.mpjpe.avg}
        if self.mesh_score:
            out.update(pa_mpvpe=self.pa_mpvpe.avg, mpvpe=self.mpvpe.avg)
        return out

    def get_result(self) -> float:
        return self.pa_mpjpe.avg

    def __str__(self):
        s = f"pa_mpjpe(mm): {self.pa_mpjpe.avg * 1000.0:6.4f} | mpjpe: {self.mpjpe.avg:6.4f}"
        if self.mesh_score:
            s += f" | pa_mpvpe(mm): {self.pa_mpvpe.avg * 1000.0:6.4f} | mpvpe: {self.mpvpe.avg:6.4f}"
        return s
