"""Silhouette-augmented MANO fitting.

Capability parity with the reference ``OneFrameFitSilh``
(lib/fit/frame_fit/one_frame_fit_silh.py:12-303): the reprojection +
anatomical objective of :class:`~poem_v2_tpu.fit.frame_fit.OneFrameFit`
plus a multi-view soft-silhouette term rendered with the pure-JAX
rasterizer (fit/soft_raster.py) instead of pytorch3d. The whole
optimisation stays one jitted ``lax.scan``, batched over frames.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..mano import ManoLayer
from .frame_fit import FitParams, OneFrameFit
from .soft_raster import multiview_silhouette_loss


class OneFrameFitSilh(OneFrameFit):
    def __init__(
        self,
        mano_layer: Optional[ManoLayer] = None,
        lr: float = 1e-2,
        steps: int = 300,
        w_reproj: float = 1.0,
        w_anat: float = 1e-3,
        w_shape: float = 1e-3,
        w_joint3d: float = 0.0,
        w_silh: float = 1.0,
        img_size: int = 256,
        sigma: float = 1.0,
    ):
        super().__init__(mano_layer, lr, steps, w_reproj, w_anat, w_shape, w_joint3d)
        self.w["silh"] = w_silh
        self.img_size = img_size
        self.sigma = sigma
        self.faces = jnp.asarray(np.asarray(self.mano.faces), dtype=jnp.int32)
        self._masks = None  # (B, V, S, S), set by fit()

    def loss(self, params: FitParams, target_2d, cam_intr, cam_extr, view_mask,
             target_joints_3d=None):
        total = super().loss(params, target_2d, cam_intr, cam_extr, view_mask,
                             target_joints_3d)
        if self._masks is not None and self.w["silh"]:
            _, verts, _ = self._forward(params)
            total = total + self.w["silh"] * multiview_silhouette_loss(
                cam_intr, cam_extr, verts, self._masks, self.faces,
                view_mask=view_mask, img_size=self.img_size, sigma=self.sigma,
            )
        return total

    def fit(self, target_2d, cam_intr, cam_extr, view_mask=None,
            target_joints_3d=None, init=None, masks=None):
        """``masks``: (B, V, S, S) target silhouettes in [0, 1] (e.g. the
        green-screen masks the reference feeds, silhouette_loss.py:33)."""
        self._masks = None if masks is None else jnp.asarray(masks, dtype=jnp.float32)
        try:
            return super().fit(target_2d, cam_intr, cam_extr, view_mask,
                               target_joints_3d, init)
        finally:
            self._masks = None
