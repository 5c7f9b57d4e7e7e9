"""Shared helpers for the per-dataset SDK adapters.

The reference relies on each dataset's vendor SDK (dex_ycb_toolkit,
oikit, manotorch) plus imageio/torch; these adapters read the published
on-disk layouts directly with numpy + stdlib so the framework has no
extra dependencies. MANO-parameterised labels are realised with the
first-party JAX :class:`~poem_v2_tpu.mano.layer.ManoLayer`.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

# OpenPose joint order used across the framework (reference
# lib/utils/transform.py; see utils/misc.py CONST.MANO_TO_OPENPOSE)
MANO_TO_OPENPOSE = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]


def imread_rgb(path: str) -> np.ndarray:
    """Read an image as RGB uint8 (cv2 host-side; reference uses imageio)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def persp_project(points_3d: np.ndarray, intr: np.ndarray) -> np.ndarray:
    """(N, 3) camera-space points -> (N, 2) pixels."""
    uvw = points_3d @ np.asarray(intr, dtype=np.float64).T
    return (uvw[:, :2] / np.clip(uvw[:, 2:3], 1e-8, None)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mano_layer(center_idx=None, flat_hand_mean=True):
    from ...mano.layer import ManoLayer

    return ManoLayer(center_idx=center_idx, flat_hand_mean=flat_hand_mean)


def mano_verts(pose48: np.ndarray, shape10: np.ndarray, flat_hand_mean: bool = False) -> np.ndarray:
    """Run the JAX MANO layer once on host; returns (778, 3) float32 verts
    in the MANO root frame (no global translation applied)."""
    import jax.numpy as jnp

    layer = _mano_layer(None, flat_hand_mean)
    out = layer(jnp.asarray(pose48, dtype=jnp.float32)[None],
                jnp.asarray(shape10, dtype=jnp.float32)[None])
    return np.asarray(out.verts[0], dtype=np.float32)


def mano_joints(pose48: np.ndarray, shape10: np.ndarray, flat_hand_mean: bool = False) -> np.ndarray:
    import jax.numpy as jnp

    layer = _mano_layer(None, flat_hand_mean)
    out = layer(jnp.asarray(pose48, dtype=jnp.float32)[None],
                jnp.asarray(shape10, dtype=jnp.float32)[None])
    return np.asarray(out.joints[0], dtype=np.float32)


def require_dir(path: str, what: str) -> str:
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{what} not found at {path!r} — point DATA_ROOT at a directory "
            f"containing the published dataset layout"
        )
    return path


def bbox_center_scale(joints_2d: np.ndarray, expand: float = 2.0) -> Tuple[np.ndarray, np.float32]:
    centre = (joints_2d.max(0) + joints_2d.min(0)) / 2.0
    scale = (joints_2d.max(0) - joints_2d.min(0)).max() * expand
    return centre.astype(np.float32), np.float32(scale)
