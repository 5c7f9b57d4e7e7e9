"""Masked batched DLT triangulation.

TPU-native replacement for the reference's per-sample DLT loop
(lib/utils/triangulation.py:5-45 called per sub-batch in
lib/models/POEM.py:289-299). One static-shape SVD handles every sample
and view count at once: rows belonging to padded (invalid) views are
zeroed, which leaves A^T A — and therefore the right-singular vectors —
identical to physically dropping them.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def triangulate_dlt(
    kp2d: jnp.ndarray,
    cam_intr: jnp.ndarray,
    extr_m2c: jnp.ndarray,
    view_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Triangulate per-joint 3D points from multiple calibrated views.

    Args:
      kp2d: (B, V, J, 2) pixel keypoints.
      cam_intr: (B, V, 3, 3).
      extr_m2c: (B, V, 4, 4) master/world -> camera transforms
        (the inverse of the dataset's ``target_cam_extr``; see reference
        lib/models/POEM.py:287).
      view_mask: (B, V) bool; False rows are excluded. Defaults to all-valid.

    Returns:
      (B, J, 3) triangulated points, following Hartley & Zisserman 12.2.
    """
    B, V, J, _ = kp2d.shape
    P = extr_m2c[..., :3, :]  # (B, V, 3, 4)
    M = jnp.einsum("...ij,...jk->...ik", cam_intr, P, precision="highest")  # (B, V, 3, 4)

    m_row2 = M[..., 2:3, :]  # (B, V, 1, 4)
    # A rows: u * m2 - m0 ; v * m2 - m1, built per joint.
    # kp2d -> (B, V, J, 2, 1); m_row2 -> (B, V, 1, 1, 4)
    a = kp2d[..., None] * m_row2[:, :, None]  # (B, V, J, 2, 4)
    a = a - M[..., :2, :][:, :, None]  # (B, V, J, 2, 4)

    if view_mask is not None:
        a = a * view_mask[:, :, None, None, None].astype(a.dtype)

    # (B, J, V, 2, 4) -> (B, J, 2V, 4)
    a = jnp.swapaxes(a, 1, 2).reshape(B, J, 2 * V, 4)
    # Work on A^T A (4x4) — far cheaper than SVD of (2V, 4) and identical
    # null-space; eigh of a tiny symmetric matrix is TPU-friendly.
    ata = jnp.einsum("bjrk,bjrl->bjkl", a, a, precision="highest")  # (B, J, 4, 4)
    _, eigvecs = jnp.linalg.eigh(ata)
    x = eigvecs[..., :, 0]  # eigenvector of smallest eigenvalue (B, J, 4)
    return x[..., :3] / (x[..., 3:] + eps)
