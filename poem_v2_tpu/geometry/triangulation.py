"""Masked batched DLT triangulation.

TPU-native replacement for the reference's per-sample DLT loop
(lib/utils/triangulation.py:5-45 called per sub-batch in
lib/models/POEM.py:289-299). One static-shape SVD handles every sample
and view count at once: rows belonging to padded (invalid) views are
zeroed, which leaves A^T A — and therefore the right-singular vectors —
identical to physically dropping them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def jacobi_eigh_4x4(
    a: jnp.ndarray, sweeps: int = 6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of batched symmetric 4x4 matrices by cyclic Jacobi.

    ``jnp.linalg.eigh`` lowers to a host-unfriendly iterative QR program on
    TPU that costs ~2.5 ms for the (B, J) DLT batch; a fixed-sweep cyclic
    Jacobi is branchless, fully vectorized VPU work (48 plane rotations)
    and converges quadratically — 6 sweeps reach ~1e-7 relative accuracy
    on DLT normal matrices.

    Args:
      a: (..., 4, 4) symmetric.
    Returns:
      (eigvals (..., 4) unsorted, eigvecs (..., 4, 4) column-wise).
    """
    f32 = jnp.float32
    a = a.astype(f32)
    batch = a.shape[:-2]
    v = jnp.broadcast_to(jnp.eye(4, dtype=f32), batch + (4, 4))

    def rotate(carry, pq):
        a, v = carry
        p, q = pq
        app = a[..., p, p]
        aqq = a[..., q, q]
        apq = a[..., p, q]
        # stable rotation: t = sgn(tau) / (|tau| + sqrt(1 + tau^2)), with the
        # tie-safe sgn(0) := +1 so app == aqq (tau == 0) still rotates by 45
        # degrees instead of silently skipping the annihilation
        small = jnp.abs(apq) <= 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(f32)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c_ = c[..., None]
        s_ = s[..., None]

        # A <- G^T A G, G = I with [pp, pq; qp, qq] = [c, s; -s, c]
        row_p = a[..., p, :]
        row_q = a[..., q, :]
        a = a.at[..., p, :].set(c_ * row_p - s_ * row_q)
        a = a.at[..., q, :].set(s_ * row_p + c_ * row_q)
        col_p = a[..., :, p]
        col_q = a[..., :, q]
        a = a.at[..., :, p].set(c_ * col_p - s_ * col_q)
        a = a.at[..., :, q].set(s_ * col_p + c_ * col_q)
        vcol_p = v[..., :, p]
        vcol_q = v[..., :, q]
        v = v.at[..., :, p].set(c_ * vcol_p - s_ * vcol_q)
        v = v.at[..., :, q].set(s_ * vcol_p + c_ * vcol_q)
        return (a, v), None

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for _ in range(sweeps):
        for pq in pairs:
            (a, v), _ = rotate((a, v), pq)

    eigvals = jnp.diagonal(a, axis1=-2, axis2=-1)
    return eigvals, v


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
    eigvals, eigvecs = jacobi_eigh_4x4(ata)
    # select the eigenvector of the smallest eigenvalue (Jacobi output is
    # unsorted); take_along_axis is an exact pick — a one-hot matmul would
    # round the small homogeneous w component at default TPU precision
    sel = jnp.argmin(eigvals, axis=-1)  # (B, J)
    x = jnp.take_along_axis(eigvecs, sel[..., None, None], axis=-1)[..., 0]  # (B, J, 4)
    return x[..., :3] / (x[..., 3:] + eps)
