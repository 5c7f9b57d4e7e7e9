"""Batched similarity (Procrustes) alignment in JAX.

Replaces the reference's per-sample SciPy loop
(lib/metrics/pa_eval.py:45-124, align_w_scale) with one batched SVD on
device — eval alignment runs for the whole batch at once instead of a
host-side Python loop.
"""

from __future__ import annotations


import jax.numpy as jnp


def align_w_scale(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Align ``pred`` to ``gt`` with the optimal similarity transform.

    Args:
      gt: (..., N, 3) target point sets.
      pred: (..., N, 3) point sets to align.

    Returns:
      (..., N, 3) aligned prediction; same math as SciPy's
      ``orthogonal_procrustes``-based alignment in the reference.
    """
    t1 = jnp.mean(gt, axis=-2, keepdims=True)
    t2 = jnp.mean(pred, axis=-2, keepdims=True)
    x1 = gt - t1
    x2 = pred - t2
    s1 = jnp.linalg.norm(x1, axis=(-2, -1), keepdims=True) + 1e-8
    s2 = jnp.linalg.norm(x2, axis=(-2, -1), keepdims=True) + 1e-8
    x1 = x1 / s1
    x2 = x2 / s2

    # orthogonal_procrustes(x1, x2): R = argmin ||x1 @ R - x2||; SciPy returns
    # (R, s) from SVD of x1^T x2. Aligned pred = (x2 @ R^T) * s.
    m = jnp.einsum("...ij,...ik->...jk", x1, x2, precision="highest")  # (..., 3, 3)
    u, sv, vt = jnp.linalg.svd(m)
    r = jnp.einsum("...ij,...jk->...ik", u, vt, precision="highest")
    s = jnp.sum(sv, axis=-1)[..., None, None]

    aligned = jnp.einsum("...nj,...ij->...ni", x2, r, precision="highest") * s
    return aligned * s1 + t1
