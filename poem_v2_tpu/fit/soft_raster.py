"""Differentiable soft silhouette rasterizer (pure JAX).

TPU-native replacement for the reference's pytorch3d soft-silhouette
rendering used by the offline silhouette fitter (reference
lib/fit/pytorch3d_renderer.py:17-128, lib/fit/silhouette_loss.py:9-57).
The pytorch3d path needs a CUDA rasterizer; on TPU the mesh is small
(778 verts / 1538 faces) so an all-pairs formulation is cheap and maps
directly onto the VPU:

    alpha(p) = 1 - prod_f (1 - sigmoid(d_signed(p, f) / sigma))

where ``d_signed`` is the signed squared 2D distance from pixel ``p`` to
triangle ``f`` (positive inside — same sign convention as pytorch3d's
SoftSilhouetteShader). The product is accumulated in log space with a
``lax.scan`` over face chunks, giving static shapes, bounded memory
(pixels x chunk), and exact gradients through both the distances and the
projection.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid


def _point_segment_sq_dist(p, a, b):
    """Squared distance from points p (P, 2) to segments a->b (C, 2)."""
    ab = b - a  # (C, 2)
    ap = p[:, None] - a[None]  # (P, C, 2)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)  # (C,)
    t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / denom[None], 0.0, 1.0)  # (P, C)
    closest = a[None] + t[..., None] * ab[None]  # (P, C, 2)
    d = p[:, None] - closest
    return jnp.sum(d * d, axis=-1)  # (P, C)


def _signed_sq_dist(pixels, tris):
    """Signed squared distance: pixels (P, 2) to triangles (C, 3, 2).

    Positive inside the triangle, negative outside (pytorch3d sign
    convention for silhouette blending).
    """
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    d2 = jnp.minimum(
        _point_segment_sq_dist(pixels, a, b),
        jnp.minimum(
            _point_segment_sq_dist(pixels, b, c),
            _point_segment_sq_dist(pixels, c, a),
        ),
    )  # (P, C)

    def edge_sign(e0, e1):
        ev = e1 - e0  # (C, 2)
        pv = pixels[:, None] - e0[None]  # (P, C, 2)
        return ev[None, :, 0] * pv[..., 1] - ev[None, :, 1] * pv[..., 0]  # (P, C)

    s0, s1, s2 = edge_sign(a, b), edge_sign(b, c), edge_sign(c, a)
    inside = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
    return jnp.where(inside, d2, -d2)


@partial(jax.jit, static_argnames=("size", "chunk"))
def soft_silhouette(
    verts_px: jnp.ndarray,  # (778, 2) vertex positions in raster pixels
    faces: jnp.ndarray,  # (F, 3) int32
    size: int = 128,
    sigma: float = 1.0,  # px^2 blending bandwidth
    chunk: int = 128,
) -> jnp.ndarray:
    """Render one soft silhouette (size, size) in [0, 1]."""
    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid = jnp.concatenate([jnp.ones(F, bool), jnp.zeros(pad, bool)])
    n_chunks = faces_p.shape[0] // chunk

    ys, xs = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    pixels = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32) + 0.5

    tris_all = verts_px[faces_p]  # (F+pad, 3, 2)

    def body(acc, i):
        tris = jax.lax.dynamic_slice_in_dim(tris_all, i * chunk, chunk, axis=0)
        v = jax.lax.dynamic_slice_in_dim(valid, i * chunk, chunk, axis=0)
        d = _signed_sq_dist(pixels, tris)  # (P, C)
        # log(1 - sigmoid(d / sigma)) = log_sigmoid(-d / sigma)
        contrib = jax.nn.log_sigmoid(-d / sigma) * v[None].astype(d.dtype)
        return acc + jnp.sum(contrib, axis=1), None

    acc0 = jnp.zeros((size * size,), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
    alpha = 1.0 - jnp.exp(acc)
    return alpha.reshape(size, size)


def project_to_raster(
    verts: jnp.ndarray,  # (B, 778, 3) world/master space
    cam_intr: jnp.ndarray,  # (B, V, 3, 3)
    cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->master
    img_size: int,
    silh_size: int,
) -> jnp.ndarray:
    """Project verts into each view and rescale to the silhouette raster."""
    extr_m2c = invert_rigid(cam_extr)
    v_cam = cam_extr_transf(extr_m2c, verts[:, None])  # (B, V, 778, 3)
    v2d = cam_intr_projection(cam_intr, v_cam)  # (B, V, 778, 2)
    return v2d * (silh_size / img_size)


def multiview_silhouette_loss(
    cam_intr: jnp.ndarray,  # (B, V, 3, 3)
    cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->master
    verts: jnp.ndarray,  # (B, 778, 3)
    masks: jnp.ndarray,  # (B, V, S, S) target silhouettes in [0, 1]
    faces: jnp.ndarray,  # (F, 3)
    view_mask: Optional[jnp.ndarray] = None,  # (B, V)
    img_size: int = 256,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """L1 between rendered and target silhouettes, masked over padded
    views (reference lib/fit/silhouette_loss.py:27-57)."""
    B, V, S, _ = masks.shape
    v_px = project_to_raster(verts, cam_intr, cam_extr, img_size, S)  # (B, V, 778, 2)
    render = jax.vmap(jax.vmap(lambda v: soft_silhouette(v, faces, size=S, sigma=sigma)))(
        v_px
    )  # (B, V, S, S)
    diff = jnp.abs(render - masks).mean(axis=(-1, -2))  # (B, V)
    if view_mask is None:
        return diff.mean()
    m = view_mask.astype(diff.dtype)
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), 1.0)
