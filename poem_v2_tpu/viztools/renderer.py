"""Host-side mesh renderer for visualisation.

Replaces the reference's OpenDR / neural_renderer visualisation paths
(reference lib/viztools/opendr_renderer.py, lib/utils/neural_renderer.py
— both CUDA/C renderers used only for drawing): a painter's-algorithm
rasterizer with Lambertian flat shading built on cv2 polygon fills.
Depth-sorted back-to-front with backface culling — artifact-free enough
for eval overlays, zero extra dependencies, stays off-TPU by design.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def render_mesh_overlay(
    image: np.ndarray,  # (H, W, 3) uint8
    verts_cam: np.ndarray,  # (N, 3) camera-space, z > 0
    faces: np.ndarray,  # (F, 3) int
    cam_intr: np.ndarray,  # (3, 3)
    color: Tuple[int, int, int] = (120, 190, 230),
    alpha: float = 0.65,
    light_dir: Sequence[float] = (0.2, 0.2, -1.0),
) -> np.ndarray:
    """Rasterise a mesh over ``image`` (returns a new array)."""
    import cv2

    H, W = image.shape[:2]
    verts = np.asarray(verts_cam, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    K = np.asarray(cam_intr, dtype=np.float64)

    z = np.clip(verts[:, 2], 1e-6, None)
    uv = (verts @ K.T)[:, :2] / z[:, None]  # (N, 2)

    tri = verts[faces]  # (F, 3, 3)
    # face normal + lambertian shade
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n_norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.clip(n_norm, 1e-12, None)
    light = np.asarray(light_dir, dtype=np.float64)
    light = light / np.linalg.norm(light)
    shade = np.clip(-(n @ light), 0.15, 1.0)  # (F,)
    # backface culling: keep faces facing the camera (normal towards -z)
    centroid = tri.mean(axis=1)
    visible = np.einsum("fi,fi->f", n, centroid) < 0
    depth = centroid[:, 2]

    order = np.argsort(-depth)  # far -> near
    layer = image.copy()
    uv_faces = uv[faces].astype(np.int32)  # (F, 3, 2)
    col = np.asarray(color, dtype=np.float64)
    for f in order:
        if not visible[f]:
            continue
        pts = uv_faces[f]
        if (pts[:, 0].max() < 0 or pts[:, 0].min() >= W
                or pts[:, 1].max() < 0 or pts[:, 1].min() >= H):
            continue
        c = tuple(int(v) for v in (col * shade[f]))
        cv2.fillConvexPoly(layer, pts, c, lineType=cv2.LINE_AA)
    out = cv2.addWeighted(layer, alpha, image, 1.0 - alpha, 0.0)
    return out


def draw_batch_mesh_images(
    images: np.ndarray,  # (B, V, H, W, 3) uint8
    verts_3d: np.ndarray,  # (B, 778, 3) master space
    cam_intr: np.ndarray,  # (B, V, 3, 3)
    cam_extr: np.ndarray,  # (B, V, 4, 4) camera->master
    faces: np.ndarray,
    view_mask: Optional[np.ndarray] = None,  # (B, V)
    **kwargs,
) -> np.ndarray:
    """Mesh overlays for every valid view (reference viztools/draw.py
    renders the same grid with OpenDR)."""
    B, V = images.shape[:2]
    out = images.copy()
    for b in range(B):
        for v in range(V):
            if view_mask is not None and not view_mask[b, v]:
                continue
            extr = np.asarray(cam_extr[b, v], dtype=np.float64)
            inv = np.linalg.inv(extr)
            v_cam = verts_3d[b] @ inv[:3, :3].T + inv[:3, 3]
            out[b, v] = render_mesh_overlay(
                images[b, v], v_cam, faces, cam_intr[b, v], **kwargs
            )
    return out
