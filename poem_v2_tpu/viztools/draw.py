"""2D visualization of joints / verts over images (host-side, cv2).

Capability parity with the reference draw utilities used by training
summaries and the eval draw callback (lib/viztools/draw.py:49-501,
lib/utils/vis_cv2_util.py): skeleton wireframes, vertex scatters,
pred-vs-GT side-by-side panels, multi-view tiling. Pure numpy/cv2 —
visualization never touches the device.
"""

from __future__ import annotations


import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# OpenPose hand skeleton links
HAND_LINKS = [
    (0, 1), (1, 2), (2, 3), (3, 4),
    (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12),
    (0, 13), (13, 14), (14, 15), (15, 16),
    (0, 17), (17, 18), (18, 19), (19, 20),
]

_FINGER_COLORS = [
    (255, 80, 80),
    (255, 160, 60),
    (80, 220, 80),
    (80, 150, 255),
    (200, 90, 230),
]


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """float (H, W, 3) in [-0.5, 0.5] -> uint8 RGB."""
    return np.clip((img + 0.5) * 255.0, 0, 255).astype(np.uint8)


def draw_joints_2d(
    image: np.ndarray, joints_2d: np.ndarray, color_override=None, radius: int = 2
) -> np.ndarray:
    """Draw a hand skeleton; image uint8 (H, W, 3), joints (21, 2) pixels."""
    out = image.copy()
    for li, (a, b) in enumerate(HAND_LINKS):
        color = color_override or _FINGER_COLORS[li // 4]
        pa = tuple(np.round(joints_2d[a]).astype(int))
        pb = tuple(np.round(joints_2d[b]).astype(int))
        cv2.line(out, pa, pb, color, 1, cv2.LINE_AA)
    for j in range(joints_2d.shape[0]):
        p = tuple(np.round(joints_2d[j]).astype(int))
        cv2.circle(out, p, radius, (255, 255, 255), -1, cv2.LINE_AA)
    return out


def draw_verts_2d(image: np.ndarray, verts_2d: np.ndarray, color=(120, 220, 120)) -> np.ndarray:
    out = image.copy()
    for v in range(0, verts_2d.shape[0], 2):
        p = tuple(np.round(verts_2d[v]).astype(int))
        if 0 <= p[0] < out.shape[1] and 0 <= p[1] < out.shape[0]:
            out[p[1], p[0]] = color
    return out


def draw_batch_joint_images(
    pred_2d: np.ndarray, gt_2d: np.ndarray, images: np.ndarray, step: int = 0
) -> np.ndarray:
    """Side-by-side pred|GT skeleton panels, (B, H, 2W, 3) uint8.

    Mirrors reference draw_batch_joint_images (viztools/draw.py:84).
    """
    panels = []
    for b in range(images.shape[0]):
        img = denormalize_image(np.asarray(images[b]))
        left = draw_joints_2d(img, np.asarray(pred_2d[b]))
        right = draw_joints_2d(img, np.asarray(gt_2d[b]), color_override=(60, 60, 255))
        panels.append(np.concatenate([left, right], axis=1))
    return np.stack(panels)


def draw_batch_verts_images(
    pred_v2d: np.ndarray, gt_v2d: np.ndarray, images: np.ndarray, step: int = 0
) -> np.ndarray:
    """Side-by-side pred|GT vertex scatters (reference viztools/draw.py:49)."""
    panels = []
    for b in range(images.shape[0]):
        img = denormalize_image(np.asarray(images[b]))
        left = draw_verts_2d(img, np.asarray(pred_v2d[b]))
        right = draw_verts_2d(img, np.asarray(gt_v2d[b]), color=(60, 60, 255))
        panels.append(np.concatenate([left, right], axis=1))
    return np.stack(panels)


def draw_3d_skeleton(image_size, joints_xyz: np.ndarray) -> np.ndarray:
    """Render a 3D hand skeleton to an (H, W, 3) uint8 panel.

    Matplotlib stand-in for the reference's mayavi/matplotlib 3D panel
    (lib/viztools/draw.py:349): camera-space joints on a 3D axes,
    fingers coloured like the 2D overlay.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = image_size
    fig = plt.figure(figsize=(w / 100.0, h / 100.0), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    j = np.asarray(joints_xyz, dtype=np.float64)
    for li, (a, b) in enumerate(HAND_LINKS):
        c = np.asarray(_FINGER_COLORS[li // 4], dtype=np.float64) / 255.0
        ax.plot(j[[a, b], 0], j[[a, b], 2], -j[[a, b], 1], color=tuple(c), lw=2)
    ax.scatter(j[:, 0], j[:, 2], -j[:, 1], s=8, c="k")
    ax.set_box_aspect((1, 1, 1))
    ax.view_init(elev=20, azim=-70)
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    if buf.shape[:2] != (h, w):
        buf = cv2.resize(buf, (w, h))
    return buf


def save_a_image_with_mesh_joints(
    image: np.ndarray,      # (H, W, 3) uint8 RGB
    cam_param: np.ndarray,  # (3, 3) intrinsics
    mesh_xyz: np.ndarray,   # (778, 3) CAMERA-space vertices
    face: np.ndarray,       # (F, 3)
    pose_uv: np.ndarray,    # (21, 2) pixel joints
    pose_xyz: np.ndarray,   # (21, 3) CAMERA-space joints
    file_name: str = None,
    padding: int = 0,
    ret: bool = False,
    with_skeleton_3d: bool = False,
    renderer=None,
) -> np.ndarray:
    """Per-sample composite: [raw | 2D skeleton | shaded mesh overlay]
    (+ optional 3D-skeleton panel), one row, written as one image.

    Reference-equivalent of ``save_a_image_with_mesh_joints``
    (lib/viztools/draw.py:501) as used by the eval draw callback
    (lib/utils/testing.py:171-193, mayavi/3D panels off): the mesh panel
    is rendered by the painter rasteriser instead of OpenDR.
    """
    if renderer is None:
        from .renderer import render_mesh_overlay as renderer
    rend = renderer(image, mesh_xyz, face, cam_param)
    skeleton = draw_joints_2d(image, pose_uv)
    img_list = [image, skeleton, rend]
    if with_skeleton_3d:
        img_list.append(draw_3d_skeleton(image.shape[:2], pose_xyz))

    h, w = image.shape[:2]
    grid = np.zeros((h + padding, len(img_list) * (w + padding), 3), np.uint8)
    x = 0
    for panel in img_list:
        grid[:h, x : x + w] = panel[..., :3]
        x += w + padding
    if ret or file_name is None:
        return grid
    cv2.imwrite(file_name, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return grid


def tile_views(images: np.ndarray, cols: int = 4) -> np.ndarray:
    """Tile (V, H, W, 3) views into a grid image."""
    v, h, w, c = images.shape
    rows = (v + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), dtype=images.dtype)
    for i in range(v):
        r, cc = divmod(i, cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = images[i]
    return grid
