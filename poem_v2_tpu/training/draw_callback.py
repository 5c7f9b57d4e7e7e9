"""Drawing eval callback: render predictions over every view.

Equivalent of the reference ``DrawingHandCallback``
(lib/utils/testing.py:101-193) — where the reference rasterises the
predicted and GT meshes with OpenDR per view, this projects the
predicted/GT joints and vertices into each valid view with the batched
camera ops and draws 2D overlays host-side (cv2), writing one composite
image per sample. Mesh rasterisation stays off-TPU by design.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid
from .evaluator import IdleCallback


class DrawingHandCallback(IdleCallback):
    def __init__(self, exp_dir: str, max_samples: int = 64, render_mesh: bool = False,
                 faces=None, composites: bool = True):
        """``render_mesh=True`` additionally rasterises the predicted mesh
        over each view of the tiled grid (host-side painter renderer,
        viztools/renderer.py) — the reference's OpenDR overlay path.
        ``composites=True`` writes the reference's per-view artifacts
        (testing.py:171-193): for every valid view a PRED and a GT
        ``save_a_image_with_mesh_joints`` composite
        ([raw | 2D skeleton | shaded mesh overlay]).  ``faces``: (F, 3)
        mesh faces; defaults to the MANO topology."""
        self.exp_dir = os.path.join(exp_dir, "draws")
        os.makedirs(self.exp_dir, exist_ok=True)
        self.max_samples = max_samples
        self.render_mesh = render_mesh
        self.composites = composites
        self._faces = faces
        self._drawn = 0

    @property
    def faces(self):
        if self._faces is None:
            from ..mano import ManoLayer

            self._faces = np.asarray(ManoLayer().faces)
        return self._faces

    def __call__(self, preds: Dict, batch: Dict, step_idx: int, **kwargs):
        if self._drawn >= self.max_samples:
            return
        import jax.numpy as jnp

        from ..viztools.draw import denormalize_image, draw_joints_2d, draw_verts_2d, tile_views

        images = np.asarray(batch["image"])  # (B, V, H, W, 3)
        vm = np.asarray(batch["view_mask"])
        extr = jnp.asarray(batch["cam_extr"])
        intr = jnp.asarray(batch["cam_intr"])
        m2c = invert_rigid(extr)

        pred_j = jnp.asarray(preds["pred_joints_3d"])
        pred_v = jnp.asarray(preds["pred_verts_3d"])
        gt_j = jnp.asarray(batch["master_joints_3d"])

        pj2d = np.asarray(cam_intr_projection(intr, cam_extr_transf(m2c, pred_j[:, None])))
        pv2d = np.asarray(cam_intr_projection(intr, cam_extr_transf(m2c, pred_v[:, None])))
        gj2d = np.asarray(cam_intr_projection(intr, cam_extr_transf(m2c, gt_j[:, None])))
        gt_v = np.asarray(batch["master_verts_3d"]) if "master_verts_3d" in batch else None

        B, V = vm.shape
        for b in range(B):
            if self._drawn >= self.max_samples:
                break
            panels = []
            for v in range(V):
                if not vm[b, v]:
                    continue
                img = denormalize_image(images[b, v])
                inv = np.linalg.inv(np.asarray(extr[b, v], dtype=np.float64))
                if self.composites:
                    self._write_composites(
                        img, inv, np.asarray(intr[b, v]), b, v, step_idx,
                        np.asarray(pred_j[b]), np.asarray(pred_v[b]),
                        np.asarray(gt_j[b]), pj2d[b, v], gj2d[b, v],
                        gt_v[b] if gt_v is not None else None,
                    )
                if self.render_mesh:
                    from ..viztools.renderer import render_mesh_overlay

                    v_cam = np.asarray(pred_v[b]) @ inv[:3, :3].T + inv[:3, 3]
                    img = render_mesh_overlay(img, v_cam, self.faces, np.asarray(intr[b, v]))
                img = draw_verts_2d(img, pv2d[b, v])
                img = draw_joints_2d(img, pj2d[b, v])
                img = draw_joints_2d(img, gj2d[b, v], color_override=(64, 64, 255), radius=1)
                panels.append(img)
            grid = tile_views(np.stack(panels), cols=min(4, len(panels)))
            try:
                import cv2

                cv2.imwrite(
                    os.path.join(self.exp_dir, f"step{step_idx:05d}_s{b}.png"),
                    cv2.cvtColor(grid, cv2.COLOR_RGB2BGR),
                )
            except Exception:
                pass
            self._drawn += 1

    def _write_composites(self, img, inv, intr, b, v, step_idx,
                          pred_j, pred_v, gt_j, pj2d, gj2d, gt_verts):
        """Per-view PRED + GT ``save_a_image_with_mesh_joints`` composites
        (reference testing.py:171-193 writes the same two jpgs per view)."""
        from ..viztools.draw import save_a_image_with_mesh_joints

        R, t = inv[:3, :3], inv[:3, 3]
        pv_cam = pred_v @ R.T + t
        pj_cam = pred_j @ R.T + t
        save_a_image_with_mesh_joints(
            img, intr, pv_cam, self.faces, pj2d, pj_cam,
            os.path.join(self.exp_dir, f"step{step_idx}_frame{b}_view{v}.jpg"),
        )
        if gt_verts is not None:
            gv_cam = gt_verts @ R.T + t
            gj_cam = gt_j @ R.T + t
            save_a_image_with_mesh_joints(
                img, intr, gv_cam, self.faces, gj2d, gj_cam,
                os.path.join(self.exp_dir, f"step{step_idx}_frame{b}_view{v}_GT.jpg"),
            )

    def on_finished(self):
        pass
