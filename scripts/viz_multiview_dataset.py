"""Multi-view dataset inspector.

Equivalent of the reference's interactive checker
(scripts/viz_multiview_dataset.py, 432 LoC with per-dataset 3D viewer
configs): streams samples from a webdataset shard (or the synthetic
generator), overlays the GT 2D joints and the reprojection of the
master-space 3D joints on every view, tiles the views, and writes PNGs
— the reprojection overlay IS the correctness check (a mis-calibrated
sample shows immediately as skeleton drift). Headless by design: no
Open3D window, artifacts land in --out.

Usage:
  python scripts/viz_multiview_dataset.py --synthetic --out tmp/viz
  python scripts/viz_multiview_dataset.py --urls "data/..._{000000..000003}.tar" --out tmp/viz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pin_cpu():
    """Viz is host-side work; avoid shipping tiny graphs to a remote TPU."""
    try:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass


def main(argv=None):
    _pin_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--urls", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", type=str, default="tmp/viz")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    args = p.parse_args(argv)

    import cv2

    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.viztools.draw import denormalize_image, draw_joints_2d, tile_views

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic or not args.urls:
        from poem_v2_tpu.data import SyntheticMultiviewDataset

        ds = SyntheticMultiviewDataset(
            batch_size=1, view_max=4, image_size=args.image_size, random_views=False
        )

        def samples():
            for _ in range(args.num):
                b = ds.sample_batch()
                yield {
                    "image": b["image"][0],
                    "target_joints_2d": b["target_joints_2d"][0],
                    "target_cam_intr": b["cam_intr"][0],
                    "target_cam_extr": b["cam_extr"][0],
                    "master_joints_3d": b["master_joints_3d"][0],
                }
    else:
        from poem_v2_tpu.data import MultiviewWebDataset

        cfg = Config(
            {
                "URLS": args.urls,
                "DATA_SPLIT": "test",
                "RANDOM_N_VIEWS": False,
                "TRANSFORM": {"TYPE": "SimpleTransform3DMultiView", "AUG": False},
            }
        )
        preset = Config({"IMAGE_SIZE": [args.image_size] * 2, "CENTER_IDX": 0})
        wds = MultiviewWebDataset(cfg, data_preset=preset, is_train=False)

        def samples():
            for i, s in enumerate(wds):
                if i >= args.num:
                    return
                yield s

    for i, s in enumerate(samples()):
        imgs = np.asarray(s["image"])  # (V, H, W, 3) float
        gt2d = np.asarray(s["target_joints_2d"])  # (V, 21, 2)
        intr = np.asarray(s["target_cam_intr"])
        extr = np.asarray(s["target_cam_extr"])
        j3d = np.asarray(s["master_joints_3d"])

        panels = []
        for v in range(imgs.shape[0]):
            img = denormalize_image(imgs[v])
            # GT 2D in red
            img = draw_joints_2d(img, gt2d[v], color_override=(255, 70, 70))
            # reprojected master 3D in green — must coincide with GT 2D
            m2c = np.linalg.inv(extr[v])
            cam = j3d @ m2c[:3, :3].T + m2c[:3, 3]
            proj = cam @ intr[v].T
            reproj = proj[:, :2] / proj[:, 2:]
            img = draw_joints_2d(img, reproj, color_override=(70, 255, 70), radius=1)
            panels.append(img)
        grid = tile_views(np.stack(panels), cols=min(4, len(panels)))
        path = os.path.join(args.out, f"sample_{i:03d}.png")
        cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        err = None
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
