"""Multi-view dataset inspector.

Equivalent of the reference's interactive checker
(scripts/viz_multiview_dataset.py:1-432, per-dataset 3D viewer configs
at the top of that file): for every inspected sample it writes a
contact sheet —

* one panel per view: the image with GT 2D joints (red), the
  reprojection of the master-space 3D joints (green), and, when GT
  vertices exist, the GT mesh rasterised over the view,
* one 3D panel: the master-space skeleton + camera positions drawn with
  matplotlib (the headless stand-in for the reference's Open3D
  VizContext).

The reprojection overlay IS the correctness check: a mis-calibrated
sample shows immediately as skeleton drift. Headless by design;
artifacts land in --out.

Three sources:
  python scripts/viz_multiview_dataset.py --synthetic --out tmp/viz
  python scripts/viz_multiview_dataset.py --urls "data/..._{000000..000003}.tar" --out tmp/viz
  python scripts/viz_multiview_dataset.py --dataset dexycb --data_root data --out tmp/viz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# per-dataset inspection configs (reference scripts/viz_multiview_dataset.py
# DEXYCB_3D_CONFIG / HO3D_3D_CONFIG / OAKINK_3D_CONFIG / INTERHAND_MV_CONFIG /
# ARCTIC_MV_CONFIG; aug params dropped — the inspector looks at raw samples)
DATASET_3D_CONFIGS = {
    "dexycb": dict(
        TYPE="DexYCBMultiView", DATA_SPLIT="train", N_VIEWS=8, SETUP="s0",
        USE_LEFT_HAND=False, FILTER_INVISIBLE_HAND=True,
        MASTER_SYSTEM="as_constant_camera",
    ),
    "ho3d": dict(
        TYPE="HO3Dv3MultiView", DATA_SPLIT="train", N_VIEWS=5, CONST_CAM_ID=2,
        USE_GT_FROM_MULTIVIEW=True, SPLIT_MODE="paper",
        MASTER_SYSTEM="as_constant_camera",
    ),
    "oakink": dict(
        TYPE="OakInkMultiView", DATA_SPLIT="train+val", SPLIT_MODE="subject",
        N_VIEWS=4, MASTER_SYSTEM="as_constant_camera",
    ),
    "interhand": dict(
        TYPE="InterHandMultiView", DATA_SPLIT="train", N_VIEWS=8,
        SKIP_FRAMES=3, MASTER_SYSTEM="as_first_camera", USE_LEFT_HAND=False,
    ),
    "arctic": dict(
        TYPE="ArcticMultiView", DATA_SPLIT="train", N_VIEWS=8, SETUP="p1",
        MASTER_SYSTEM="as_first_camera",
    ),
}


def _pin_cpu():
    """Viz is host-side work; avoid shipping tiny graphs to a remote TPU."""
    try:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass


def _invert_rigid(T):
    R, t = T[:3, :3], T[:3, 3]
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


def _project(j3d_master, intr, extr_c2m):
    """Master-space points -> pixels of the view whose cam->master is extr."""
    m2c = _invert_rigid(np.asarray(extr_c2m, np.float64))
    cam = np.asarray(j3d_master, np.float64) @ m2c[:3, :3].T + m2c[:3, 3]
    proj = cam @ np.asarray(intr, np.float64).T
    return proj[:, :2] / np.clip(proj[:, 2:], 1e-9, None), cam


def _skeleton_3d_panel(j3d, cam_centers, size):
    """Matplotlib 3D skeleton + camera positions, rendered to an RGB array."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from poem_v2_tpu.viztools.draw import HAND_LINKS

    fig = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    j = np.asarray(j3d)
    for a, b in HAND_LINKS:
        ax.plot(*zip(j[a], j[b]), c="tab:blue", lw=1.5)
    ax.scatter(j[:, 0], j[:, 1], j[:, 2], c="tab:red", s=8)
    if len(cam_centers):
        c = np.asarray(cam_centers)
        ax.scatter(c[:, 0], c[:, 1], c[:, 2], c="k", marker="^", s=24)
    ax.set_box_aspect((1, 1, 1))
    ax.set_title("master space", fontsize=8)
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    import cv2

    return cv2.resize(buf, (size, size))


def _contact_sheet(images, gt2d, intr, extr, j3d_master, verts_master, out_path):
    """Write one PNG: per-view overlay panels + a 3D skeleton panel."""
    import cv2

    from poem_v2_tpu.viztools.draw import draw_joints_2d
    from poem_v2_tpu.viztools.renderer import render_mesh_overlay
    from poem_v2_tpu.viztools.wireframe import (
        caption_combined_view, combine_view, draw_wireframe_hand)

    faces = None
    if verts_master is not None:
        from poem_v2_tpu.mano import ManoLayer

        faces = ManoLayer().faces

    panels = []
    cam_centers = []
    size = images[0].shape[0]
    for v in range(len(images)):
        img = np.ascontiguousarray(images[v])
        if img.dtype != np.uint8:
            from poem_v2_tpu.viztools.draw import denormalize_image

            img = denormalize_image(img)
        reproj, cam_pts = _project(j3d_master, intr[v], extr[v])
        if verts_master is not None:
            _, verts_cam = _project(verts_master, intr[v], extr[v])
            img = render_mesh_overlay(img, verts_cam, faces, intr[v], alpha=0.45)
        if gt2d is not None and gt2d[v] is not None:
            # reference drawing vocabulary: typed per-phalanx markers +
            # per-finger colour ramps (vis_cv2_util.py:282-291)
            draw_wireframe_hand(img, np.asarray(gt2d[v]),
                                np.ones(len(gt2d[v]), bool))
        img = draw_joints_2d(img, reproj, color_override=(70, 255, 70), radius=1)
        panels.append(cv2.resize(img, (size, size)) if img.shape[0] != size else img)
        cam_centers.append(np.asarray(extr[v], np.float64)[:3, 3])

    panels.append(_skeleton_3d_panel(j3d_master, cam_centers, size))
    grid = combine_view(panels, ncol=min(4, len(panels)))
    grid = caption_combined_view(
        grid, os.path.splitext(os.path.basename(out_path))[0])
    cv2.imwrite(out_path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    # mean reprojection error vs GT 2D, the numeric form of the eyeball check
    errs = []
    if gt2d is not None:
        for v in range(len(images)):
            if gt2d[v] is None:
                continue
            reproj, _ = _project(j3d_master, intr[v], extr[v])
            errs.append(np.linalg.norm(reproj - np.asarray(gt2d[v]), axis=-1).mean())
    return float(np.mean(errs)) if errs else float("nan")


def main(argv=None):
    _pin_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--urls", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None, choices=sorted(DATASET_3D_CONFIGS))
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", type=str, default="tmp/viz")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    args = p.parse_args(argv)

    from poem_v2_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)

    if args.dataset:
        # map-style adapter path (per-dataset config table above)
        from poem_v2_tpu.data import adapters  # noqa: F401 — registers types
        from poem_v2_tpu.utils.registry import DATASET

        cfg = Config({**DATASET_3D_CONFIGS[args.dataset], "DATA_ROOT": args.data_root})
        ds = DATASET.get(cfg.TYPE)(cfg)

        def samples():
            for i in range(min(args.num, len(ds))):
                item = ds[i]
                lbl = item["label"]
                extr = [np.asarray(e) for e in lbl["cam_extr"]]
                j3d_per_view = [np.asarray(j) for j in lbl["joints_3d"]]
                # master space: view 0's joints through its cam->master
                j0_h = np.concatenate([j3d_per_view[0], np.ones((21, 1))], axis=1)
                j3d_master = (extr[0] @ j0_h.T).T[:, :3]
                verts_master = None
                if lbl.get("verts_3d") is not None and lbl["verts_3d"][0] is not None:
                    v0 = np.asarray(lbl["verts_3d"][0])
                    v0_h = np.concatenate([v0, np.ones((len(v0), 1))], axis=1)
                    verts_master = (extr[0] @ v0_h.T).T[:, :3]
                yield {
                    "images": item["images"],
                    "gt2d": [np.asarray(j) for j in lbl["joints_2d"]],
                    "intr": [np.asarray(k) for k in lbl["cam_intr"]],
                    "extr": extr,
                    "j3d_master": j3d_master,
                    "verts_master": verts_master,
                }
    elif args.synthetic or not args.urls:
        from poem_v2_tpu.data import SyntheticMultiviewDataset

        gen = SyntheticMultiviewDataset(
            batch_size=1, view_max=4, image_size=args.image_size, random_views=False
        )

        def samples():
            for _ in range(args.num):
                b = gen.sample_batch()
                yield {
                    "images": list(b["image"][0]),
                    "gt2d": list(b["target_joints_2d"][0]),
                    "intr": list(b["cam_intr"][0]),
                    "extr": list(b["cam_extr"][0]),
                    "j3d_master": b["master_joints_3d"][0],
                    "verts_master": b.get("master_verts_3d", [None])[0],
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
                yield {
                    "images": list(np.asarray(s["image"])),
                    "gt2d": list(np.asarray(s["target_joints_2d"])),
                    "intr": list(np.asarray(s["target_cam_intr"])),
                    "extr": list(np.asarray(s["target_cam_extr"])),
                    "j3d_master": np.asarray(s["master_joints_3d"]),
                    "verts_master": (
                        np.asarray(s["master_verts_3d"]) if "master_verts_3d" in s else None
                    ),
                }

    for i, s in enumerate(samples()):
        path = os.path.join(args.out, f"sample_{i:03d}.png")
        err = _contact_sheet(
            s["images"], s["gt2d"], s["intr"], s["extr"],
            s["j3d_master"], s["verts_master"], path,
        )
        print(f"wrote {path} (mean reprojection err {err:.2f} px)")


if __name__ == "__main__":
    main()
