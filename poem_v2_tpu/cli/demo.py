"""Demo: run the flagship predictor on sample frames and write overlays.

Serving-path counterpart of the reference's viz tooling
(scripts/viz_multiview_dataset.py renders dataset samples): loads a
config (+ optional checkpoint), builds a ``Predictor``, runs a batch
(from a dumped shard or the synthetic generator), and writes per-view
mesh/keypoint overlays.

    python -m poem_v2_tpu.cli.demo -c configs/release/train_medium.yaml \
        --reload exp/poem_medium/checkpoints/checkpoint --out demo_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--cfg", type=str, required=True)
    p.add_argument("--reload", type=str, default=None)
    p.add_argument("--out", type=str, default="demo_out")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..data import SyntheticMultiviewDataset, create_dataset
    from ..serving import Predictor
    from ..utils.config import Config
    from ..viztools import draw_joints_2d, denormalize_image, tile_views
    from ..viztools.renderer import draw_batch_mesh_images

    cfg = Config.from_yaml(args.cfg)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    predictor = Predictor.from_config(cfg, args.reload, view_bucket=args.views, dtype=dtype)

    if "DATASET" in cfg and "TEST" in cfg.DATASET:
        ds = create_dataset(cfg.DATASET.TEST, data_preset=cfg.DATA_PRESET, is_train=False)
        it = iter(ds)
        samples = [next(it) for _ in range(args.batch)]
        from ..data.collate import collate_padded

        batch = collate_padded(samples, view_max=args.views)
    else:
        size = cfg.DATA_PRESET.IMAGE_SIZE[0] if "DATA_PRESET" in cfg else 256
        batch = SyntheticMultiviewDataset(
            batch_size=args.batch, view_max=args.views, image_size=size,
            seed=0, random_views=False,
        ).sample_batch()

    out = predictor(batch["image"], batch["cam_intr"], batch["cam_extr"],
                    view_mask=batch["view_mask"])

    os.makedirs(args.out, exist_ok=True)
    from ..mano import ManoLayer

    faces = np.asarray(ManoLayer().faces)
    images = np.stack([
        np.stack([denormalize_image(v) for v in sample]) for sample in np.asarray(batch["image"])
    ])
    overlays = draw_batch_mesh_images(
        images, out["verts_3d"], np.asarray(batch["cam_intr"]),
        np.asarray(batch["cam_extr"]), faces, view_mask=np.asarray(batch["view_mask"]),
    )
    import cv2

    for b in range(overlays.shape[0]):
        panels = [
            draw_joints_2d(overlays[b, v], out["joints_uv"][b, v])
            for v in range(args.views) if batch["view_mask"][b][v]
        ]
        grid = tile_views(np.stack(panels), cols=min(4, len(panels)))
        path = os.path.join(args.out, f"demo_{b}.png")
        cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
