"""Dump multi-view webdataset shards.

Wraps :mod:`poem_v2_tpu.data.dumper` — the shard writer the reference
never released (its lib/data_wds/dumper.py is empty). Sources: any
map-style MultiviewDataset subclass, or the synthetic generator for
smoke-testing the full streaming path.

  python scripts/dump_shards.py --synthetic --out data/dataset_tars/Synth_mv \\
      --prefix Synth_mv_train --num 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", required=True)
    p.add_argument("--prefix", required=True)
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--per-shard", type=int, default=32)
    args = p.parse_args(argv)

    try:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.data.dumper import ShardDumper

    ds = SyntheticMultiviewDataset(
        batch_size=1, view_max=args.views, image_size=args.image_size, random_views=False
    )

    n = 0
    with ShardDumper(args.out, args.prefix, args.per_shard) as dumper:
        for i in range(args.num):
            b = ds.sample_batch()
            imgs = [
                np.clip((b["image"][0, v] + 0.5) * 255, 0, 255).astype(np.uint8)
                for v in range(args.views)
            ]
            label = {
                "cam_serial": [f"cam{v}" for v in range(args.views)],
                "cam_extr": [b["cam_extr"][0, v] for v in range(args.views)],
                "cam_intr": [b["cam_intr"][0, v] for v in range(args.views)],
                "joints_2d": [b["target_joints_2d"][0, v] for v in range(args.views)],
                # per-view camera-space labels
                "joints_3d": [
                    b["master_joints_3d"][0] @ np.linalg.inv(b["cam_extr"][0, v])[:3, :3].T
                    + np.linalg.inv(b["cam_extr"][0, v])[:3, 3]
                    for v in range(args.views)
                ],
                "verts_3d": [
                    b["master_verts_3d"][0] @ np.linalg.inv(b["cam_extr"][0, v])[:3, :3].T
                    + np.linalg.inv(b["cam_extr"][0, v])[:3, 3]
                    for v in range(args.views)
                ],
                "joints_vis": [np.ones(21, np.float32)] * args.views,
                "bbox_center": [b["target_joints_2d"][0, v].mean(0) for v in range(args.views)],
                "bbox_scale": [np.float32(args.image_size * 0.6)] * args.views,
                "raw_size": [np.array([args.image_size, args.image_size])] * args.views,
                "mano_pose": [b["mano_pose"][0].reshape(-1)] * args.views,
                "mano_shape": [b["mano_shape"][0]] * args.views,
            }
            dumper.add_sample(f"seq0/{i:06d}", imgs, label)
            n += 1
    print(f"dumped {n} samples to {args.out}/{args.prefix}-*.tar")


if __name__ == "__main__":
    main()
