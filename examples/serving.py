"""Serving quickstart: persistent jitted predictor on synthetic frames.

Run: python examples/serving.py [--ckpt path]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--views", type=int, default=4)
    args = p.parse_args()

    import jax.numpy as jnp

    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.serving import Predictor
    from poem_v2_tpu.utils.config import Config
    from poem_v2_tpu.utils.misc import CONST  # noqa: F401

    cfg = Config.from_yaml("configs/release/train_medium.yaml")
    pred = Predictor.from_config(cfg, args.ckpt, view_bucket=args.views, dtype=jnp.bfloat16)

    batch = SyntheticMultiviewDataset(
        batch_size=2, view_max=args.views, image_size=256, seed=0, random_views=False
    ).sample_batch()
    out = pred(batch["image"], batch["cam_intr"], batch["cam_extr"],
               view_mask=batch["view_mask"])
    print("joints_3d:", out["joints_3d"].shape, "verts_3d:", out["verts_3d"].shape,
          "finite:", bool(np.isfinite(out["verts_3d"]).all()))


if __name__ == "__main__":
    main()
