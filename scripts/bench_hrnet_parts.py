"""HRNet micro-decomposition on the TPU: where do the 30 ms go?

Times (one jitted program per row, fabricated params):
  * raw 3x3 convs at each branch geometry -> achieved TFLOP/s vs channel width
  * one BasicBlock per branch
  * one HRModule per stage
  * stem + stage1 (bottlenecks)

Usage: python scripts/bench_hrnet_parts.py [--what convs|blocks|modules|stem]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)  # B8 x V8
    p.add_argument("--what", type=str, default="all",
                   choices=["all", "convs", "blocks", "modules", "stem"])
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from poem_v2_tpu.utils.benchmarking import time_fn

    BN = args.images
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    w = 40
    chans = (w, 2 * w, 4 * w, 8 * w)
    geoms = [(64, 64, chans[0]), (32, 32, chans[1]), (16, 16, chans[2]), (8, 8, chans[3])]

    def report(name, dtime, flops=None):
        eff = f"  {flops / dtime / 1e12:6.1f} TF/s" if flops else ""
        print(f"{name:44s} {dtime * 1e3:8.3f} ms{eff}", flush=True)

    if args.what in ("all", "convs"):
        # raw 3x3 same-channel convs at each geometry + a 128/256-wide control
        for (H, W, C) in geoms + [(64, 64, 128), (32, 32, 256)]:
            x = jax.random.normal(rng, (BN, H, W, C), dtype=dt)
            k = jax.random.normal(rng, (3, 3, C, C), dtype=dt) * 0.05

            def conv(x, k):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

            f = jax.jit(conv)
            t = time_fn(f, x, k, iters=args.iters)
            flops = 2 * BN * H * W * 9 * C * C
            report(f"conv3x3 {H}x{W}x{C}->{C} x{BN}", t, flops)

    if args.what in ("all", "blocks"):
        from poem_v2_tpu.models.backbones.resnet import BasicBlock

        for (H, W, C) in geoms:
            x = jax.random.normal(rng, (BN, H, W, C), dtype=dt)
            blk = BasicBlock(C, norm="frozen_bn", dtype=dt)
            shapes = jax.eval_shape(lambda: blk.init(rng, x))
            rs = np.random.RandomState(0)
            v = jax.tree_util.tree_map(
                lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes)
            f = jax.jit(lambda v, x: blk.apply(v, x))
            t = time_fn(f, v, x, iters=args.iters)
            flops = 2 * 2 * BN * H * W * 9 * C * C
            report(f"BasicBlock {H}x{W}x{C} x{BN}", t, flops)

    if args.what in ("all", "modules"):
        from poem_v2_tpu.models.backbones.hrnet import HRModule

        for nb, tag in ((2, "stage2"), (3, "stage3"), (4, "stage4")):
            xs = [jax.random.normal(rng, (BN, h, wd, c), dtype=dt)
                  for (h, wd, c) in geoms[:nb]]
            mod = HRModule(chans[:nb], 4, "frozen_bn", dtype=dt)
            shapes = jax.eval_shape(lambda: mod.init(rng, xs))
            rs = np.random.RandomState(0)
            v = jax.tree_util.tree_map(
                lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes)
            f = jax.jit(lambda v, xs: mod.apply(v, xs)[0])
            t = time_fn(f, v, xs, iters=args.iters)
            report(f"HRModule {tag} ({nb} branches) x{BN}", t)

    if args.what in ("all", "stem"):
        import flax.linen as nn
        from poem_v2_tpu.models.backbones.resnet import Bottleneck, make_norm

        class Stem(nn.Module):
            dtype: jnp.dtype = jnp.bfloat16

            @nn.compact
            def __call__(self, image):
                x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                            dtype=self.dtype, name="stem1")(image)
                x = make_norm("frozen_bn", 64, self.dtype, name="stem1_norm")(x)
                x = nn.relu(x)
                x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                            dtype=self.dtype, name="stem2")(x)
                x = make_norm("frozen_bn", 64, self.dtype, name="stem2_norm")(x)
                x = nn.relu(x)
                for b in range(4):
                    x = Bottleneck(64, norm="frozen_bn", dtype=self.dtype,
                                   name=f"layer1_block{b}")(x)
                return x

        img = jax.random.normal(rng, (BN, 256, 256, 3), dtype=dt)
        stem = Stem()
        shapes = jax.eval_shape(lambda: stem.init(rng, img))
        rs = np.random.RandomState(0)
        v = jax.tree_util.tree_map(
            lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes)
        f = jax.jit(lambda v, x: stem.apply(v, x))
        t = time_fn(f, v, img, iters=args.iters)
        report(f"stem + 4 bottlenecks x{BN}", t)


if __name__ == "__main__":
    main()
