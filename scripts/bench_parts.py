"""Per-stage timing of the POEM forward (TPU, single chip).

Times each stage as its own jitted program to locate the bottleneck:
backbone / necks / BPS sampling+merge / decoder / DLT.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, name=""):
    from poem_v2_tpu.utils.benchmarking import time_fn

    dt = time_fn(fn, *args, iters=iters)
    print(f"{name:35s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--backbone", type=str, default="resnet34")
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, V = args.batch, args.views
    BN = B * V
    rng = jax.random.PRNGKey(0)

    from poem_v2_tpu.models.backbones.resnet import ResNet
    from poem_v2_tpu.models.neck import ResNetFeatNeck, UVDecodeNeck
    from poem_v2_tpu.models.decoder import PtEmbedDecoder
    from poem_v2_tpu.ops.sampling import grid_sample_points
    from poem_v2_tpu.geometry.triangulation import triangulate_dlt

    # --- backbone -----------------------------------------------------------
    bb = ResNet(arch=args.backbone, norm="gn", dtype=dtype)
    img = jax.random.normal(rng, (BN, 256, 256, 3), dtype=dtype)
    bb_vars = bb.init(rng, img)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x)["res_layer4"])
    timeit(bb_fn, bb_vars, img, name=f"backbone {args.backbone} x{BN}")

    # --- necks ---------------------------------------------------------------
    feats = [
        jax.random.normal(rng, (BN, 64, 64, 64), dtype=dtype),
        jax.random.normal(rng, (BN, 32, 32, 128), dtype=dtype),
        jax.random.normal(rng, (BN, 16, 16, 256), dtype=dtype),
        jax.random.normal(rng, (BN, 8, 8, 512), dtype=dtype),
    ]
    neck = ResNetFeatNeck(feat_size=(512, 256, 128, 64), norm="gn", dtype=dtype)
    neck_vars = neck.init(rng, feats)
    timeit(jax.jit(lambda v, f: neck.apply(v, f)), neck_vars, feats, name="feat neck")
    uv = UVDecodeNeck(feat_size=(512, 256, 128, 64), norm="gn", dtype=dtype)
    uv_vars = uv.init(rng, feats)
    timeit(jax.jit(lambda v, f: uv.apply(v, f)[0]), uv_vars, feats, name="uv neck")

    # --- BPS grid sample -----------------------------------------------------
    fmap = jax.random.normal(rng, (BN, 32, 32, 256), dtype=dtype)
    pts = jax.random.uniform(rng, (BN, 4096, 2), minval=-1, maxval=1, dtype=dtype)
    timeit(jax.jit(grid_sample_points), fmap, pts, name="grid_sample 4096pts")

    # --- decoder -------------------------------------------------------------
    dec = PtEmbedDecoder(n_blocks=3, hidden_size=256, use_flash=True, dtype=dtype)
    qx = jax.random.normal(rng, (B, 799, 3))
    qf = jax.random.normal(rng, (B, 799, 256), dtype=dtype)
    px = jax.random.normal(rng, (B, 4096, 3))
    pf = jax.random.normal(rng, (B, 4096, 256), dtype=dtype)
    qa = jnp.arange(32, dtype=jnp.int32)
    dec_vars = dec.init({"params": rng, "dropout": rng}, qx, qf, px, pf, qa, qa)
    dec_fn = jax.jit(lambda v, a, b, c, d: dec.apply(v, a, b, c, d, qa, qa)[0])
    timeit(dec_fn, dec_vars, qx, qf, px, pf, name="decoder 3 blocks")

    # --- DLT -----------------------------------------------------------------
    kp = jax.random.uniform(rng, (B, V, 21, 2), minval=0, maxval=256)
    intr = jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)).astype(jnp.float32)
    extr = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)).astype(jnp.float32)
    mask = jnp.ones((B, V), dtype=bool)
    timeit(jax.jit(triangulate_dlt), kp, intr, extr, mask, name="DLT 21 joints")


if __name__ == "__main__":
    main()
