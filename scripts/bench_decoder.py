"""Decoder micro-bench: which part of the 3-block stack dominates."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, name=""):
    from poem_v2_tpu.utils.benchmarking import time_fn

    dt = time_fn(fn, *args, iters=iters)
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    rng = jax.random.PRNGKey(0)

    from poem_v2_tpu.models.bricks.attention import MultiHeadCrossAttention
    from poem_v2_tpu.models.bricks.point_transformer import PtCrossAttnBlock, PtSelfAttnBlock
    from poem_v2_tpu.ops.points import knn_points, square_distance

    qf = jax.random.normal(rng, (B, 799, 256), dtype=dtype)
    pf = jax.random.normal(rng, (B, 4096, 256), dtype=dtype)
    qx = jax.random.normal(rng, (B, 799, 3))
    px = jax.random.normal(rng, (B, 4096, 3))

    # 1. one bert cross attention 799 -> 4096
    mha = MultiHeadCrossAttention(256, 4, 0.1, dtype=dtype)
    v = mha.init(rng, qf, pf)
    timeit(jax.jit(lambda v, a, b: mha.apply(v, a, b)), v, qf, pf, name="bert cross-attn 799x4096 (x6 in model)")

    # 2. KNN exact vs approx
    timeit(jax.jit(lambda a, b: knn_points(a, b, 32)[1]), qx, px, name="knn exact top_k 4096->32 (x3)")
    timeit(
        jax.jit(lambda a, b: knn_points(a, b, 32, approx=True)[1]), qx, px,
        name="knn approx_max_k 4096->32",
    )
    timeit(jax.jit(lambda a, b: square_distance(a, b)), qx, px, name="  (distance matmul only)")

    # 3. vector attention blocks
    self_blk = PtSelfAttnBlock(256, 256, 32, dtype=dtype)
    v2 = self_blk.init(rng, qx, qf)
    timeit(jax.jit(lambda v, a, b: self_blk.apply(v, a, b)), v2, qx, qf, name="vector self-attn 799 k=32 (x3)")

    cross_blk = PtCrossAttnBlock(256, 256, 32, dtype=dtype)
    v3 = cross_blk.init(rng, px, pf, qx, qf)
    timeit(
        jax.jit(lambda v, a, b, c, d: cross_blk.apply(v, a, b, c, d)), v3, px, pf, qx, qf,
        name="vector cross-attn 799->4096 k=32 (x3)",
    )


if __name__ == "__main__":
    main()
