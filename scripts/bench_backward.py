"""Backward-pass micro-bench: locate the train-step bottleneck.

Times forward vs forward+backward for the decoder stack and for the
isolated gather (take_along_axis) whose backward is a scatter-add.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, name=""):
    from poem_v2_tpu.utils.benchmarking import time_fn

    dt = time_fn(fn, *args, iters=iters)
    print(f"{name:48s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    B = args.batch
    rng = jax.random.PRNGKey(0)
    dt16 = jnp.bfloat16

    from poem_v2_tpu.models.decoder import PtEmbedDecoder
    from poem_v2_tpu.ops.points import index_points, knn_points

    qx = jax.random.normal(rng, (B, 799, 3))
    qf = jax.random.normal(rng, (B, 799, 256), dtype=dt16)
    px = jax.random.normal(rng, (B, 4096, 3))
    pf = jax.random.normal(rng, (B, 4096, 256), dtype=dt16)
    qa = jnp.arange(32, dtype=jnp.int32)

    # 1. gather fwd vs fwd+bwd (scatter-add backward)
    idx = knn_points(qx, px, 32, approx=True)[1]

    def gather_loss(feats):
        return jnp.sum(index_points(feats, idx).astype(jnp.float32) ** 2)

    timeit(jax.jit(lambda f: index_points(f, idx)), pf, name="gather (B,799,32,256) fwd")
    timeit(jax.jit(jax.grad(gather_loss)), pf, name="gather fwd+bwd (scatter-add)")

    # 2. knn fwd vs grad-through (top_k backward)
    def knn_loss(q):
        d, i, nn = knn_points(q, px, 32, approx=True)
        return jnp.sum(nn**2)

    timeit(jax.jit(jax.grad(knn_loss)), qx, name="knn approx fwd+bwd")

    # 3. decoder fwd vs fwd+bwd, remat on/off
    for remat in (True, False):
        dec = PtEmbedDecoder(n_blocks=3, hidden_size=256, remat=remat, dtype=dt16)
        variables = dec.init({"params": rng, "dropout": rng}, qx, qf, px, pf, qa, qa)

        def loss(params, drng):
            out, _, _ = dec.apply(
                {"params": params}, qx, qf, px, pf, qa, qa, deterministic=False,
                rngs={"dropout": drng},
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        drng = jax.random.PRNGKey(1)
        timeit(
            jax.jit(lambda p: loss(p, drng)), variables["params"],
            name=f"decoder train-fwd (remat={remat})",
        )
        timeit(
            jax.jit(jax.grad(lambda p: loss(p, drng))), variables["params"],
            name=f"decoder fwd+bwd (remat={remat})",
        )


if __name__ == "__main__":
    main()
