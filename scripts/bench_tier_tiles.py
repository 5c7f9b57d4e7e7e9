"""Tile sweep for the fused KNN kernel at the WIDE tiers (D=512/1024).

Round 4 clamped block_q to 32 at d_model >= 1024 purely to stop the VMEM
spill, with no sweep (the existing sweep was D=256 only). This measures
(block_q, chunk_j) over the flagship cross (799 q x 4096 BPS) and self
(799 x 799) shapes at D in {512, 1024}, skipping combinations whose live
f32 intermediates (~K*block_q*D*4 plus the chunk scratch) estimate past
the 100 MB scoped-VMEM budget, and prints per-config ms + the best pick
per (D, shape) as JSON lines.

Usage: python scripts/bench_tier_tiles.py [--k 32] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention
    from poem_v2_tpu.utils.benchmarking import time_fn

    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dims", type=int, nargs="*", default=[512, 1024])
    args = p.parse_args()

    B, M, K = args.batch, 799, args.k
    rs = np.random.RandomState(0)
    budget = 100 * 1024 * 1024

    for D in args.dims:
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)
        wk, wv = mk(D, D), mk(D, D)
        fc_delta = (mk(3, D), mk(D), mk(D, D), mk(D))
        fc_gamma = (mk(D, D), mk(D), mk(D, D), mk(D))
        q = mk(B, M, D)
        qxyz = jnp.asarray(rs.randn(B, M, 3).astype(np.float32) * 0.4)

        for shape_name, N in (("cross", 4096), ("self", 799)):
            pxyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.4)
            x = mk(B, N, D)
            best = None
            for bq in (16, 32, 64, 128):
                for cj in (4, 8, 16, 32):
                    if cj > K or K % cj:
                        continue
                    # live f32 intermediates ~ (K*bq*D) * 3 tensors + the
                    # (cj*bq, Np) scratch + the (B-slice) cloud tensors
                    npad = -N % 128 + N
                    est = (3 * K * bq * D * 4 + cj * bq * npad * 2
                           + npad * D * 2 + npad * 3 * 4)
                    if est > budget:
                        print(json.dumps({"d": D, "shape": shape_name,
                                          "block_q": bq, "chunk_j": cj,
                                          "skipped": "vmem_est",
                                          "est_mb": round(est / 2**20, 1)}))
                        continue
                    try:
                        def fn(q_, qxyz_, pxyz_, x_, bq=bq, cj=cj):
                            return fused_knn_vector_attention(
                                q_, qxyz_, pxyz_, x_, wk, wv, fc_delta,
                                fc_gamma, n_neighbor=K, block_q=bq, chunk_j=cj)

                        ms = time_fn(jax.jit(fn), q, qxyz, pxyz, x, iters=20) * 1e3
                    except Exception as e:  # compile failure = real data
                        print(json.dumps({"d": D, "shape": shape_name,
                                          "block_q": bq, "chunk_j": cj,
                                          "error": type(e).__name__}))
                        continue
                    row = {"d": D, "shape": shape_name, "block_q": bq,
                           "chunk_j": cj, "ms": round(ms, 3)}
                    print(json.dumps(row), flush=True)
                    if best is None or ms < best["ms"]:
                        best = row
            print(json.dumps({"BEST": best}), flush=True)


if __name__ == "__main__":
    main()
