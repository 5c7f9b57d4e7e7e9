"""Microbenchmark the KNN-kernel round-3 levers on the TPU.

Times the fused exact-KNN vector-attention kernel at the flagship cross
(M=799 queries vs N=4096 BPS) and self (799 vs 799) shapes for:
  - f32 arg-min rounds (round-2 default)
  - bf16 arg-min rounds (halves the dominant VMEM round traffic)
  - K=16 (halves rounds AND gather FLOPs; reference uses K=32)
and reports neighbour-selection agreement of bf16 rounds vs f32 on the
same inputs (fraction of rows with identical output to 1e-3).

Usage: python scripts/bench_knn_levers.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention
    from poem_v2_tpu.utils.benchmarking import time_fn

    B, M, D = 16, 799, 256
    rs = np.random.RandomState(0)

    def params():
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)
        fc_delta = (mk(3, D), mk(D), mk(D, D), mk(D))
        fc_gamma = (mk(D, D), mk(D), mk(D, D), mk(D))
        return mk(D, D), mk(D, D), fc_delta, fc_gamma

    wk, wv, fc_delta, fc_gamma = params()

    for name, N, bq, cj in (("cross", 4096, 64, 16), ("self", 799, 128, 32)):
        q = jnp.asarray(rs.randn(B, M, D).astype(np.float32), jnp.bfloat16)
        qxyz = jnp.asarray(rs.randn(B, M, 3).astype(np.float32) * 0.4)
        pxyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 0.4)
        x = jnp.asarray(rs.randn(B, N, D).astype(np.float32), jnp.bfloat16)

        outs = {}
        for label, K, bf16, keys in (
            ("f32 K32", 32, False, False),
            ("bf16 K32", 32, True, False),
            ("keys K32", 32, False, True),
            ("f32 K16", 16, False, False),
            ("keys K16", 16, False, True),
        ):
            cjk = min(cj, K)
            fn = lambda q, qxyz, pxyz, x: fused_knn_vector_attention(
                q, qxyz, pxyz, x, wk, wv, fc_delta, fc_gamma,
                n_neighbor=K, block_q=bq, chunk_j=cjk, bf16_dist=bf16,
                packed_keys=keys)
            t = time_fn(jax.jit(fn), q, qxyz, pxyz, x, iters=30)
            outs[label] = np.asarray(fn(q, qxyz, pxyz, x), np.float32)
            print(f"{name} {label}: {t * 1e3:.3f} ms")

        base = outs["f32 K32"]
        scale = np.abs(base).max()
        for label in ("bf16 K32", "keys K32", "f32 K16", "keys K16"):
            d = np.abs(outs[label] - base)
            print(f"  {name} {label} vs f32 K32: max {d.max():.3e} mean {d.mean():.3e} "
                  f"(out scale {scale:.2f})")


if __name__ == "__main__":
    main()
