"""Microbenchmark layout-changing conv rewrites on the TPU.

Round-3 perf exploration (VERDICT #1a): the HRNet branch convs are
lane-limited (C_out=40 -> <=31% MXU). Candidate levers, each timed
against the plain lax.conv at the same shape with device-true timing:

  a) int8 x int8 -> int32 conv (MXU int8 path is 2x bf16 peak on v5e)
  b) output-phase-packed conv: pack 2 adjacent output columns into
     channels (kernel (3,4), stride (1,2), C_out=2C) — fills 80 lanes
     instead of 40 at 12/9 the FLOPs; exact up to fp association
  c) 4-phase packing (2x2 -> C_out=4C=160 lanes, 16/9 FLOPs)

Usage:  python scripts/bench_conv_levers.py [--images 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128, help="B*V images")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--chan", type=int, default=40)
    args = ap.parse_args()

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from poem_v2_tpu.utils.benchmarking import time_fn

    BN, S, C = args.images, args.size, args.chan
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(BN, S, S, C).astype(np.float32), dtype=jnp.bfloat16)
    k = jnp.asarray(rs.randn(3, 3, C, C).astype(np.float32) * 0.05, dtype=jnp.bfloat16)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_plain(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)

    t = time_fn(conv_plain, x, k, iters=50)
    ref = np.asarray(conv_plain(x, k), dtype=np.float32)
    print(f"plain bf16 3x3 {C}->{C} @{S}^2 x{BN}: {t * 1e3:.3f} ms")
    base = t

    # ---- int8 path -------------------------------------------------------
    xi = jnp.asarray(rs.randint(-127, 127, (BN, S, S, C)), dtype=jnp.int8)
    ki = jnp.asarray(rs.randint(-127, 127, (3, 3, C, C)), dtype=jnp.int8)

    @jax.jit
    def conv_int8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    try:
        t8 = time_fn(conv_int8, xi, ki, iters=50)
        print(f"int8  3x3 {C}->{C}: {t8 * 1e3:.3f} ms  ({base / t8:.2f}x vs bf16)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 conv failed to lower: {type(e).__name__}: {e}")

    # wider int8 (the 160-ch branch) to see whether int8 wins at full lanes
    C4 = 160
    xi4 = jnp.asarray(rs.randint(-127, 127, (BN, S // 4, S // 4, C4)), dtype=jnp.int8)
    ki4 = jnp.asarray(rs.randint(-127, 127, (3, 3, C4, C4)), dtype=jnp.int8)
    xb4 = xi4.astype(jnp.bfloat16)
    kb4 = ki4.astype(jnp.bfloat16)
    dn4 = jax.lax.conv_dimension_numbers(xi4.shape, ki4.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_int8_w(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn4,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_bf16_w(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn4)

    tw = time_fn(conv_bf16_w, xb4, kb4, iters=50)
    try:
        tw8 = time_fn(conv_int8_w, xi4, ki4, iters=50)
        print(f"160ch @16^2: bf16 {tw * 1e3:.3f} ms, int8 {tw8 * 1e3:.3f} ms ({tw / tw8:.2f}x)")
    except Exception as e:  # noqa: BLE001
        print(f"wide int8 conv failed: {type(e).__name__}: {e}")

    # ---- output-phase packing (x2 in W) ---------------------------------
    # y[:, :, 2w + p, co] = y_packed[:, :, w, p*C + co]; kernel (3, 4):
    # tap (u, v) of phase p reads x col 2w + p + (v - 1) -> packed kernel
    # index kv = p + v - 1 in [0, 3] ... i.e. k4[u, p + v - 1, :, p*C + co]
    k4 = np.zeros((3, 4, C, 2 * C), dtype=np.float32)
    kn = np.asarray(k, dtype=np.float32)
    for p in range(2):
        for v in range(3):
            k4[:, p + v, :, p * C:(p + 1) * C] = kn[:, v]
    k4 = jnp.asarray(k4, dtype=jnp.bfloat16)
    dnp_ = jax.lax.conv_dimension_numbers(x.shape, (3, 4, C, 2 * C), ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_packed2(x, k4):
        # SAME over H; explicit W padding so output col w covers input
        # cols 2w-1 .. 2w+2
        y = jax.lax.conv_general_dilated(
            x, k4, (1, 2), [(1, 1), (1, 2)], dimension_numbers=dnp_)
        B, H, Wh, _ = y.shape
        return y.reshape(B, H, Wh, 2, C).reshape(B, H, 2 * Wh, C)

    tp = time_fn(conv_packed2, x, k4, iters=50)
    out2 = np.asarray(conv_packed2(x, k4), dtype=np.float32)
    err = np.abs(out2 - ref).max()
    print(f"packed x2 (80 lanes): {tp * 1e3:.3f} ms ({base / tp:.2f}x) maxdiff {err:.2e}")

    # ---- output-phase packing (2x2 -> 160 lanes) ------------------------
    k44 = np.zeros((4, 4, C, 4 * C), dtype=np.float32)
    for py in range(2):
        for px in range(2):
            for u in range(3):
                for v in range(3):
                    k44[py + u, px + v, :, (py * 2 + px) * C:(py * 2 + px + 1) * C] = kn[u, v]
    k44 = jnp.asarray(k44, dtype=jnp.bfloat16)
    dnp4 = jax.lax.conv_dimension_numbers(x.shape, (4, 4, C, 4 * C), ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_packed4(x, k44):
        y = jax.lax.conv_general_dilated(
            x, k44, (2, 2), [(1, 2), (1, 2)], dimension_numbers=dnp4)
        B, Hh, Wh, _ = y.shape
        y = y.reshape(B, Hh, Wh, 2, 2, C)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(B, 2 * Hh, 2 * Wh, C)

    tp4 = time_fn(conv_packed4, x, k44, iters=50)
    out4 = np.asarray(conv_packed4(x, k44), dtype=np.float32)
    err4 = np.abs(out4 - ref).max()
    print(f"packed 2x2 (160 lanes): {tp4 * 1e3:.3f} ms ({base / tp4:.2f}x) maxdiff {err4:.2e}")


if __name__ == "__main__":
    main()
