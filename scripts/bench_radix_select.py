"""Microbenchmark: radix-select vs serial threshold scans for exact K-th key.

The fused KNN kernels' dominant VMEM traffic is K=32 serial threshold
scans over the packed (BQ, N) int32 key matrix (~32 full passes).  A
4-bit MSD radix select finds the exact K-th smallest key in 8 passes —
IF Mosaic can compute the 15 per-nibble cumulative counts of one pass
without re-streaming the tile 15x.  This measures that question in
isolation at the flagship cross shape (B=16, M=799->832, N=4096, K=32).

Kernels (identical grid/block layout to the fused KNN kernel):
  scan32   — 32 read-only threshold rounds (the current selection form)
  radix8   — 8x 4-bit MSD radix passes -> exact K-th smallest key
  pass1    — a single sum over the keys (calibrates one-pass cost)

Usage: python scripts/bench_radix_select.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from poem_v2_tpu.utils.benchmarking import time_fn

    B, M, N, K, BQ = 16, 799, 4096, 32, 64
    MP = ((M + BQ - 1) // BQ) * BQ

    def scan32_kernel(keys_ref, out_ref):
        keys = keys_ref[0]
        int_max = jnp.int32(0x7FFFFFFF)

        def body(j, thr):
            return jnp.min(jnp.where(keys > thr, keys, int_max), axis=1,
                           keepdims=True)

        thr = jax.lax.fori_loop(
            0, K, body, jnp.full((keys.shape[0], 1), jnp.int32(-(1 << 31))))
        out_ref[0] = thr

    def radix8_kernel(keys_ref, out_ref):
        keys = keys_ref[0]
        bq = keys.shape[0]

        def rpass(p, carry):
            prefix, kk = carry           # (bq, 1) int32 prefix, (bq, 1) k left
            shift = 28 - 4 * p
            # pass 0 is all-active by definition; the shift is clamped to 31
            # because shift+4 == 32 on pass 0 is UB for a 32-bit logical
            # shift (advisor r3).  Nibble order is UNSIGNED radix order,
            # correct only for non-negative keys (asserted host-side).
            hi = jax.lax.shift_right_logical(keys, jnp.minimum(shift + 4, 31))
            active = (p == 0) | (hi == prefix)   # (bq, N)
            nib = jax.lax.shift_right_logical(keys, shift) & 0xF
            # cumulative counts c_t = #{active & nib < t}, t = 1..15
            cnt = [
                jnp.sum(jnp.where(active & (nib < t), 1, 0), axis=1,
                        keepdims=True)
                for t in range(1, 16)
            ]
            # chosen nibble = #{t in 1..15 : c_t < kk}
            nibble = sum((c < kk).astype(jnp.int32) for c in cnt)
            # c_sel = c_{nibble}: count of active keys below the chosen
            # nibble (0 when nibble == 0)
            c_sel = jnp.zeros_like(kk)
            for t, c in enumerate(cnt):
                c_sel = jnp.where(nibble == (t + 1), c, c_sel)
            kk = kk - c_sel
            prefix = jax.lax.shift_left(prefix, 4) | nibble
            return prefix, kk

        prefix, _ = jax.lax.fori_loop(
            0, 8, rpass,
            (jnp.zeros((bq, 1), jnp.int32), jnp.full((bq, 1), jnp.int32(K))))
        out_ref[0] = prefix

    def pass1_kernel(keys_ref, out_ref):
        out_ref[0] = jnp.sum(keys_ref[0], axis=1, keepdims=True)

    CJ = 16

    def cur_kernel(keys_ref, out_ref, oh_ref):
        """Current fused-kernel selection+extraction: per round a threshold
        scan AND a one-hot compare+write into the (CJ*BQ, N) scratch."""
        keys = keys_ref[0]
        bq = keys.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, N), 1)
        int_max = jnp.int32(0x7FFFFFFF)

        def body(c, carry):
            thr, acc = carry
            for jj in range(CJ):
                thr = jnp.min(jnp.where(keys > thr, keys, int_max), axis=1,
                              keepdims=True)
                idx_j = thr & 0xFFF
                oh_ref[pl.ds(jj * bq, bq)] = (col == idx_j).astype(oh_ref.dtype)
            acc = acc + jnp.sum(oh_ref[...].astype(jnp.float32))
            return thr, acc

        thr, acc = jax.lax.fori_loop(
            0, K // CJ, body,
            (jnp.full((bq, 1), jnp.int32(-(1 << 31))), jnp.float32(0.0)))
        out_ref[0] = thr + acc.astype(jnp.int32)[None, None]

    def bcast_kernel(keys_ref, out_ref, oh_ref):
        """Scan rounds for per-chunk thresholds only; extraction via
        mask -> cumsum slot -> ONE broadcast compare per chunk."""
        keys = keys_ref[0]
        bq = keys.shape[0]
        int_max = jnp.int32(0x7FFFFFFF)
        jj_iota = jax.lax.broadcasted_iota(jnp.int32, (CJ, bq, N), 0)

        def body(c, carry):
            thr, acc = carry
            lo = thr
            for jj in range(CJ):
                thr = jnp.min(jnp.where(keys > thr, keys, int_max), axis=1,
                              keepdims=True)
            mask = (keys > lo) & (keys <= thr)          # exactly CJ per row
            slot = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
            oh = jnp.where(mask[None] & (slot[None] == jj_iota),
                           jnp.bfloat16(1), jnp.bfloat16(0))
            oh_ref[...] = oh.reshape(CJ * bq, N)
            acc = acc + jnp.sum(oh_ref[...].astype(jnp.float32))
            return thr, acc

        thr, acc = jax.lax.fori_loop(
            0, K // CJ, body,
            (jnp.full((bq, 1), jnp.int32(-(1 << 31))), jnp.float32(0.0)))
        out_ref[0] = thr + acc.astype(jnp.int32)[None, None]

    def run(kernel, keys, scratch=False):
        kwargs = {}
        if scratch:
            kwargs["scratch_shapes"] = [
                pltpu.VMEM((CJ * BQ, N), jnp.bfloat16)]
        return pl.pallas_call(
            kernel,
            grid=(B, MP // BQ),
            in_specs=[pl.BlockSpec((1, BQ, N), lambda b, i: (b, i, 0))],
            out_specs=pl.BlockSpec((1, BQ, 1), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, MP, 1), jnp.int32),
            **kwargs,
        )(keys)

    rs = np.random.RandomState(0)
    d2 = (rs.rand(B, MP, N).astype(np.float32) * 4.0)
    col = np.arange(N, dtype=np.int32)[None, None]
    keys_np = (d2.view(np.int32) & ~0xFFF) | (col & 0xFFF)
    # kernel preconditions (they mirror the fused KNN kernel's key format):
    #  - non-negative keys: radix8's logical-shift nibble order is unsigned
    #    radix order, which matches signed comparisons only for keys >= 0
    #    (positive-float bit patterns are non-negative int32)
    #  - per-row-unique keys: the scan kernels' strict '>' threshold rounds
    #    and bcast's exactly-CJ-per-chunk cumsum-slot extraction both skip
    #    ties; uniqueness is guaranteed by the packed low-12-bit column id
    assert (keys_np >= 0).all(), "radix order requires non-negative keys"
    assert all(
        len(np.unique(keys_np[b, m])) == N
        for b in range(0, B, 7) for m in range(0, MP, 311)
    ), "threshold scans require per-row-unique keys"
    keys = jnp.asarray(keys_np)

    # correctness: radix8 == scan32 == numpy partition
    ref = np.partition(keys_np, K - 1, axis=2)[..., K - 1:K]
    for name, kern in (("scan32", scan32_kernel), ("radix8", radix8_kernel)):
        got = np.asarray(run(kern, keys))
        ok = np.array_equal(got, ref)
        print(f"{name} exact: {ok}")
        if not ok:
            bad = np.argwhere(got != ref)[:4]
            print("  first mismatches:", bad, got[tuple(bad[0])], ref[tuple(bad[0])])

    cur = np.asarray(run(cur_kernel, keys, scratch=True))
    # bcast (cumsum-slot extraction) does NOT lower: Mosaic TC has no
    # cumsum primitive (measured r4) — kept for the day it gains one
    have_bcast = False
    try:
        bc = np.asarray(run(bcast_kernel, keys, scratch=True))
        have_bcast = np.array_equal(cur, bc)
        print(f"cur == bcast (thr + onehot checksum): {have_bcast}")
    except Exception as e:  # noqa: BLE001
        print(f"bcast kernel unavailable: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")

    variants = [
        ("pass1", pass1_kernel, False), ("scan32", scan32_kernel, False),
        ("radix8", radix8_kernel, False), ("cur", cur_kernel, True),
    ]
    if have_bcast:
        variants.append(("bcast", bcast_kernel, True))
    for name, kern, scr in variants:
        fn = jax.jit(functools.partial(run, kern, scratch=scr))
        t = time_fn(fn, keys, iters=50)
        print(f"{name}: {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
