"""Reference-exact merge-input scramble as a Pallas TPU kernel.

The head must reproduce the reference's ``.view(1, -1, V, C)`` on the
(V, C, NS)-contiguous sampled tensor (PARITY.md deviation #9): output
"row" (i, j) of sample b is the C-element run starting at
``(i * n_b + j) * C`` of the flat per-sample layout, where ``n_b`` is the
sample's valid view count. As an XLA row gather (512 B rows) this costs
~12 ms/iter at flagship sizes (B16, V8, NS 4096, C 256) — DMA-issue-rate
bound, like every small-row gather on v5e.

This kernel exploits the structure the gather API cannot see: G
consecutive output samples i cover ONE contiguous source span of
``G*n*C`` elements. Each program DMAs that span (plus the V-row tail)
into VMEM with a single dynamic-offset copy and rearranges it with a
one-hot matmul (the MXU *is* the VMEM gather) — streaming-bandwidth
total traffic instead of 512 B row DMAs.

Forward-only (eval path): training keeps the differentiable
``take_along_axis`` form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    n_ref,        # SMEM (B,) int32 valid view counts
    rows_ref,     # ANY  (B, V*NS, C) source rows (flat (V, C, NS) layout)
    out_ref,      # VMEM (1, G*V, C) output block
    span_ref,     # VMEM scratch (SPAN_ROWS, C)
    sem,          # DMA semaphore
    *,
    V: int,
    C: int,
    G: int,
    NS: int,
    span_rows: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n = n_ref[b]
    R = V * NS
    SPAN_ROWS = span_rows

    i0 = t * G
    # DMA row offsets must sit on the (8, 128) tiling: align down, keep
    # the residue in `delta`, and clamp the span into bounds. SPAN_ROWS is
    # chosen by the wrapper so the clamp value R - SPAN_ROWS is itself
    # 8-aligned and the clamped span reaches exactly to R (covers the
    # worst case (NS-1)*n + V <= R rows for every n <= V).
    start = jnp.minimum((i0 * n) // 8 * 8, R - SPAN_ROWS)
    start = pl.multiple_of(start, 8)
    copy = pltpu.make_async_copy(
        rows_ref.at[b, pl.ds(start, SPAN_ROWS), :], span_ref, sem
    )
    copy.start()
    copy.wait()

    src = span_ref[...]                            # (SPAN_ROWS, C)

    # one-hot: output row gj=(g, j) <- span row g*n + j + delta, where
    # delta corrects for the clamped start
    delta = i0 * n - start
    gj = jax.lax.broadcasted_iota(jnp.int32, (G * V, SPAN_ROWS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (G * V, SPAN_ROWS), 1)
    target = (gj // V) * n + (gj % V) + delta
    oh = (col == target).astype(src.dtype)
    # one-hot x bf16 src is exact at default MXU precision (every product
    # is src*1.0 on exactly-representable operands); f32 src would be
    # truncated to one bf16 pass (measured 1.6e-2 abs on the chip) — use
    # the 3-pass split there so the gather stays bit-exact
    prec = (jax.lax.Precision.HIGHEST if src.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[0] = jax.lax.dot_general(
        oh, src, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(out_ref.dtype)


def supports(V: int, NS: int, C: int, G: int = 64) -> bool:
    """True when the kernel's static span/tiling constraints hold for
    this geometry (callers fall back to the XLA row gather otherwise)."""
    # last-dim slices must sit on the 128-lane tiling (Mosaic rejects
    # C=64 at compile time: "Slice shape along dimension 2 must be
    # aligned to tiling (128)")
    if NS % G or C % 128:
        return False
    span_rows = G * V + V + 8 + (V * NS - (G * V + V + 8)) % 8
    return span_rows < V * NS


@functools.partial(jax.jit, static_argnames=("V", "C", "G", "interpret"))
def scrambled_merge_gather(
    flat: jnp.ndarray,      # (B, V*NS*C) flat (V, C, NS) layout, per sample
    n_val: jnp.ndarray,     # (B,) int32 valid view counts (1..V)
    V: int,
    C: int,
    G: int = 64,  # swept on v5e: 32/64/128/256 -> 5.96/5.40/5.71/6.96 ms
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, NS, V, C) with rows (i, j) = flat[(i*n+j)*C : +C].

    Rows with j >= n_val[b] alias later data (exactly like the clamped
    XLA form) and must be masked by the consumer's view mask.
    """
    B, L = flat.shape
    NS = L // (V * C)
    assert NS % G == 0, (NS, G)
    R = V * NS
    # smallest span >= G*V + V + 8 with R - span 8-aligned (see kernel)
    span_rows = G * V + V + 8 + (R - (G * V + V + 8)) % 8
    assert span_rows < R, (span_rows, R)
    rows = flat.reshape(B, V * NS, C)
    out = pl.pallas_call(
        functools.partial(_kernel, V=V, C=C, G=G, NS=NS, span_rows=span_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, NS // G),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, G * V, C), lambda b, t, n: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((span_rows, C), flat.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, NS * V, C), flat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(n_val.astype(jnp.int32), rows)
    return out.reshape(B, NS, V, C)
