"""MXU scatter-add: the backward of a KNN row-gather as one-hot matmuls.

XLA lowers the autodiff backward of ``take_along_axis`` (our
``ops.points.index_points``) to a serial HBM scatter-add — measured
~3.9 ms per bf16[26624, 256]→[4096, 256] instance on v5e, ~28 ms of the
flagship train step (docs/performance.md train decomposition). On TPU a
scatter into N rows is better spelled as ``onehot(idx)ᵀ @ grads``: the
one-hot never touches HBM (built in VMEM from an iota compare, chunk by
chunk) and the accumulation rides the MXU with f32 accumulators.

Replaces the reference's CUDA gather/scatter pair behind pytorch3d's
``knn_gather`` (reference lib/models/bricks/point_transformers.py:83
via knn_points/index_points, lib/utils/points_utils.py:9-24) on the
training path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 100 * 1024 * 1024


def _scatter_kernel(idx_ref, g_ref, out_ref, *, n_pad: int):
    """One (b, row-chunk) program: out[b] += onehot(idx_chunk)ᵀ @ g_chunk.

    The out block is indexed by b only, so it stays resident in VMEM
    while the row-chunk grid dimension (innermost) accumulates into it.
    The caller flattens (M, K) → rows in XLA — Mosaic cannot shape-cast
    a (CM, K) tile into (CM*K, 1) inside the kernel (measured: the
    in-kernel reshape fails infer-vector-layout on v5e).
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0]                             # (rows, 1) int32
    g = g_ref[0]                                 # (rows, D)
    col = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n_pad), 1)
    oh = (col == idx).astype(g.dtype)            # exact 0/1 in any float dtype
    # ohᵀ @ g: contract the row axis; f32 accumulation on the MXU
    out_ref[0] += jax.lax.dot_general(
        oh, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "chunk_m", "interpret")
)
def scatter_add_rows(
    grads: jnp.ndarray,  # (B, M, K, D)
    idx: jnp.ndarray,    # (B, M, K) int32 in [0, n_rows)
    n_rows: int,
    chunk_m: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, idx[b, m, k], :] += grads[b, m, k, :] → (B, n_rows, D) f32.

    The gather-backward for ``index_points``: equivalent to XLA's
    scatter-add but spelled as per-chunk one-hot matmuls (MXU) with the
    one-hot built in VMEM. f32 accumulation regardless of grads dtype.

    Precision: the one-hot entries are exact in any float dtype, so with
    bf16 grads (the training path) the MXU products are exact and the
    f32 accumulation makes the scatter bit-faithful. With f32 grads on
    TPU the MXU's default f32 matmul decomposition rounds products to
    ~1e-3 relative — matching XLA's own matmul precision, not the serial
    scatter's exactness.

    VMEM capacity: the full (n_pad, D) f32 output block stays resident
    (n_pad = n_rows rounded to 128) and each chunk adds a
    (chunk_m*K, n_pad) one-hot + (chunk_m*K, D) grads tile — all linear
    in n_rows. ``chunk_m`` is auto-halved (down to 1) until the estimate
    fits ``_VMEM_BUDGET``; beyond that (n_rows*D f32 alone over budget,
    e.g. n_rows*D > ~23M) the kernel raises instead of letting Mosaic
    fail allocation — split the scatter target or fall back to XLA's
    scatter-add at that size.
    """
    # Mosaic only lowers on TPU; on CPU (tests/debug) fall back to
    # interpret. Check the pinned default device first — the axon plugin
    # reports backend "tpu" even when computation is pinned to CPU
    # (same discipline as models/poem.py:_default_use_flash).
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform == "cpu":
        interpret = True
    B, M, K, D = grads.shape
    n_pad_est = max(-n_rows % 128 + n_rows, 128)
    bpe = jnp.dtype(grads.dtype).itemsize
    out_bytes = n_pad_est * D * 4
    while chunk_m > 1 and out_bytes + chunk_m * K * (n_pad_est + D) * bpe > _VMEM_BUDGET:
        chunk_m //= 2
    if out_bytes + chunk_m * K * (n_pad_est + D) * bpe > _VMEM_BUDGET:
        raise ValueError(
            f"scatter_add_rows target too large for VMEM: n_rows={n_rows}, "
            f"D={D} needs ~{out_bytes // 2**20} MB resident output vs the "
            f"{_VMEM_BUDGET // 2**20} MB budget; split the target rows or "
            "use XLA scatter-add")
    mp = -M % chunk_m
    if mp:
        grads = jnp.pad(grads, ((0, 0), (0, mp), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, mp), (0, 0)))  # pad rows carry 0-grads
    n_pad = max(-n_rows % 128 + n_rows, 128)
    grid = (B, (M + mp) // chunk_m)
    # Flatten (M, K) → rows HERE (XLA relayout) — in-kernel shape casts
    # across tiled dims don't lower on Mosaic (see _scatter_kernel).
    chunk_rows = chunk_m * K
    grads = grads.reshape(B, (M + mp) * K, D)
    idx = idx.reshape(B, (M + mp) * K, 1)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_pad=n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk_rows, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_rows, D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, D), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, D), jnp.float32),
        # CompilerParams is harmless under interpret on the pinned JAX
        # (verified) — passed unconditionally like the sibling kernels
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(idx, grads)
    return out[:, :n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def index_points_mxu(points: jnp.ndarray, idx: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """``index_points`` with an MXU one-hot-matmul backward.

    Forward is the plain XLA row-gather (fast); backward replaces XLA's
    serial scatter-add with :func:`scatter_add_rows`. points (B, N, D),
    idx (B, M, K) → (B, M, K, D).
    """
    return jnp.take_along_axis(points, idx.reshape(idx.shape[0], -1)[..., None],
                               axis=-2).reshape(idx.shape + (points.shape[-1],))


def _ipm_fwd(points, idx, interpret):
    # zero-size token: carries N and the points dtype through the
    # residuals as static SHAPE/dtype (ints/dtypes are not JAX types)
    token = jnp.zeros((points.shape[-2], 0), points.dtype)
    return index_points_mxu(points, idx, interpret), (idx, token)


def _ipm_bwd(interpret, res, ct):
    idx, token = res
    d_points = scatter_add_rows(
        ct, idx, token.shape[0], interpret=interpret
    ).astype(token.dtype)
    return d_points, np.zeros(idx.shape, dtype=jax.dtypes.float0)


index_points_mxu.defvjp(_ipm_fwd, _ipm_bwd)
