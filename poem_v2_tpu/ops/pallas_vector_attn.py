"""Fused Pallas kernel for Point-Transformer vector attention.

The decoder's vector attention (models/bricks/point_transformer.py)
computes, per query m with K gathered neighbours:

    t1   = relu(delta @ W1 + b1)          # fc_delta layer 1
    pos  = t1 @ W2 + b2                   # fc_delta layer 2
    x    = q[m] - k[m] + pos
    g    = relu(x @ G0 + c0) @ G1 + c1    # fc_gamma
    attn = softmax_K(g / sqrt(D))         # per-channel softmax over K
    out  = sum_K attn * (v + pos)

Under XLA each of t1/pos/x/g/attn is an (M, K, D) HBM tensor
(~105 MB at B=8, M=799, K=32, D=256, bf16) — the op is bandwidth-bound.
This kernel keeps all per-pair intermediates in VMEM: HBM traffic drops
to the gathered k/v/delta inputs plus the (M, D) output, and the three
per-pair (D, D) matmuls run back-to-back on the MXU.

Forward-only (eval / serving): training uses the XLA path, whose
autodiff matches the reference's checkpointed backward.

Measured on v5e (B=8, M=799, K=32, D=256), chained-timing with host
fetches: f32-operand variant 3.93 ms and bf16-operand/f32-accumulate
variant 3.14 ms vs 2.43 ms for the XLA path — XLA's automatic fusion of
this chain wins at these sizes. Kept as optional infrastructure
(``use_fused`` knobs) and as the scaffold for a future double-buffered
variant; default OFF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, delta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g0_ref, c0_ref, g1_ref, c1_ref, out_ref):
    tq, kk, d = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]
    cdt = q_ref.dtype  # compute dtype of the model (bf16 on TPU)

    # MXU-native: bf16 operands, f32 accumulation; softmax math in f32.
    delta = delta_ref[0].reshape(tq * kk, delta_ref.shape[-1]).astype(cdt)
    t1 = jnp.maximum(
        jnp.dot(delta, w1_ref[:].astype(cdt), preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32),
        0.0,
    )
    pos = (
        jnp.dot(t1.astype(cdt), w2_ref[:].astype(cdt), preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32)
    )  # (tq*kk, d) f32

    q = q_ref[0].astype(jnp.float32)  # (tq, d)
    k = k_ref[0].reshape(tq * kk, d).astype(jnp.float32)
    x = jnp.repeat(q, kk, axis=0) - k + pos

    h = jnp.maximum(
        jnp.dot(x.astype(cdt), g0_ref[:].astype(cdt), preferred_element_type=jnp.float32)
        + c0_ref[:].astype(jnp.float32),
        0.0,
    )
    g = (
        jnp.dot(h.astype(cdt), g1_ref[:].astype(cdt), preferred_element_type=jnp.float32)
        + c1_ref[:].astype(jnp.float32)
    )

    g = g.reshape(tq, kk, d) / jnp.sqrt(jnp.float32(d))
    g = g - jnp.max(g, axis=1, keepdims=True)
    e = jnp.exp(g)
    attn = e / jnp.sum(e, axis=1, keepdims=True)

    v = v_ref[0].astype(jnp.float32) + pos.reshape(tq, kk, d)
    out_ref[0] = jnp.sum(attn * v, axis=1).astype(out_ref.dtype)


def fused_vector_attention(
    q: jnp.ndarray,  # (B, M, D) — already w_qs-projected
    k_g: jnp.ndarray,  # (B, M, K, D) — gathered, w_ks-projected
    v_g: jnp.ndarray,  # (B, M, K, D)
    delta: jnp.ndarray,  # (B, M, K, 3) relative positions
    fc_delta_params: Tuple,  # (W1 (3, D), b1, W2 (D, D), b2)
    fc_gamma_params: Tuple,  # (G0 (D, D), c0, G1 (D, D), c1)
    block_q: int = 64,  # VMEM budget: ~6 f32 (block_q*K, D) live buffers < 16MB
    interpret: bool = False,
) -> jnp.ndarray:
    B, M, K, D = k_g.shape
    w1, b1, w2, b2 = fc_delta_params
    g0, c0, g1, c1 = fc_gamma_params

    m_pad = (-M) % block_q
    if m_pad:
        q = jnp.pad(q, ((0, 0), (0, m_pad), (0, 0)))
        k_g = jnp.pad(k_g, ((0, 0), (0, m_pad), (0, 0), (0, 0)))
        v_g = jnp.pad(v_g, ((0, 0), (0, m_pad), (0, 0), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, m_pad), (0, 0), (0, 0)))
    mp = q.shape[1]

    grid = (B, mp // block_q)
    dim3 = delta.shape[-1]

    def im_q(b, i):
        return (b, i, 0)

    def im_kv(b, i):
        return (b, i, 0, 0)

    def im_w(b, i):
        return (0, 0)

    def im_b(b, i):
        return (0,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), im_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, K, D), im_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, K, D), im_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, K, dim3), im_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim3, D), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), im_b, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), im_q, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mp, D), q.dtype),
        interpret=interpret,
    )(q, k_g, v_g, delta, w1, b1, w2, b2, g0, c0, g1, c1)
    return out[:, :M]


def vector_attention_reference(q, k_g, v_g, delta, fc_delta_params, fc_gamma_params):
    """Pure-XLA reference (identical math; used for tests & training)."""
    w1, b1, w2, b2 = fc_delta_params
    g0, c0, g1, c1 = fc_gamma_params
    t1 = jax.nn.relu(delta @ w1 + b1)
    pos = t1 @ w2 + b2
    x = q[:, :, None] - k_g + pos
    g = jax.nn.relu(x @ g0 + c0) @ g1 + c1
    attn = jax.nn.softmax(g / jnp.sqrt(jnp.float32(k_g.shape[-1])).astype(g.dtype), axis=-2)
    return jnp.einsum("bmkd,bmkd->bmd", attn, v_g + pos)
