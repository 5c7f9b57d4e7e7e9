"""Operation-order-driven transformer layer kit.

The reference drives its PETR/MVP decoders through mmcv's
``BaseTransformerLayer`` / ``TransformerLayerSequence``, where a config
string tuple like ``("self_attn", "norm", "cross_attn", "norm", "ffn",
"norm")`` determines both the op sequence and pre-/post-norm placement
(reference lib/models/bricks/transformer.py:24-210, configured from
lib/models/heads/petr_head.py). This module exposes the same
configuration surface as flax bricks:

- :class:`MultiheadAttention` — a generic registered attention op with
  query/key positional-embedding addition and masked keys.
- :class:`BaseTransformerLayer` — executes an arbitrary
  ``operation_order`` over {self_attn, cross_attn, norm, ffn}; residual
  connections follow mmcv semantics (attn/ffn add to the tensor that
  entered them; a leading "norm" makes the layer pre-norm).
- :class:`TransformerLayerSequence` — stacks N identical layers and
  optionally returns intermediate outputs.

TPU notes: everything is static-shape einsum attention (XLA fuses the
softmax chain onto the MXU); masks are boolean key masks broadcast into
the logits — no ragged sequences.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import ATTENTION, TRANSFORMER


class FFN(nn.Module):
    """mmcv-semantics FFN: Linear -> ReLU -> Dropout -> Linear -> Dropout
    plus the identity connection and NO internal norm — normalisation is
    the operation order's job (reference lib/models/bricks/transformer.py:
    175-235: ``self.activate = nn.ReLU``, ``layers`` end in Dropout, the
    residual is added in ``forward``)."""

    embed_dims: int = 256
    feedforward_channels: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


@ATTENTION.register_module("MultiheadAttention")
class MultiheadAttention(nn.Module):
    """Post-projection multi-head attention with additive positional
    embeddings (DETR convention: pos added to q/k only, not v)."""

    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: jnp.ndarray,  # (B, N, C)
        value: jnp.ndarray,  # (B, N, C)
        query_pos: Optional[jnp.ndarray] = None,
        key_pos: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,  # (B, N) True = keep
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h, nh = self.embed_dims, self.num_heads
        hd = h // nh
        B, Q, _ = query.shape
        N = key.shape[1]
        q_in = query if query_pos is None else query + query_pos
        k_in = key if key_pos is None else key + key_pos
        q = nn.Dense(h, dtype=self.dtype, name="q_proj")(q_in).reshape(B, Q, nh, hd)
        k = nn.Dense(h, dtype=self.dtype, name="k_proj")(k_in).reshape(B, N, nh, hd)
        v = nn.Dense(h, dtype=self.dtype, name="v_proj")(value).reshape(B, N, nh, hd)
        logits = jnp.einsum("bqhd,bnhd->bhqn", q, k) / jnp.sqrt(hd).astype(self.dtype)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
        probs = nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqn,bnhd->bqhd", probs, v).reshape(B, Q, h)
        out = nn.Dense(h, dtype=self.dtype, name="out_proj")(ctx)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


@TRANSFORMER.register_module("BaseTransformerLayer")
class BaseTransformerLayer(nn.Module):
    """One decoder layer driven by ``operation_order``.

    Supported ops: ``self_attn`` (q=k=v=x, pos=query_pos),
    ``cross_attn`` (k=v=memory, pos=key_pos, masked), ``norm``
    (LayerNorm), ``ffn``. Attn and ffn keep a residual from their input;
    norms are applied in sequence position, so both
    post-norm ``(attn, norm, ...)`` and pre-norm ``(norm, attn, ...)``
    orders express naturally.
    """

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    operation_order: Tuple[str, ...] = (
        "self_attn", "norm", "cross_attn", "norm", "ffn", "norm",
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        memory: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        memory_pos: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = query
        attn_i = norm_i = ffn_i = 0
        for op in self.operation_order:
            if op == "self_attn":
                x = x + MultiheadAttention(
                    self.embed_dims, self.num_heads, self.dropout,
                    dtype=self.dtype, name=f"attn_{attn_i}",
                )(x, x, x, query_pos, query_pos, None, deterministic)
                attn_i += 1
            elif op == "cross_attn":
                if memory is None:
                    raise ValueError("operation_order has cross_attn but no memory given")
                x = x + MultiheadAttention(
                    self.embed_dims, self.num_heads, self.dropout,
                    dtype=self.dtype, name=f"attn_{attn_i}",
                )(x, memory, memory, query_pos, memory_pos, memory_mask, deterministic)
                attn_i += 1
            elif op == "norm":
                x = nn.LayerNorm(dtype=self.dtype, name=f"norm_{norm_i}")(x)
                norm_i += 1
            elif op == "ffn":
                x = FFN(
                    self.embed_dims, self.feedforward_channels, self.dropout,
                    dtype=self.dtype, name=f"ffn_{ffn_i}",
                )(x, deterministic=deterministic)
                ffn_i += 1
            else:
                raise ValueError(f"Unknown operation {op!r}")
        return x


@TRANSFORMER.register_module("TransformerLayerSequence")
class TransformerLayerSequence(nn.Module):
    """Stack of identical :class:`BaseTransformerLayer` layers."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    operation_order: Tuple[str, ...] = (
        "self_attn", "norm", "cross_attn", "norm", "ffn", "norm",
    )
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        memory: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        memory_pos: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        outs = []
        x = query
        for i in range(self.num_layers):
            x = BaseTransformerLayer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout,
                operation_order=self.operation_order,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, memory, query_pos, memory_pos, memory_mask, deterministic)
            outs.append(x)
        if self.return_intermediate:
            return jnp.stack(outs)  # (L, B, Q, C)
        return x
