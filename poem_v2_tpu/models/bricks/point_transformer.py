"""Point Transformer vector-attention bricks (flax).

Re-design of the reference's ``ptTransformerBlock`` /
``ptTransformerBlock_CrossAttn`` (lib/models/bricks/point_transformers.py:47-156):
subtraction vector attention over K nearest neighbours with a relative
position MLP, softmax over the neighbour axis. The pytorch3d CUDA
KNN/FPS calls become one MXU distance matmul + top-k
(:mod:`poem_v2_tpu.ops.points`); fixed-anchor mode (the reference's
"IFPS" init block, point_transformers.py:10-32) takes a static anchor
index set instead of loading assets from disk inside the layer.

The attention core (fc_delta position MLP, fc_gamma scoring MLP, softmax
over K, aggregate) runs either as pure XLA
(:func:`poem_v2_tpu.ops.pallas_vector_attn.vector_attention_reference`,
used for training — autodiff replaces the reference's torch.checkpoint)
or as one fused Pallas kernel
(:func:`...fused_vector_attention`, eval/serving) that keeps every
(M, K, D) intermediate in VMEM.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ...ops.pallas_vector_attn import fused_vector_attention, vector_attention_reference
from ...ops.points import index_points, knn_points


class RawDense(nn.Module):
    """Bias-free dense with the same param tree as ``nn.Dense`` — exposes
    the kernel matrix so the fused KNN-attention kernel can consume it
    (setup-style: multiple methods callable on one instance)."""

    d_in: int
    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.d_in, self.features)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x @ self.kernel.astype(self.dtype)

    def matrix(self) -> jnp.ndarray:
        return self.kernel.astype(self.dtype)


def _fused_block_config(n_points: int, k: int, d_model: int = 256):
    """(block_q, chunk_j) by cloud size, swept on v5e (B16, 799 queries,
    K=32): the one-hot gather matmul wants >=512 rows per chunk to
    amortize MXU pipeline fill — (128, 32) for the 799-point query cloud
    (6.18 vs 6.42 ms at the old (128, 8)) and (64, 16) for the 4096-point
    BPS cloud (14.5 vs 16.1 ms at the old (32, 8)). chunk_j must divide
    the neighbour count, so it is clamped to the largest divisor of k.

    Wide tiers (large/huge, D=512/1024) come from the round-5 sweep
    (scripts/bench_tier_tiles.py, 799 q x {4096 cross, 799 self}, K=32,
    B16 v5e): the round-4 VMEM clamp to block_q=32 at D>=1024 was
    near-optimal for the cross shape ((32,8): 49.3 ms vs the clamp's
    (32,16): 50.9) but left 9-12%% on the self shape, which prefers a
    64-query tile ((64,8): 31.6 vs 34.6 ms at D=1024; (64,32): 11.4 vs
    12.8 ms at D=512). Full matrix in docs/performance.md."""
    if d_model >= 1024:
        bq, cj = (64, 8) if n_points <= 1024 else (32, 8)
    elif d_model >= 512:
        bq, cj = (64, 32) if n_points <= 1024 else (32, 32)
    else:
        bq, cj = (128, 32) if n_points <= 1024 else (64, 16)
    cj = min(cj, k)
    while k % cj:
        cj -= 1
    return bq, cj


def _mlp_params(module: nn.Module, name: str, d_in: int, d_model: int):
    """Two-layer MLP parameters (Dense -> relu -> Dense), declared raw so
    the fused kernel and the XLA path share them."""
    w1 = module.param(f"{name}_w1", nn.initializers.lecun_normal(), (d_in, d_model))
    b1 = module.param(f"{name}_b1", nn.initializers.zeros, (d_model,))
    w2 = module.param(f"{name}_w2", nn.initializers.lecun_normal(), (d_model, d_model))
    b2 = module.param(f"{name}_b2", nn.initializers.zeros, (d_model,))
    return w1, b1, w2, b2


def _gather_shared(x, idx):
    """Row-gather of the shared fc1 activations with the right backward.

    bf16 activations (the TPU training path) take ``index_points_mxu``:
    the backward scatters via per-chunk one-hot matmuls in VMEM instead
    of XLA's serial HBM scatter-add (~3.9 ms per flagship instance), and
    bf16 grads make the MXU products exact. f32 activations keep the
    plain XLA gather/scatter pair: the one-hot matmul would round f32
    grads at the MXU's ~1e-3 matmul precision, which breaks the
    bit-level cross-mesh gates (dp8 == single-device in
    __graft_entry__.dryrun_multichip) for no training-path benefit.
    """
    if x.dtype == jnp.bfloat16:
        from ...ops.pallas_scatter import index_points_mxu

        return index_points_mxu(x, idx)
    return index_points(x, idx)


def _run_vector_attention(q, k_g, v_g, delta, fc_delta, fc_gamma, use_fused, dtype):
    fc_delta = tuple(p.astype(dtype) for p in fc_delta)
    fc_gamma = tuple(p.astype(dtype) for p in fc_gamma)
    if use_fused:
        return fused_vector_attention(q, k_g, v_g, delta.astype(dtype), fc_delta, fc_gamma)
    return vector_attention_reference(q, k_g, v_g, delta.astype(dtype), fc_delta, fc_gamma)


class PtSelfAttnBlock(nn.Module):
    """Vector self-attention over a point set with per-point features."""

    d_points: int
    d_model: int
    k: int
    approx_knn: bool = True  # TPU approx_max_k: ~4x faster top-k, recall ~0.95
    use_fused: bool = False  # Pallas fused attention core (eval path)
    use_fused_knn: bool = False  # Pallas fused KNN+gather+attention (eval)
    use_fused_knn_train: bool = False  # fused fwd + XLA-from-idx backward (train)
    knn_bf16_dist: bool = False  # bf16 arg-min rounds in the fused kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,  # (B, M, 3)
        features: jnp.ndarray,  # (B, M, d_points)
        anchor_idx: Optional[jnp.ndarray] = None,  # (A,) static anchors
        anchor_xyz: Optional[jnp.ndarray] = None,  # (A, 3) verbatim anchor coords
    ) -> jnp.ndarray:
        pre = features
        x = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(x)
        w_ks = RawDense(self.d_model, self.d_model, dtype=self.dtype, name="w_ks")
        w_vs = RawDense(self.d_model, self.d_model, dtype=self.dtype, name="w_vs")

        fc_delta = _mlp_params(self, "fc_delta", 3, self.d_model)
        fc_gamma = _mlp_params(self, "fc_gamma", self.d_model, self.d_model)

        if (self.use_fused_knn or self.use_fused_knn_train) and anchor_idx is None:
            # exact KNN happens INSIDE the kernel (serial arg-min, ~4.3 ms
            # per instance): XLA's exact lax.top_k lowers to a full sort
            # (24.9 ms at these shapes) — measured, not worth it
            bq, cj = _fused_block_config(xyz.shape[1], self.k, self.d_model)
            if self.use_fused_knn_train:
                # custom-VJP wrapper: fused fwd, XLA-from-saved-idx bwd —
                # train selects with the SAME exact packed-key rounds as eval
                from ...ops.pallas_knn_attn import knn_vector_attention_trainable

                res = knn_vector_attention_trainable(
                    q, xyz, xyz, x, w_ks.matrix(), w_vs.matrix(),
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    self.k, bq, cj, False,
                )
                # saved across the decoder remat boundary ((B, M, D) bf16,
                # ~3.4 MB/instance) so the backward's block replay skips
                # re-running the fused Pallas kernel (measured 5.6 ms per
                # cross instance on v5e — the replay was half the kernel's
                # train-step cost; decoder.py remat policy)
                res = checkpoint_name(res, "knn_attn_out")
            else:
                from ...ops.pallas_knn_attn import fused_knn_vector_attention

                res = fused_knn_vector_attention(
                    q, xyz, xyz, x, w_ks.matrix(), w_vs.matrix(),
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    n_neighbor=self.k, block_q=bq, chunk_j=cj,
                    bf16_dist=self.knn_bf16_dist,
                )
            return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre

        if anchor_idx is not None:
            # fixed shared anchors: every point attends to the same subset.
            # ``anchor_xyz`` reproduces the reference exactly: the loaded
            # assets/anchor.npy coords feed the position encoding while
            # anchor_idx gathers the features (point_transformers.py:24-30,
            # 75-79 — xyz and idx come from the file, not the live cloud).
            B, M = xyz.shape[0], xyz.shape[1]
            A = anchor_idx.shape[0]
            a_xyz = (
                jnp.broadcast_to(anchor_xyz[None], (B, A, 3))
                if anchor_xyz is not None else xyz[:, anchor_idx]
            )
            if self.use_fused_knn:
                # project only the A anchor rows, then one fused kernel —
                # the XLA path materializes ~8 (B, M, A, D) HBM tensors
                from ...ops.pallas_knn_attn import fused_anchor_vector_attention

                x_a = x[:, anchor_idx]
                res = fused_anchor_vector_attention(
                    q, xyz, w_ks(x_a), w_vs(x_a), a_xyz,
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    block_q=32 if self.d_model >= 1024 else 128,
                )
                return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre
            ks, vs = w_ks(x), w_vs(x)
            local_xyz = jnp.broadcast_to(a_xyz[:, None], (B, M, A, 3))
            k_g = jnp.broadcast_to(ks[:, anchor_idx][:, None], (B, M) + (anchor_idx.shape[0], self.d_model))
            v_g = jnp.broadcast_to(vs[:, anchor_idx][:, None], (B, M) + (anchor_idx.shape[0], self.d_model))
        else:
            _, idx, local_xyz = knn_points(xyz, xyz, self.k, approx=self.approx_knn)
            # HBM gathers are the hot op here (measured ~25 GB/s on v5e):
            # gather the shared fc1 activations ONCE, then run the k/v
            # projections on the gathered (M, K, D) tensor — (M*K)/N more
            # dense FLOPs (free on the MXU) for half the gather traffic.
            x_g = _gather_shared(x, idx)
            k_g = w_ks(x_g)
            v_g = w_vs(x_g)

        delta = xyz[:, :, None] - local_xyz
        res = _run_vector_attention(q, k_g, v_g, delta, fc_delta, fc_gamma, self.use_fused, self.dtype)
        return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre


class PtCrossAttnBlock(nn.Module):
    """Vector cross-attention: queries attend to KNN of a key point cloud."""

    d_points: int
    d_model: int
    k: int
    approx_knn: bool = True
    use_fused: bool = False
    use_fused_knn: bool = False
    use_fused_knn_train: bool = False
    knn_bf16_dist: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,  # (B, N, 3) key cloud
        features: jnp.ndarray,  # (B, N, d_model) key features
        query_xyz: jnp.ndarray,  # (B, M, 3)
        query_feat: jnp.ndarray,  # (B, M, d_points)
        anchor_idx: Optional[jnp.ndarray] = None,
        anchor_xyz: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        pre = query_feat
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(query_feat)

        x_full = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        w_ks = RawDense(self.d_model, self.d_model, dtype=self.dtype, name="w_ks")
        w_vs = RawDense(self.d_model, self.d_model, dtype=self.dtype, name="w_vs")

        fc_delta = _mlp_params(self, "fc_delta", 3, self.d_model)
        fc_gamma = _mlp_params(self, "fc_gamma", self.d_model, self.d_model)

        if (self.use_fused_knn or self.use_fused_knn_train) and anchor_idx is None:
            bq, cj = _fused_block_config(xyz.shape[1], self.k, self.d_model)
            if self.use_fused_knn_train:
                from ...ops.pallas_knn_attn import knn_vector_attention_trainable

                res = knn_vector_attention_trainable(
                    q, query_xyz, xyz, x_full, w_ks.matrix(), w_vs.matrix(),
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    self.k, bq, cj, False,
                )
                # see PtSelfAttnBlock: saved across the remat boundary
                res = checkpoint_name(res, "knn_attn_out")
            else:
                from ...ops.pallas_knn_attn import fused_knn_vector_attention

                res = fused_knn_vector_attention(
                    q, query_xyz, xyz, x_full, w_ks.matrix(), w_vs.matrix(),
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    n_neighbor=self.k, block_q=bq, chunk_j=cj,
                    bf16_dist=self.knn_bf16_dist,
                )
            return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre

        if anchor_idx is not None:
            B, M = xyz.shape[0], query_xyz.shape[1]
            A = anchor_idx.shape[0]
            a_xyz = (
                jnp.broadcast_to(anchor_xyz[None], (B, A, 3))
                if anchor_xyz is not None else xyz[:, anchor_idx]
            )
            if self.use_fused_knn:
                from ...ops.pallas_knn_attn import fused_anchor_vector_attention

                x_a = x_full[:, anchor_idx]
                res = fused_anchor_vector_attention(
                    q, query_xyz, w_ks(x_a), w_vs(x_a), a_xyz,
                    tuple(p.astype(self.dtype) for p in fc_delta),
                    tuple(p.astype(self.dtype) for p in fc_gamma),
                    block_q=32 if self.d_model >= 1024 else 128,
                )
                return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre
            local_xyz = jnp.broadcast_to(a_xyz[:, None], (B, M, A, 3))
            k_full, v_full = w_ks(x_full), w_vs(x_full)
            k_g = jnp.broadcast_to(k_full[:, anchor_idx][:, None], (B, M, A, self.d_model))
            v_g = jnp.broadcast_to(v_full[:, anchor_idx][:, None], (B, M, A, self.d_model))
        else:
            _, idx, local_xyz = knn_points(query_xyz, xyz, self.k, approx=self.approx_knn)
            # one gather of the shared fc1 activations, then project the
            # gathered tensor — half the HBM gather traffic (see
            # PtSelfAttnBlock; gathers measured ~25 GB/s on v5e)
            x_g = _gather_shared(x_full, idx)
            k_g = w_ks(x_g)
            v_g = w_vs(x_g)

        delta = query_xyz[:, :, None] - local_xyz
        res = _run_vector_attention(q, k_g, v_g, delta, fc_delta, fc_gamma, self.use_fused, self.dtype)
        return nn.Dense(self.d_points, dtype=self.dtype, name="fc2")(res) + pre
