"""Pallas kernels: interpret-mode numerics vs pure-XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from poem_v2_tpu.ops.pallas_vector_attn import (
    fused_vector_attention,
    vector_attention_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_fused_vector_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, M, K, D = 2, 100, 8, 64  # M not a block multiple on purpose
    q = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    k_g = jnp.asarray(rng.randn(B, M, K, D).astype(np.float32))
    v_g = jnp.asarray(rng.randn(B, M, K, D).astype(np.float32))
    delta = jnp.asarray(rng.randn(B, M, K, 3).astype(np.float32) * 0.1)

    def mkw(i, o):
        return jnp.asarray(rng.randn(i, o).astype(np.float32) / np.sqrt(i))

    fc_delta = (mkw(3, D), jnp.zeros(D), mkw(D, D), jnp.zeros(D))
    fc_gamma = (mkw(D, D), jnp.zeros(D), mkw(D, D), jnp.zeros(D))

    want = np.asarray(vector_attention_reference(q, k_g, v_g, delta, fc_delta, fc_gamma))
    got = np.asarray(
        fused_vector_attention(
            q, k_g, v_g, delta, fc_delta, fc_gamma, block_q=32, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fused_knn_vector_attention_exact(monkeypatch):
    """Fused KNN+gather+attention kernel == exact-KNN XLA path.

    Run at 'highest' matmul precision: the CPU backend's default matmul
    downconverts operands (oneDNN), which would smear the comparison.
    """
    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention
    from poem_v2_tpu.ops.points import index_points, knn_points

    with jax.default_matmul_precision("highest"):
        B, M, N, D, K = 2, 67, 200, 64, 8
        rs = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz, ptxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, 3), mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))

        out = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True,
        )
        _, idx, nn_xyz = knn_points(qxyz, ptxyz, K, approx=False)
        x_g = index_points(x_full, idx)
        ref = vector_attention_reference(
            q, x_g @ wk, x_g @ wv, qxyz[:, :, None] - nn_xyz, fcd, fcg
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_pt_blocks_fused_knn_matches_xla():
    """PtSelf/CrossAttnBlock(use_fused_knn) == the XLA exact-KNN path."""
    import poem_v2_tpu.ops.pallas_knn_attn as pk
    from poem_v2_tpu.models.bricks.point_transformer import (
        PtCrossAttnBlock, PtSelfAttnBlock,
    )

    # interpret mode on CPU (no Mosaic); exact knn on the XLA side
    orig = pk.fused_knn_vector_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        kw["block_q"] = 16
        kw["chunk_j"] = 4
        return orig(*args, **kw)

    pk.fused_knn_vector_attention = interp
    try:
        with jax.default_matmul_precision("highest"):
            rs = np.random.RandomState(1)
            B, M, N, D, K = 2, 33, 100, 32, 4
            xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
            feats = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
            qxyz = jnp.asarray(rs.randn(B, M, 3).astype(np.float32))
            qf = jnp.asarray(rs.randn(B, M, D).astype(np.float32))

            blk = PtCrossAttnBlock(D, D, K, approx_knn=False, use_fused_knn=False)
            v = blk.init(jax.random.PRNGKey(0), xyz, feats, qxyz, qf)
            ref = blk.apply(v, xyz, feats, qxyz, qf)
            blk_f = PtCrossAttnBlock(D, D, K, approx_knn=False, use_fused_knn=True)
            out = blk_f.apply(v, xyz, feats, qxyz, qf)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

            sblk = PtSelfAttnBlock(D, D, K, approx_knn=False, use_fused_knn=False)
            v2 = sblk.init(jax.random.PRNGKey(0), qxyz, qf)
            ref2 = sblk.apply(v2, qxyz, qf)
            sblk_f = PtSelfAttnBlock(D, D, K, approx_knn=False, use_fused_knn=True)
            out2 = sblk_f.apply(v2, qxyz, qf)
            np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4, rtol=1e-4)
    finally:
        pk.fused_knn_vector_attention = orig
