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


def test_fused_anchor_vector_attention_matches_xla():
    """Fixed-anchor fused kernel == the XLA broadcast anchor path."""
    from poem_v2_tpu.ops.pallas_knn_attn import fused_anchor_vector_attention

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(2)
        B, M, A, D = 2, 67, 8, 64
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz = mk(B, M, D), mk(B, M, 3)
        k_a, v_a = mk(B, A, D), mk(B, A, D)
        axyz = mk(A, 3)
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))

        out = fused_anchor_vector_attention(
            q, qxyz, k_a, v_a, axyz, fcd, fcg, block_q=16, interpret=True
        )
        k_g = jnp.broadcast_to(k_a[:, None], (B, M, A, D))
        v_g = jnp.broadcast_to(v_a[:, None], (B, M, A, D))
        delta = qxyz[:, :, None] - axyz[None, None]
        ref = vector_attention_reference(q, k_g, v_g, delta, fcd, fcg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_pt_blocks_fused_anchor_matches_xla():
    """PtSelf/CrossAttnBlock anchor path (use_fused_knn) == XLA broadcast path."""
    import poem_v2_tpu.ops.pallas_knn_attn as pk
    from poem_v2_tpu.models.bricks.point_transformer import (
        PtCrossAttnBlock, PtSelfAttnBlock,
    )

    orig = pk.fused_anchor_vector_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        kw["block_q"] = 16
        return orig(*args, **kw)

    pk.fused_anchor_vector_attention = interp
    try:
        with jax.default_matmul_precision("highest"):
            rs = np.random.RandomState(3)
            B, M, N, D, A = 2, 33, 100, 32, 8
            xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
            feats = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
            qxyz = jnp.asarray(rs.randn(B, M, 3).astype(np.float32))
            qf = jnp.asarray(rs.randn(B, M, D).astype(np.float32))
            anchor_idx = jnp.asarray(rs.choice(N, A, replace=False).astype(np.int32))
            anchor_xyz = jnp.asarray(rs.randn(A, 3).astype(np.float32))

            for a_xyz in (None, anchor_xyz):
                blk = PtCrossAttnBlock(D, D, A, use_fused_knn=False)
                v = blk.init(jax.random.PRNGKey(0), xyz, feats, qxyz, qf,
                             anchor_idx=anchor_idx, anchor_xyz=a_xyz)
                ref = blk.apply(v, xyz, feats, qxyz, qf,
                                anchor_idx=anchor_idx, anchor_xyz=a_xyz)
                blk_f = PtCrossAttnBlock(D, D, A, use_fused_knn=True)
                out = blk_f.apply(v, xyz, feats, qxyz, qf,
                                  anchor_idx=anchor_idx, anchor_xyz=a_xyz)
                np.testing.assert_allclose(
                    np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

            q_anchor = jnp.asarray(rs.choice(M, A, replace=False).astype(np.int32))
            sblk = PtSelfAttnBlock(D, D, A, use_fused_knn=False)
            v2 = sblk.init(jax.random.PRNGKey(0), qxyz, qf,
                           anchor_idx=q_anchor, anchor_xyz=anchor_xyz)
            ref2 = sblk.apply(v2, qxyz, qf, anchor_idx=q_anchor, anchor_xyz=anchor_xyz)
            sblk_f = PtSelfAttnBlock(D, D, A, use_fused_knn=True)
            out2 = sblk_f.apply(v2, qxyz, qf, anchor_idx=q_anchor, anchor_xyz=anchor_xyz)
            np.testing.assert_allclose(
                np.asarray(out2), np.asarray(ref2), atol=1e-4, rtol=1e-4)
    finally:
        pk.fused_anchor_vector_attention = orig


def test_dense_cross_attention_matches_einsum():
    from poem_v2_tpu.ops.pallas_cross_attn import dense_cross_attention

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(4)
        B, M, N, H, nh = 2, 67, 130, 64, 4  # M, N not block multiples
        hd = H // nh
        q = jnp.asarray(rs.randn(B, M, H).astype(np.float32))
        k = jnp.asarray(rs.randn(B, N, H).astype(np.float32))
        v = jnp.asarray(rs.randn(B, N, H).astype(np.float32))

        got = dense_cross_attention(
            q, k, v, num_heads=nh, sm_scale=1.0 / hd ** 0.5, interpret=True
        )
        qh = q.reshape(B, M, nh, hd)
        kh = k.reshape(B, N, nh, hd)
        vh = v.reshape(B, N, nh, hd)
        logits = jnp.einsum("bqhd,bnhd->bhqn", qh, kh) / hd ** 0.5
        probs = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqn,bnhd->bqhd", probs, vh).reshape(B, M, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_grid_sample_fused_matches_4tap():
    from poem_v2_tpu.ops.pallas_bilinear import grid_sample_points_fused
    from poem_v2_tpu.ops.sampling import grid_sample_points

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(5)
        B, H, W, C, N = 2, 8, 8, 32, 100
        feat = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
        # include far out-of-image points and exact cell borders
        coords = jnp.asarray(
            np.concatenate(
                [
                    rs.uniform(-1.4, 1.4, (B, N - 4, 2)),
                    np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [-2.0, 0.5]]]
                             ).repeat(B, 0),
                ],
                axis=1,
            ).astype(np.float32)
        )
        got = grid_sample_points_fused(feat, coords, block_n=64, interpret=True)
        ref = grid_sample_points(feat, coords)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_bucketed_knn_attention_exact_and_certified():
    """Bucketed kernel == full kernel when all buckets are candidates
    (sentinel margin), and certifies exactness on favourable geometry."""
    from poem_v2_tpu.ops.pallas_knn_attn import (
        fused_knn_vector_attention,
        fused_knn_vector_attention_bucketed,
    )
    from poem_v2_tpu.ops.points import build_balanced_buckets

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(0)
        B, M, N, D, K, SB = 2, 64, 512, 64, 8, 32
        cloud = rs.randn(N, 3).astype(np.float32)
        perm, lo, hi = build_balanced_buckets(cloud, SB)
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz = mk(B, M, D), mk(B, M, 3)
        ptxyz = jnp.asarray(np.broadcast_to(cloud[perm], (B, N, 3)).copy())
        x_full = mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))

        ref = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True)
        # all buckets candidates -> bitwise-equal result, sentinel margin
        out, margins = fused_knn_vector_attention_bucketed(
            q, qxyz, ptxyz, x_full, jnp.asarray(lo), jnp.asarray(hi),
            wk, wv, fcd, fcg, n_neighbor=K, block_q=16, chunk_j=4,
            n_cand=N // SB, bucket_size=SB, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        assert np.asarray(margins).min() > 1e30

        # spatially tight query clusters -> certified blocks match the
        # full kernel; the certificate is the contract for the rest
        qxyz2 = jnp.asarray(
            cloud[7][None, None] + rs.randn(B, M, 3).astype(np.float32) * 0.05
        )
        ref2 = fused_knn_vector_attention(
            q, qxyz2, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True)
        out2, margins2 = fused_knn_vector_attention_bucketed(
            q, qxyz2, ptxyz, x_full, jnp.asarray(lo), jnp.asarray(hi),
            wk, wv, fcd, fcg, n_neighbor=K, block_q=16, chunk_j=4,
            n_cand=8, bucket_size=SB, interpret=True)
        m2 = np.asarray(margins2)
        assert (m2 >= 0).any(), "no block certified on easy geometry"
        err = np.abs(np.asarray(out2) - np.asarray(ref2)).reshape(B, M // 16, 16, D)
        per_block = err.max(axis=(2, 3))
        assert per_block[m2 >= 0].max() < 1e-5


def test_fused_block_config_divides_neighbour_count():
    """Regression: chunk_j must divide K for any (cloud size, K) combo —
    the smoke config (K=8) hit chunk_j=32 and tripped the kernel assert."""
    from poem_v2_tpu.models.bricks.point_transformer import _fused_block_config

    for n in (256, 799, 1024, 4096):
        for k in (1, 3, 8, 16, 32, 48):
            bq, cj = _fused_block_config(n, k)
            assert k % cj == 0, (n, k, bq, cj)
            assert 1 <= cj <= max(k, 1)


def test_fused_knn_idx_fed_matches_argmin():
    """neighbor_idx-fed kernel variant == in-kernel arg-min variant.

    Kept as infrastructure: XLA exact top_k lowers to a 25 ms full sort
    at POEM sizes so the in-kernel arg-min stays the default, but any
    future cheap index source can feed this path."""
    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention
    from poem_v2_tpu.ops.points import knn_points

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(6)
        B, M, N, D, K = 2, 67, 200, 64, 8
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz, ptxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, 3), mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))
        # packed_keys=False: the packed-key default quantizes distances to
        # ~2^-11 relative for tie-breaking, which can legitimately pick a
        # different equally-near neighbour than exact top_k on random
        # clouds; the idx-fed path must match the EXACT arg-min variant.
        ref = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True,
            packed_keys=False)
        _, idx, _ = knn_points(qxyz, ptxyz, K, approx=False)
        out = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, neighbor_idx=idx, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_train_mode_avoids_vjp_less_kernels():
    """Gradients must flow through a head built with every fused-eval flag
    on: the Pallas kernels have no VJP, so train mode (deterministic=False)
    must route to the differentiable XLA paths. Regression: the fused
    sampler was gated on the flag only and broke TPU training."""
    import numpy as np
    from poem_v2_tpu.models.heads.ptemb_head import (
        POEMGeneralizedHead, generate_bps_basis,
    )

    rs = np.random.RandomState(0)
    B, V, H, W, C = 1, 2, 8, 8, 16
    nsample, nq = 64, 31
    head = POEMGeneralizedHead(
        embed_dims=32, pt_feat_dim=32, in_channels=C, num_query=nq,
        nsample=nsample, pe_num_feats=8, n_blocks=2, num_heads=2,
        n_neighbor=4, n_neighbor_query=4,
        bps_basis=generate_bps_basis(nsample, 0.1),
        template_mesh=rs.randn(nq, 3).astype(np.float32) * 0.05,
        query_anchor_idx=np.arange(4), pt_anchor_idx=np.arange(4),
        use_flash=True, use_fused_knn=True, use_fused_sampling=True,
    )
    mlvl = jnp.asarray(rs.randn(B, V, H, W, C).astype(np.float32))
    vm = jnp.ones((B, V), bool)
    intr = jnp.tile(jnp.eye(3)[None, None] * 50, (B, V, 1, 1))
    extr = jnp.tile(jnp.eye(4)[None, None], (B, V, 1, 1))
    ref = jnp.asarray(rs.randn(B, 21, 3).astype(np.float32) * 0.02)
    rng = jax.random.PRNGKey(0)
    variables = head.init(
        {"params": rng, "dropout": rng}, mlvl, vm, intr, extr, ref,
        inp_res=(64, 64), deterministic=False,
    )

    def loss(params):
        out = head.apply(
            {"params": params}, mlvl, vm, intr, extr, ref,
            inp_res=(64, 64), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out["all_coords_preds"] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_fused_knn_packed_keys_matches_argmin_rounds():
    """packed-key threshold-scan selection == serial arg-min selection.

    The packed key replaces the 12 low mantissa bits of d2 with the
    column index (unique keys, lowest-index tie break, read-only rounds);
    on generic random clouds the selected sets — and therefore the
    outputs — are identical to the arg-min rounds."""
    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(11)
        B, M, N, D, K = 2, 67, 200, 64, 8
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz, ptxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, 3), mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))
        ref = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, packed_keys=False, interpret=True)
        out = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, packed_keys=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_knn_packed_keys_duplicate_points_tie_break():
    """Exact duplicate cloud points (hard ties) select identically under
    packed keys and arg-min rounds: both break to the lowest index."""
    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(3)
        B, M, N, D, K = 1, 16, 64, 32, 8
        base = rs.randn(N // 2, 3).astype(np.float32)
        ptxyz = jnp.asarray(np.concatenate([base, base]))[None]  # every point duplicated
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))
        ref = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, packed_keys=False, interpret=True)
        out = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, packed_keys=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dense_cross_attention_grads_match_einsum():
    """The dense attention kernel's custom VJP == autodiff of the einsum
    softmax(QK^T)V at fp32 — the grad-parity gate for making the kernel
    the default training attention (VERDICT r2 #4)."""
    from poem_v2_tpu.ops.pallas_cross_attn import dense_cross_attention

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(5)
        B, M, N, H, nh = 2, 67, 150, 64, 4
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, k, v = mk(B, M, H), mk(B, N, H), mk(B, N, H)
        do = mk(B, M, H)
        scale = 1.0 / (H // nh) ** 0.5

        def ref(q, k, v):
            hd = H // nh
            qh = q.reshape(B, M, nh, hd)
            kh = k.reshape(B, N, nh, hd)
            vh = v.reshape(B, N, nh, hd)
            logits = jnp.einsum("bqhd,bnhd->bhqn", qh, kh) * scale
            p = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqn,bnhd->bqhd", p, vh).reshape(B, M, H)

        def kern(q, k, v):
            return dense_cross_attention(
                q, k, v, num_heads=nh, sm_scale=scale, interpret=True)

        out_r, vjp_r = jax.vjp(ref, q, k, v)
        out_k, vjp_k = jax.vjp(kern, q, k, v)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   atol=2e-5, rtol=1e-5)
        for gr, gk, name in zip(vjp_r(do), vjp_k(do), ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(gr), atol=5e-5, rtol=1e-4,
                err_msg=f"{name} diverged between kernel VJP and einsum autodiff")


def test_scramble_supports_gating():
    """Geometries that violate the kernel's static constraints must be
    routed to the XLA fallback: C=64 fails Mosaic's 128-lane slice
    alignment (crashed the overfit config before the gate), NS=64/V=2
    fails the span bound, NS non-multiple of G fails the grid."""
    from poem_v2_tpu.ops.pallas_scramble import supports

    assert supports(8, 4096, 256)          # flagship
    assert supports(2, 256, 128)
    assert not supports(8, 4096, 64)       # C not 128-aligned
    assert not supports(2, 64, 256)        # span_rows >= V*NS
    assert not supports(8, 100, 256)       # NS % G != 0


def test_scrambled_merge_gather_matches_row_gather():
    """Pallas span-copy scramble == the XLA row-gather form for every
    valid-view count, including the clamped tail rows (PARITY.md #9)."""
    from poem_v2_tpu.ops.pallas_scramble import scrambled_merge_gather

    rs = np.random.RandomState(4)
    B, V, NS, C = 3, 4, 32, 8
    flat = jnp.asarray(rs.randn(B, V * NS * C).astype(np.float32))
    n_val = jnp.asarray([4, 2, 1], dtype=jnp.int32)

    out = scrambled_merge_gather(flat, n_val, V=V, C=C, G=8, interpret=True)

    a_rows = flat.reshape(B, V * NS, C)
    r = (jnp.arange(NS)[None, :, None] * n_val[:, None, None]
         + jnp.arange(V)[None, None, :])
    r = jnp.minimum(r, V * NS - 1)
    ref = jnp.take_along_axis(
        a_rows, r.reshape(B, NS * V)[..., None], axis=1).reshape(B, NS, V, C)

    # only rows j < n are semantically live (others alias by different
    # clamping rules); compare the live region exactly
    for b in range(B):
        n = int(n_val[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n], atol=0,
            err_msg=f"scramble diverged for n={n}")


def test_scramble_uniform_batch_is_pure_reshape():
    """When every sample uses all V views, the reference scramble index
    r[i, j] = i*n + j with n == V enumerates rows in identity order, so
    the head's lax.cond fast path (a plain reshape, matching the zero
    cost of the torch `.view`) must equal the ragged gather exactly."""
    rs = np.random.RandomState(11)
    B, V, NS, C = 2, 4, 32, 8
    a4 = jnp.asarray(rs.randn(B, V, C, NS).astype(np.float32))
    a_rows = a4.reshape(B, V * NS, C)

    n_val = jnp.full((B,), V, dtype=jnp.int32)
    r = (jnp.arange(NS)[None, :, None] * n_val[:, None, None]
         + jnp.arange(V)[None, None, :])
    r = jnp.minimum(r, V * NS - 1)
    ref = jnp.take_along_axis(
        a_rows, r.reshape(B, NS * V)[..., None], axis=1).reshape(B, NS, V, C)

    fast = a_rows.reshape(B, NS, V, C)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_fused_knn_return_idx_semantics():
    """return_idx indices gather the K nearest points: their distances
    match exact top_k distances (packed keys quantize tie-breaks to
    ~2^-11 relative, so compare distances, not raw index identity)."""
    from poem_v2_tpu.ops.pallas_knn_attn import fused_knn_vector_attention
    from poem_v2_tpu.ops.points import square_distance

    rs = np.random.RandomState(3)
    B, M, N, D, K = 2, 67, 200, 64, 8
    mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
    q, qxyz, ptxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, 3), mk(B, N, D)
    wk, wv = mk(D, D) / 8, mk(D, D) / 8
    fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
    fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))

    for packed in (True, False):
        out, idx = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True,
            packed_keys=packed, return_idx=True,
        )
        assert idx.shape == (B, M, K) and idx.dtype == jnp.int32
        d2 = square_distance(qxyz, ptxyz)  # (B, M, N)
        want = -jax.lax.top_k(-d2, K)[0]
        got = jnp.take_along_axis(d2, idx, axis=-1)
        # ascending selection order up to the packed-key tie quantization
        # (the low 12 mantissa bits hold the column: true distances within
        # ~2^-11 relative may come back swapped)
        g = np.asarray(got)
        assert np.all(np.diff(g, axis=-1) >= -2e-3 * g[..., 1:] - 1e-6)
        np.testing.assert_allclose(
            np.sort(np.asarray(got)), np.asarray(want), rtol=2e-3, atol=1e-5
        )
        # the plain call is unchanged by the idx plumbing
        out_plain = fused_knn_vector_attention(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, interpret=True,
            packed_keys=packed,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain), atol=1e-6)


def test_knn_vector_attention_trainable_value_and_grads(monkeypatch):
    """Trainable wrapper: fused forward value == XLA-from-idx reference;
    gradients == autodiff of the XLA path at the kernel-saved indices
    (for every input: q, xyzs, cloud features, projections, both MLPs)."""
    import poem_v2_tpu.ops.pallas_knn_attn as pk

    orig = pk.fused_knn_vector_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pk, "fused_knn_vector_attention", interp)

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(11)
        B, M, N, D, K = 2, 35, 96, 32, 8
        mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32))
        q, qxyz, ptxyz, x_full = mk(B, M, D), mk(B, M, 3), mk(B, N, 3), mk(B, N, D)
        wk, wv = mk(D, D) / 8, mk(D, D) / 8
        fcd = (mk(3, D), mk(D), mk(D, D) / 8, mk(D))
        fcg = (mk(D, D) / 8, mk(D), mk(D, D) / 8, mk(D))
        ct = mk(B, M, D)  # fixed cotangent

        _, idx = orig(
            q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg,
            n_neighbor=K, block_q=16, chunk_j=4, return_idx=True,
            interpret=True,
        )

        def loss_trainable(*args):
            out = pk.knn_vector_attention_trainable(*args, K, 16, 4, True)
            return jnp.sum(out * ct)

        def loss_ref(*args):
            out = pk._attention_from_idx(*args, idx, True)
            return jnp.sum(out * ct)

        args = (q, qxyz, ptxyz, x_full, wk, wv, fcd, fcg)
        val_t, grads_t = jax.value_and_grad(loss_trainable, argnums=range(8))(*args)
        val_r, grads_r = jax.value_and_grad(loss_ref, argnums=range(8))(*args)

        np.testing.assert_allclose(float(val_t), float(val_r), rtol=1e-4)
        flat_t = jax.tree_util.tree_leaves(grads_t)
        flat_r = jax.tree_util.tree_leaves(grads_r)
        assert len(flat_t) == len(flat_r) == 14  # 6 arrays + 2 MLP 4-tuples
        for gt, gr in zip(flat_t, flat_r):
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gr), rtol=1e-4, atol=1e-5
            )


def test_pt_self_block_fused_knn_train_matches_xla_grads(monkeypatch):
    """PtSelfAttnBlock(use_fused_knn_train) value+grads == the unfused
    exact-selection XLA block (approx_knn=False)."""
    import poem_v2_tpu.ops.pallas_knn_attn as pk
    from poem_v2_tpu.models.bricks.point_transformer import PtSelfAttnBlock

    orig = pk.fused_knn_vector_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pk, "fused_knn_vector_attention", interp)

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(7)
        B, N, D, K = 2, 96, 32, 4
        xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rs.randn(B, N, D).astype(np.float32))

        blk_train = PtSelfAttnBlock(
            d_points=D, d_model=D, k=K, use_fused_knn_train=True)
        blk_xla = PtSelfAttnBlock(d_points=D, d_model=D, k=K, approx_knn=False)
        variables = blk_xla.init(jax.random.PRNGKey(0), xyz, feats)

        def loss(fn, v):
            return jnp.sum(fn.apply(v, xyz, feats) ** 2)

        val_t, g_t = jax.value_and_grad(lambda v: loss(blk_train, v))(variables)
        val_r, g_r = jax.value_and_grad(lambda v: loss(blk_xla, v))(variables)
        np.testing.assert_allclose(float(val_t), float(val_r), rtol=5e-4)
        for gt, gr in zip(jax.tree_util.tree_leaves(g_t),
                          jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gr), rtol=2e-3, atol=2e-4
            )


def test_pt_blocks_fused_knn_train_matches_xla_grads(monkeypatch):
    """PtCrossAttnBlock(use_fused_knn_train) value+grads == the unfused
    exact-selection XLA block (approx_knn=False) on a tie-free cloud."""
    import poem_v2_tpu.ops.pallas_knn_attn as pk
    from poem_v2_tpu.models.bricks.point_transformer import PtCrossAttnBlock

    orig = pk.fused_knn_vector_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pk, "fused_knn_vector_attention", interp)

    with jax.default_matmul_precision("highest"):
        rs = np.random.RandomState(5)
        B, M, N, D, K = 2, 35, 96, 32, 4
        xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
        qxyz = jnp.asarray(rs.randn(B, M, 3).astype(np.float32))
        qfeat = jnp.asarray(rs.randn(B, M, D).astype(np.float32))

        blk_train = PtCrossAttnBlock(
            d_points=D, d_model=D, k=K, use_fused_knn_train=True)
        blk_xla = PtCrossAttnBlock(d_points=D, d_model=D, k=K, approx_knn=False)
        rng = jax.random.PRNGKey(0)
        variables = blk_xla.init(rng, xyz, feats, qxyz, qfeat)

        def loss(fn, v):
            return jnp.sum(fn.apply(v, xyz, feats, qxyz, qfeat) ** 2)

        val_t, g_t = jax.value_and_grad(lambda v: loss(blk_train, v))(variables)
        val_r, g_r = jax.value_and_grad(lambda v: loss(blk_xla, v))(variables)
        np.testing.assert_allclose(float(val_t), float(val_r), rtol=5e-4)
        for gt, gr in zip(jax.tree_util.tree_leaves(g_t),
                          jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gr), rtol=2e-3, atol=2e-4
            )


def test_scatter_add_rows_matches_xla_scatter():
    """MXU one-hot-matmul scatter == XLA scatter-add (f32 exact: the
    one-hot is exact and each output row sums ≤ M*K float adds)."""
    from poem_v2_tpu.ops.pallas_scatter import scatter_add_rows

    rs = np.random.RandomState(0)
    B, M, K, D, N = 2, 45, 8, 128, 200  # M not a chunk multiple; N not lane-aligned
    grads = jnp.asarray(rs.randn(B, M, K, D).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, N, size=(B, M, K)).astype(np.int32))

    got = scatter_add_rows(grads, idx, N, chunk_m=16, interpret=True)
    want = jnp.zeros((B, N, D)).at[
        jnp.arange(B)[:, None], idx.reshape(B, -1)
    ].add(grads.reshape(B, M * K, D))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # bf16 grads: kernel accumulates in f32 (at least as accurate as XLA)
    got16 = scatter_add_rows(grads.astype(jnp.bfloat16), idx, N,
                             chunk_m=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_index_points_mxu_grads_match_xla_gather():
    """index_points_mxu forward == index_points; its custom backward
    (MXU scatter) == autodiff of the plain XLA gather."""
    from poem_v2_tpu.ops.pallas_scatter import index_points_mxu
    from poem_v2_tpu.ops.points import index_points

    rs = np.random.RandomState(1)
    B, N, D, M, K = 2, 96, 128, 35, 8
    pts = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, N, size=(B, M, K)).astype(np.int32))
    ct = jnp.asarray(rs.randn(B, M, K, D).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(index_points_mxu(pts, idx, True)),
        np.asarray(index_points(pts, idx)))

    g_mxu = jax.grad(lambda p: jnp.sum(index_points_mxu(p, idx, True) * ct))(pts)
    g_xla = jax.grad(lambda p: jnp.sum(index_points(p, idx) * ct))(pts)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-5)


def test_gather_shared_dtype_gating(monkeypatch):
    """The shared-activation gather takes the MXU one-hot backward only
    for bf16 activations (exact for bf16 grads); f32 keeps the XLA
    gather/scatter pair bit-exact — the dp8==single-device cross-mesh
    gate in __graft_entry__ depends on it (f32 one-hot matmuls round at
    the MXU's ~1e-3, which leaked ~1.5e-5 into the gate's loss)."""
    import poem_v2_tpu.models.bricks.point_transformer as pt

    rs = np.random.RandomState(3)
    pts32 = jnp.asarray(rs.randn(2, 16, 8).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 16, size=(2, 5, 3)).astype(np.int32))

    calls = []
    import poem_v2_tpu.ops.pallas_scatter as ps

    real = ps.index_points_mxu

    def spy(points, idx_, interpret=False):
        calls.append(points.dtype)
        return real(points, idx_, True)

    monkeypatch.setattr(ps, "index_points_mxu", spy)

    out32 = pt._gather_shared(pts32, idx)
    assert calls == []  # f32 stays on the XLA pair
    np.testing.assert_array_equal(
        np.asarray(out32), np.asarray(pt.index_points(pts32, idx)))

    out16 = pt._gather_shared(pts32.astype(jnp.bfloat16), idx)
    assert calls == [jnp.bfloat16]
    np.testing.assert_array_equal(
        np.asarray(out16.astype(jnp.float32)),
        np.asarray(pt.index_points(pts32.astype(jnp.bfloat16), idx).astype(jnp.float32)))

    # f32 grads through the gather are the exact XLA scatter
    g = jax.grad(lambda p: jnp.sum(pt._gather_shared(p, idx) ** 2))(pts32)
    g_ref = jax.grad(lambda p: jnp.sum(pt.index_points(p, idx) ** 2))(pts32)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
