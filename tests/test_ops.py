"""Ops tests: KNN / ball query / FPS / grid sampling vs torch & numpy golden."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from poem_v2_tpu.ops import (
    ball_query,
    farthest_point_sampling,
    grid_sample_points,
    index_points,
    knn_points,
    pixel_to_grid,
    square_distance,
)

rng = np.random.RandomState(0)


class TestKNN:
    def test_vs_numpy_bruteforce(self):
        q = rng.randn(2, 17, 3).astype(np.float32)
        p = rng.randn(2, 101, 3).astype(np.float32)
        d, idx, nn = knn_points(jnp.asarray(q), jnp.asarray(p), k=5)
        d, idx, nn = np.asarray(d), np.asarray(idx), np.asarray(nn)
        for b in range(2):
            full = ((q[b][:, None] - p[b][None]) ** 2).sum(-1)
            want_idx = np.argsort(full, axis=1)[:, :5]
            want_d = np.take_along_axis(full, want_idx, axis=1)
            np.testing.assert_allclose(np.sort(d[b], 1), np.sort(want_d, 1), atol=1e-3)
            # same neighbour sets (order may differ on exact ties only)
            assert (np.sort(idx[b], 1) == np.sort(want_idx, 1)).all()
            np.testing.assert_allclose(nn[b], p[b][idx[b]], atol=1e-6)

    def test_square_distance(self):
        a = rng.randn(3, 10, 3).astype(np.float32)
        b = rng.randn(3, 20, 3).astype(np.float32)
        got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
        want = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_index_points(self):
        pts = rng.randn(2, 50, 4).astype(np.float32)
        idx = rng.randint(0, 50, size=(2, 7, 3))
        got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][idx[b]], atol=0)


class TestBallQuery:
    def test_radius_respected(self):
        c = np.zeros((1, 1, 3), dtype=np.float32)
        p = rng.randn(1, 500, 3).astype(np.float32) * 0.2
        idx, xyz = ball_query(jnp.asarray(c), jnp.asarray(p), k=32, radius=0.15)
        idx, xyz = np.asarray(idx), np.asarray(xyz)
        valid = idx[0, 0] >= 0
        d = np.linalg.norm(xyz[0, 0][valid], axis=1)
        assert (d <= 0.15 + 1e-5).all()

    def test_insufficient_points_marked(self):
        c = np.zeros((1, 1, 3), dtype=np.float32)
        p = np.ones((1, 64, 3), dtype=np.float32)  # all far away
        p[0, 0] = 0.01
        idx, _ = ball_query(jnp.asarray(c), jnp.asarray(p), k=8, radius=0.1)
        idx = np.asarray(idx)
        assert (idx[0, 0] == -1).sum() == 7
        assert idx[0, 0, 0] == 0

    def test_random_selection_uniform(self):
        c = np.zeros((1, 1, 3), dtype=np.float32)
        p = rng.randn(1, 4096, 3).astype(np.float32) * 0.05
        idx, _ = ball_query(
            jnp.asarray(c), jnp.asarray(p), k=64, radius=0.2, rng=jax.random.PRNGKey(0)
        )
        idx2, _ = ball_query(
            jnp.asarray(c), jnp.asarray(p), k=64, radius=0.2, rng=jax.random.PRNGKey(1)
        )
        assert (np.asarray(idx) != np.asarray(idx2)).any()


class TestFPS:
    def test_spread_and_validity(self):
        p = rng.randn(2, 256, 3).astype(np.float32)
        xyz, idx = farthest_point_sampling(jnp.asarray(p), k=16)
        xyz, idx = np.asarray(xyz), np.asarray(idx)
        for b in range(2):
            assert len(set(idx[b].tolist())) == 16  # no duplicates
            np.testing.assert_allclose(xyz[b], p[b][idx[b]], atol=0)
        # FPS picks spread points: min pairwise distance larger than random pick
        d_fps = np.linalg.norm(xyz[0][:, None] - xyz[0][None], axis=-1)
        d_fps = d_fps[d_fps > 0].min()
        rand = p[0][:16]
        d_rand = np.linalg.norm(rand[:, None] - rand[None], axis=-1)
        d_rand = d_rand[d_rand > 0].min()
        assert d_fps > d_rand


class TestGridSample:
    def test_matches_torch_grid_sample(self):
        B, H, W, C, N = 2, 32, 32, 16, 777
        feat = rng.randn(B, H, W, C).astype(np.float32)
        pts = (rng.rand(B, N, 2).astype(np.float32) * 2.4 - 1.2)  # include out-of-range

        got = np.asarray(grid_sample_points(jnp.asarray(feat), jnp.asarray(pts)))

        tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
        tgrid = torch.from_numpy(pts).unsqueeze(-2)  # (B, N, 1, 2)
        want = (
            F.grid_sample(tfeat, tgrid, mode="bilinear", align_corners=False)
            .squeeze(-1)
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_pixel_to_grid(self):
        uv = jnp.asarray([[[128.0, 64.0]]])
        g = np.asarray(pixel_to_grid(uv, [256, 256]))
        np.testing.assert_allclose(g, [[[0.0, -0.5]]], atol=1e-6)

    def test_gradients_flow(self):
        feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        pts = jnp.asarray(rng.rand(1, 10, 2).astype(np.float32) - 0.5)

        def f(feat, pts):
            return jnp.sum(grid_sample_points(feat, pts) ** 2)

        gf, gp = jax.grad(f, argnums=(0, 1))(feat, pts)
        assert np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(gp)).all()
        assert np.abs(np.asarray(gp)).max() > 0


def test_bucketed_knn_exact_on_bps_cloud():
    """Voxel-bucketed KNN must be EXACT (cell >= knn radius) on the real
    BPS cloud geometry, including queries drifting outside the ball."""
    from poem_v2_tpu.models.heads.ptemb_head import generate_bps_basis
    from poem_v2_tpu.ops.points import VoxelBucketTable, knn_points, knn_points_bucketed

    cloud = generate_bps_basis(4096, 0.1) / 0.1  # normalised ball, radius 1
    table = VoxelBucketTable(cloud, cell_size=0.25)
    rs = np.random.RandomState(0)
    # queries inside + slightly outside the ball
    q = rs.randn(2, 799, 3).astype(np.float32) * 0.5
    q[0, :10] *= 3.0
    qj = jnp.asarray(q)
    pts = jnp.broadcast_to(jnp.asarray(cloud)[None], (2, 4096, 3))

    d_ref, i_ref, _ = knn_points(qj, pts, 32, approx=False)
    d_bkt, i_bkt, nn_bkt = knn_points_bucketed(qj, table, 32)
    # distances must match exactly (indices may permute under ties)
    np.testing.assert_allclose(np.asarray(d_bkt), np.asarray(d_ref), rtol=1e-5, atol=1e-6)
    # gathered coordinates consistent with indices
    np.testing.assert_allclose(
        np.asarray(nn_bkt), np.asarray(cloud)[np.asarray(i_bkt)], atol=1e-6
    )
    assert table.width < 1200  # candidate table stays ~3.5x smaller than N
