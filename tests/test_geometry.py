"""Geometry unit tests: rotations, camera math, DLT, Procrustes, heatmaps.

Golden values come from independent implementations (numpy/scipy and
closed-form identities), not from the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R
from scipy.linalg import orthogonal_procrustes

from poem_v2_tpu.geometry import (
    aa_to_quat,
    aa_to_rot6d,
    aa_to_rotmat,
    align_w_scale,
    cam_extr_transf,
    cam_intr_projection,
    gaussian_heatmap2d,
    integral_heatmap2d,
    inverse_sigmoid,
    invert_rigid,
    mano_to_openpose,
    normalize_heatmap,
    persp_project,
    project_world_to_pixel,
    quat_to_aa,
    quat_to_rotmat,
    rot6d_to_aa,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
    triangulate_dlt,
    uvd_to_xyz,
    xyz_to_uvd,
)

rng = np.random.RandomState(0)


def random_rotmats(n):
    return R.random(n, random_state=123).as_matrix().astype(np.float32)


class TestRotations:
    def test_aa_rotmat_roundtrip_vs_scipy(self):
        aa = rng.randn(64, 3).astype(np.float32)
        got = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
        want = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)
        back = np.asarray(rotmat_to_aa(jnp.asarray(got)))
        want_back = R.from_matrix(want).as_rotvec()
        np.testing.assert_allclose(back, want_back, atol=1e-4)

    def test_small_angle_stability(self):
        aa = np.array([[0.0, 0.0, 0.0], [1e-8, 0, 0]], dtype=np.float32)
        m = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
        np.testing.assert_allclose(m, np.stack([np.eye(3)] * 2), atol=1e-6)
        assert np.isfinite(np.asarray(quat_to_aa(aa_to_quat(jnp.asarray(aa))))).all()

    def test_quat_vs_scipy(self):
        aa = rng.randn(32, 3).astype(np.float32)
        q = np.asarray(aa_to_quat(jnp.asarray(aa)))  # w-first
        want = R.from_rotvec(aa).as_quat()  # x,y,z,w
        want_wfirst = np.concatenate([want[:, 3:], want[:, :3]], axis=1)
        # sign-invariant comparison
        sign = np.sign(np.sum(q * want_wfirst, axis=1, keepdims=True))
        np.testing.assert_allclose(q, want_wfirst * sign, atol=1e-5)

    def test_rotmat_quat_roundtrip(self):
        m = random_rotmats(128)
        q = rotmat_to_quat(jnp.asarray(m))
        m2 = np.asarray(quat_to_rotmat(q))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_rot6d_roundtrip(self):
        m = random_rotmats(64)
        r6 = rotmat_to_rot6d(jnp.asarray(m))
        m2 = np.asarray(rot6d_to_rotmat(r6))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_rot6d_gram_schmidt_from_noise(self):
        r6 = rng.randn(32, 6).astype(np.float32)
        m = np.asarray(rot6d_to_rotmat(jnp.asarray(r6)))
        # result must be a valid rotation
        eye = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(eye, np.stack([np.eye(3)] * 32), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), np.ones(32), atol=1e-5)

    def test_aa_rot6d_chain(self):
        aa = rng.randn(16, 3).astype(np.float32)
        back = np.asarray(rot6d_to_aa(aa_to_rot6d(jnp.asarray(aa))))
        want = R.from_matrix(R.from_rotvec(aa).as_matrix()).as_rotvec()
        np.testing.assert_allclose(back, want, atol=1e-4)


class TestCamera:
    def _setup(self, B=2, V=4, N=21):
        pts = rng.randn(B, N, 3).astype(np.float32) * 0.1
        pts[..., 2] += 0.6
        intr = np.zeros((B, V, 3, 3), dtype=np.float32)
        intr[..., 0, 0] = 500 + rng.rand(B, V) * 100
        intr[..., 1, 1] = 500 + rng.rand(B, V) * 100
        intr[..., 0, 2] = 128
        intr[..., 1, 2] = 128
        intr[..., 2, 2] = 1
        extr = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
        rot = R.random(B * V, random_state=7).as_matrix().reshape(B, V, 3, 3)
        # small rotations + small translations to keep points in front
        extr[..., :3, :3] = R.from_rotvec(
            rng.randn(B * V, 3) * 0.1
        ).as_matrix().reshape(B, V, 3, 3)
        extr[..., :3, 3] = rng.randn(B, V, 3) * 0.05
        return pts, intr, extr

    def test_extr_transf_matches_numpy(self):
        pts, _, extr = self._setup()
        got = np.asarray(cam_extr_transf(jnp.asarray(extr), jnp.asarray(pts[:, None])))
        want = (
            np.einsum("bvij,bnj->bvni", extr[..., :3, :3], pts) + extr[..., :3, 3][:, :, None]
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_invert_rigid(self):
        _, _, extr = self._setup()
        inv = np.asarray(invert_rigid(jnp.asarray(extr)))
        want = np.linalg.inv(extr)
        np.testing.assert_allclose(inv, want, atol=1e-5)

    def test_projection(self):
        pts, intr, _ = self._setup()
        uv = np.asarray(cam_intr_projection(jnp.asarray(intr), jnp.asarray(pts[:, None])))
        proj = np.einsum("bvij,bnj->bvni", intr, pts)
        want = proj[..., :2] / proj[..., 2:]
        np.testing.assert_allclose(uv, want, atol=1e-4)
        uv2 = np.asarray(persp_project(jnp.asarray(pts), jnp.asarray(intr[:, 0])))
        proj2 = np.einsum("bij,bnj->bni", intr[:, 0], pts)
        np.testing.assert_allclose(uv2, proj2[..., :2] / proj2[..., 2:], atol=1e-4)

    def test_uvd_xyz_roundtrip(self):
        pts, intr, _ = self._setup()
        root = pts[:, 0]
        uvd = xyz_to_uvd(jnp.asarray(pts), jnp.asarray(root), jnp.asarray(intr[:, 0]), [256, 256])
        xyz = np.asarray(
            uvd_to_xyz(uvd, jnp.asarray(root), jnp.asarray(intr[:, 0]), [256, 256])
        )
        np.testing.assert_allclose(xyz, pts, atol=1e-4)

    def test_inverse_sigmoid(self):
        x = jnp.asarray([0.2, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), atol=1e-5
        )

    def test_mano_to_openpose_shape_and_tips(self):
        jr = rng.rand(16, 778).astype(np.float32)
        jr /= jr.sum(1, keepdims=True)
        verts = rng.randn(3, 778, 3).astype(np.float32)
        out = np.asarray(mano_to_openpose(jnp.asarray(jr), jnp.asarray(verts)))
        assert out.shape == (3, 21, 3)
        # thumb tip (OpenPose id 4) must equal vertex 744
        np.testing.assert_allclose(out[:, 4], verts[:, 744], atol=1e-6)
        np.testing.assert_allclose(out[:, 8], verts[:, 320], atol=1e-6)
        np.testing.assert_allclose(out[:, 0], np.einsum("v,bvc->bc", jr[0], verts), atol=1e-5)


class TestTriangulation:
    def test_dlt_exact_recovery(self):
        B, V, J = 2, 5, 21
        pts = rng.randn(B, J, 3).astype(np.float64) * 0.1
        pts[..., 2] += 0.6
        intr = np.zeros((B, V, 3, 3))
        intr[..., 0, 0] = intr[..., 1, 1] = 600.0
        intr[..., 0, 2] = intr[..., 1, 2] = 128.0
        intr[..., 2, 2] = 1.0
        extr = np.tile(np.eye(4), (B, V, 1, 1))
        extr[..., :3, :3] = R.from_rotvec(rng.randn(B * V, 3) * 0.2).as_matrix().reshape(B, V, 3, 3)
        extr[..., :3, 3] = rng.randn(B, V, 3) * 0.1
        cam_pts = np.einsum("bvij,bnj->bvni", extr[..., :3, :3], pts) + extr[..., :3, 3][:, :, None]
        proj = np.einsum("bvij,bvni->bvnj", intr.swapaxes(-1, -2), cam_pts)
        kp2d = proj[..., :2] / proj[..., 2:]

        got = np.asarray(
            triangulate_dlt(
                jnp.asarray(kp2d, dtype=jnp.float32),
                jnp.asarray(intr, dtype=jnp.float32),
                jnp.asarray(extr, dtype=jnp.float32),
            )
        )
        np.testing.assert_allclose(got, pts, atol=2e-3)

    def test_dlt_masked_equals_dropped(self):
        B, V, J = 1, 6, 21
        pts = rng.randn(B, J, 3).astype(np.float64) * 0.1
        pts[..., 2] += 0.6
        intr = np.zeros((B, V, 3, 3))
        intr[..., 0, 0] = intr[..., 1, 1] = 600.0
        intr[..., 0, 2] = intr[..., 1, 2] = 128.0
        intr[..., 2, 2] = 1.0
        extr = np.tile(np.eye(4), (B, V, 1, 1))
        extr[..., :3, :3] = R.from_rotvec(rng.randn(B * V, 3) * 0.2).as_matrix().reshape(B, V, 3, 3)
        extr[..., :3, 3] = rng.randn(B, V, 3) * 0.1
        cam_pts = np.einsum("bvij,bnj->bvni", extr[..., :3, :3], pts) + extr[..., :3, 3][:, :, None]
        proj = np.einsum("bvni,bvji->bvnj", cam_pts, intr)
        kp2d = (proj[..., :2] / proj[..., 2:]) + rng.randn(B, V, J, 2) * 0.5  # noisy

        mask = np.array([[True, True, True, True, False, False]])
        got_masked = np.asarray(
            triangulate_dlt(
                jnp.asarray(kp2d, dtype=jnp.float32),
                jnp.asarray(intr, dtype=jnp.float32),
                jnp.asarray(extr, dtype=jnp.float32),
                view_mask=jnp.asarray(mask),
            )
        )
        got_dropped = np.asarray(
            triangulate_dlt(
                jnp.asarray(kp2d[:, :4], dtype=jnp.float32),
                jnp.asarray(intr[:, :4], dtype=jnp.float32),
                jnp.asarray(extr[:, :4], dtype=jnp.float32),
            )
        )
        np.testing.assert_allclose(got_masked, got_dropped, atol=1e-3)


class TestProcrustes:
    def test_matches_scipy(self):
        gt = rng.randn(4, 21, 3)
        rot = R.random(4, random_state=3).as_matrix()
        pred = np.einsum("bij,bnj->bni", rot, gt * 1.3) + rng.randn(4, 1, 3)
        pred += rng.randn(*pred.shape) * 0.01

        got = np.asarray(align_w_scale(jnp.asarray(gt, dtype=jnp.float32), jnp.asarray(pred, dtype=jnp.float32)))

        for i in range(4):
            t1, t2 = gt[i].mean(0), pred[i].mean(0)
            x1, x2 = gt[i] - t1, pred[i] - t2
            s1 = np.linalg.norm(x1) + 1e-8
            s2 = np.linalg.norm(x2) + 1e-8
            x1, x2 = x1 / s1, x2 / s2
            rr, ss = orthogonal_procrustes(x1, x2)
            want = (x2 @ rr.T) * ss * s1 + t1
            np.testing.assert_allclose(got[i], want, atol=1e-4)


class TestHeatmap:
    def test_integral_recovers_peak(self):
        uv = jnp.asarray(rng.rand(2, 21, 2) * 0.6 + 0.2, dtype=jnp.float32)
        hm = gaussian_heatmap2d(uv, hm_size=32, sigma=2.0)
        hm = normalize_heatmap(hm)
        rec = integral_heatmap2d(hm)
        # integral over [0,1) grid centers introduces a half-pixel offset
        np.testing.assert_allclose(np.asarray(rec), np.asarray(uv), atol=0.02)

    def test_normalize_sums_to_one(self):
        hm = jnp.asarray(rng.rand(2, 21, 32, 32), dtype=jnp.float32)
        out = np.asarray(normalize_heatmap(hm))
        np.testing.assert_allclose(out.sum((-1, -2)), np.ones((2, 21)), atol=1e-3)


class TestWorldProjection:
    def test_project_world_to_pixel_matches_manual(self):
        B, V, N = 2, 3, 50
        pts = rng.randn(B, N, 3).astype(np.float32) * 0.1
        pts[..., 2] += 0.6
        intr = np.zeros((B, V, 3, 3), dtype=np.float32)
        intr[..., 0, 0] = intr[..., 1, 1] = 600.0
        intr[..., 0, 2] = intr[..., 1, 2] = 128.0
        intr[..., 2, 2] = 1.0
        extr_c2m = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
        extr_c2m[..., :3, :3] = (
            R.from_rotvec(rng.randn(B * V, 3) * 0.1).as_matrix().reshape(B, V, 3, 3)
        )
        extr_c2m[..., :3, 3] = rng.randn(B, V, 3).astype(np.float32) * 0.05

        got = np.asarray(
            project_world_to_pixel(jnp.asarray(pts), jnp.asarray(extr_c2m), jnp.asarray(intr))
        )
        m2c = np.linalg.inv(extr_c2m)
        cam_pts = np.einsum("bvij,bnj->bvni", m2c[..., :3, :3], pts) + m2c[..., :3, 3][:, :, None]
        proj = np.einsum("bvni,bvji->bvnj", cam_pts, intr)
        want = proj[..., :2] / proj[..., 2:]
        np.testing.assert_allclose(got, want, atol=1e-2)


class TestJacobiEigh4x4:
    def test_matches_lapack_eigh(self):
        from poem_v2_tpu.geometry.triangulation import jacobi_eigh_4x4

        rng = np.random.RandomState(11)
        m = rng.randn(500, 6, 4).astype(np.float32)
        m[250:, :, 3] *= 1e-3  # ill-conditioned normal matrices
        ata = np.einsum("brk,brl->bkl", m, m)
        w_ref, v_ref = np.linalg.eigh(ata)

        w, v = jax.jit(jacobi_eigh_4x4)(jnp.asarray(ata))
        w = np.asarray(w)
        v = np.asarray(v)
        order = np.argsort(w, axis=-1)
        w_sorted = np.take_along_axis(w, order, -1)
        np.testing.assert_allclose(
            w_sorted, w_ref, atol=1e-4 * np.abs(w_ref).max(), rtol=1e-5
        )
        # smallest eigenvector matches up to sign (the DLT consumer)
        sel = np.argmin(w, -1)
        x = v[np.arange(len(v)), :, sel]
        cos = np.abs(np.sum(x * v_ref[..., :, 0], -1))
        assert cos.min() > 1.0 - 1e-5
