"""Offline MANO fitting: recover a known pose from projected keypoints."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from poem_v2_tpu.fit import OneFrameFit
from poem_v2_tpu.mano import ManoLayer, synthetic_mano

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


def test_fit_recovers_projected_joints():
    mano = ManoLayer(model=synthetic_mano())
    rs = np.random.RandomState(0)
    pose = rs.randn(1, 48).astype(np.float32) * 0.15
    betas = rs.randn(1, 10).astype(np.float32) * 0.2
    out = mano(jnp.asarray(pose), jnp.asarray(betas))
    tsl = np.array([[0.02, -0.01, 0.55]], dtype=np.float32)
    joints = np.asarray(out.joints) + tsl[:, None]

    # two cameras: identity + slightly rotated
    from scipy.spatial.transform import Rotation as R

    V = 3
    extr = np.tile(np.eye(4, dtype=np.float32), (1, V, 1, 1))
    extr[0, 1, :3, :3] = R.from_rotvec([0, 0.4, 0]).as_matrix()
    extr[0, 1, :3, 3] = [0.25, 0, 0.05]
    extr[0, 2, :3, :3] = R.from_rotvec([0.3, -0.2, 0]).as_matrix()
    extr[0, 2, :3, 3] = [-0.18, 0.1, 0.02]
    intr = np.zeros((1, V, 3, 3), dtype=np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 500.0
    intr[..., 0, 2] = intr[..., 1, 2] = 128.0
    intr[..., 2, 2] = 1.0

    m2c = np.linalg.inv(extr)
    j_cam = np.einsum("bvij,bnj->bvni", m2c[..., :3, :3], joints) + m2c[..., :3, 3][:, :, None]
    proj = np.einsum("bvni,bvji->bvnj", j_cam, intr)
    target_2d = proj[..., :2] / proj[..., 2:]

    fitter = OneFrameFit(mano_layer=mano, steps=400, lr=5e-2, w_joint3d=1.0)
    result = fitter.fit(
        jnp.asarray(target_2d),
        jnp.asarray(intr),
        jnp.asarray(extr),
        target_joints_3d=jnp.asarray(joints),
    )
    final_err = np.linalg.norm(np.asarray(result.joints) - joints, axis=-1).mean()
    # loss must drop substantially and joints land within ~1.5 cm
    losses = np.asarray(result.losses)
    assert losses[-1] < losses[0] * 0.1
    assert final_err < 0.015, f"fit error {final_err}"


class TestSoftRaster:
    def test_silhouette_renders_inside_outside(self):
        from poem_v2_tpu.fit.soft_raster import soft_silhouette

        # one big triangle covering the lower-left half of a 32x32 raster
        verts = jnp.array([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
        faces = jnp.array([[0, 1, 2]], dtype=jnp.int32)
        img = soft_silhouette(verts, faces, size=32, sigma=0.5)
        assert img.shape == (32, 32)
        assert float(img[8, 8]) > 0.9       # deep inside
        assert float(img[30, 30]) < 0.1     # far outside
        assert np.isfinite(np.asarray(img)).all()

    def test_silhouette_gradients_flow(self):
        from poem_v2_tpu.fit.soft_raster import soft_silhouette

        faces = jnp.array([[0, 1, 2]], dtype=jnp.int32)
        target = jnp.zeros((16, 16))

        def loss(verts):
            return jnp.mean((soft_silhouette(verts, faces, size=16, sigma=2.0) - target) ** 2)

        g = jax.grad(loss)(jnp.array([[2.0, 2.0], [14.0, 2.0], [2.0, 14.0]]))
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0

    def test_silhouette_fit_improves_mask_overlap(self):
        from poem_v2_tpu.fit import OneFrameFitSilh
        from poem_v2_tpu.fit.soft_raster import multiview_silhouette_loss, project_to_raster, soft_silhouette
        from poem_v2_tpu.mano import ManoLayer

        mano = ManoLayer()
        rng = jax.random.PRNGKey(0)
        gt_pose = jax.random.normal(rng, (1, 48)) * 0.1
        gt_shape = jnp.zeros((1, 10))
        out = mano(gt_pose, gt_shape)
        tsl = jnp.array([[0.0, 0.0, 0.4]])
        gt_verts, gt_joints = out.verts + tsl[:, None], out.joints + tsl[:, None]

        B, V, S = 1, 2, 24
        intr = jnp.tile(jnp.array([[[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]]]), (B, V, 1, 1))
        extr = jnp.tile(jnp.eye(4)[None, None], (B, V, 1, 1))
        view_mask = jnp.ones((B, V), bool)
        faces = jnp.asarray(np.asarray(mano.faces), dtype=jnp.int32)
        v_px = project_to_raster(gt_verts, intr, extr, 64, S)
        masks = jax.vmap(jax.vmap(lambda v: soft_silhouette(v, faces, size=S, sigma=1.0)))(v_px)

        from poem_v2_tpu.geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid
        j2d = cam_intr_projection(intr, cam_extr_transf(invert_rigid(extr), gt_joints[:, None])) * (1.0)

        fitter = OneFrameFitSilh(mano, steps=30, lr=2e-2, img_size=64, w_silh=1.0, sigma=1.0)
        res = fitter.fit(j2d, intr, extr, view_mask, masks=masks,
                         target_joints_3d=gt_joints)
        silh_after = multiview_silhouette_loss(intr, extr, res.verts, masks, faces,
                                               view_mask=view_mask, img_size=64)
        silh_init = multiview_silhouette_loss(
            intr, extr, jnp.zeros_like(res.verts) + jnp.array([0.0, 0.0, 0.4]), masks, faces,
            view_mask=view_mask, img_size=64)
        assert np.isfinite(float(silh_after))
        assert float(silh_after) < float(silh_init)
        assert float(res.losses[-1]) < float(res.losses[0])


def test_multiview_silhouette_loss_masks_padded_views():
    from poem_v2_tpu.fit.soft_raster import multiview_silhouette_loss
    from poem_v2_tpu.mano import ManoLayer

    mano = ManoLayer()
    faces = jnp.asarray(np.asarray(mano.faces), dtype=jnp.int32)
    verts = jnp.zeros((1, 778, 3)) + jnp.array([0.0, 0.0, 0.4])
    intr = jnp.tile(jnp.array([[[60.0, 0, 8], [0, 60.0, 8], [0, 0, 1]]]), (1, 2, 1, 1))
    extr = jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1))
    masks = jnp.zeros((1, 2, 16, 16))
    # garbage in the masked view must not change the loss
    vm = jnp.array([[True, False]])
    l1 = multiview_silhouette_loss(intr, extr, verts, masks, faces, view_mask=vm, img_size=16)
    masks2 = masks.at[:, 1].set(1.0)
    l2 = multiview_silhouette_loss(intr, extr, verts, masks2, faces, view_mask=vm, img_size=16)
    assert float(jnp.abs(l1 - l2)) < 1e-7


# --------------------------------------------------------------------------
# axis-aware anatomical losses (fit/hand_loss.py)
# --------------------------------------------------------------------------
class TestHandLoss:
    def test_hand_axes_orthonormal(self):
        import jax.numpy as jnp
        from poem_v2_tpu.fit.hand_loss import hand_axes
        from poem_v2_tpu.mano import ManoLayer

        rs = np.random.RandomState(0)
        pose = jnp.asarray(rs.randn(2, 48).astype(np.float32) * 0.2)
        out = ManoLayer()(pose, jnp.zeros((2, 10)))
        b, u, l = hand_axes(out.joints, out.transforms)
        for a in (b, u, l):
            np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)
        # orthogonal frame
        assert float(jnp.abs(jnp.einsum("bki,bki->bk", b, u)).max()) < 1e-5
        assert float(jnp.abs(jnp.einsum("bki,bki->bk", l, u)).max()) < 1e-5
        assert float(jnp.abs(jnp.einsum("bki,bki->bk", b, l)).max()) < 1e-5

    def test_flexion_cheap_twist_expensive(self):
        """Rotation about the flexion axis (l) is anatomically fine; the
        same magnitude about the bone (b, twist) must be penalised hard."""
        import jax.numpy as jnp
        from poem_v2_tpu.fit import hand_loss as hl
        from poem_v2_tpu.mano import ManoLayer

        mano = ManoLayer()
        zero = mano(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        b0, u0, l0 = hl.hand_axes(zero.joints, zero.transforms)

        def quat_for(axis_vec, pose_joint, angle=1.0):
            q = np.zeros((1, 16, 4), np.float32)
            q[..., 0] = 1.0
            ax = np.asarray(axis_vec[0, pose_joint])
            q[0, pose_joint + 1, 0] = np.cos(angle / 2)
            q[0, pose_joint + 1, 1:] = np.sin(angle / 2) * ax
            return jnp.asarray(q)

        def anat_of(quat):
            # re-pose MANO so the axes match the pose under evaluation
            from poem_v2_tpu.geometry.rotations import quat_to_aa

            pose_aa = quat_to_aa(quat).reshape(1, 48)
            out = mano(pose_aa, jnp.zeros((1, 10)))
            return float(
                hl.anatomical_loss(quat, quat, jnp.zeros((1, 10)), out.joints, out.transforms)
            )

        # index MCP = pose joint 0 (restricted for twist, soft for splay)
        flexion = anat_of(quat_for(l0, pose_joint=1))  # PIP: fully restricted joint
        twist = anat_of(quat_for(b0, pose_joint=1))
        assert flexion < 0.01, f"flexion should be near-free, got {flexion}"
        assert twist > 10 * max(flexion, 1e-6), f"twist {twist} vs flexion {flexion}"

    def test_handloss_formulas_match_reference(self):
        """Differential vs the reference HandLoss static methods
        (lib/fit/hand_loss.py) run as-is with quaternion-util stubs."""
        torch = pytest.importorskip("torch")
        import importlib.util
        import sys
        import types

        import jax.numpy as jnp
        from poem_v2_tpu.fit import hand_loss as hl

        # manotorch.utils.quatutils stubs (standard (w,x,y,z) quaternion ops)
        def _qnorm2(q):
            return (q * q).sum(-1)

        def _qinv(q):
            conj = q * torch.tensor([1.0, -1.0, -1.0, -1.0])
            return conj / _qnorm2(q).unsqueeze(-1).clamp_min(1e-12)

        def _qmul(q, r):
            w1, x1, y1, z1 = q.unbind(-1)
            w2, x2, y2, z2 = r.unbind(-1)
            return torch.stack([
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ], dim=-1)

        from helpers import restore_stub_modules, snapshot_stub_modules

        saved = snapshot_stub_modules()
        try:
            pkg = types.ModuleType("manotorch"); pkg.__path__ = []
            upkg = types.ModuleType("manotorch.utils"); upkg.__path__ = []
            qu = types.ModuleType("manotorch.utils.quatutils")
            qu._quaternion_norm_squared = _qnorm2
            qu._quaternion_inv = _qinv
            qu._quaternion_mul = _qmul
            sys.modules.update({"manotorch": pkg, "manotorch.utils": upkg,
                                "manotorch.utils.quatutils": qu})
            spec = importlib.util.spec_from_file_location(
                "ref_hand_loss", "/root/reference/lib/fit/hand_loss.py")
            ref = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref)

            rs = np.random.RandomState(5)
            q16 = rs.randn(2, 16, 4).astype(np.float32)
            qn = q16 / np.linalg.norm(q16, axis=-1, keepdims=True)
            shape = rs.randn(2, 10).astype(np.float32)
            axes = rs.randn(3, 2, 15, 3).astype(np.float32)
            axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
            axis = rs.randn(2, 15, 3).astype(np.float32)
            axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
            angle = np.abs(rs.randn(2, 15)).astype(np.float32) * 1.5
            mask = (angle >= 1e-2).astype(np.float32)

            t = torch.from_numpy
            pairs = [
                (hl.pose_quat_norm_loss(jnp.asarray(q16)),
                 ref.HandLoss.pose_quat_norm_loss(t(q16))),
                (hl.pose_reg_loss(jnp.asarray(qn[:, 1:]), jnp.asarray(qn[:, 1:]) * 0 + jnp.asarray([1.0, 0, 0, 0])),
                 ref.HandLoss.pose_reg_loss(t(qn[:, 1:]), t(np.tile(np.array([1., 0, 0, 0], np.float32), (2, 15, 1))))),
                (hl.shape_reg_loss(jnp.asarray(shape), jnp.zeros((2, 10))),
                 ref.HandLoss.shape_reg_loss(t(shape), torch.zeros(2, 10))),
                (hl.joint_b_axis_loss(jnp.asarray(axes[0]), jnp.asarray(axis), jnp.asarray(mask)),
                 ref.HandLoss.joint_b_axis_loss(t(axes[0]), t(axis), t(mask))),
                (hl.joint_u_axis_loss(jnp.asarray(axes[1]), jnp.asarray(axis), jnp.asarray(mask)),
                 ref.HandLoss.joint_u_axis_loss(t(axes[1]), t(axis), t(mask))),
                (hl.joint_l_limit_loss(jnp.asarray(axes[2]), jnp.asarray(axis), jnp.asarray(mask)),
                 ref.HandLoss.joint_l_limit_loss(t(axes[2]), t(axis), t(mask))),
                (hl.rotation_angle_loss(jnp.asarray(angle)),
                 ref.HandLoss.rotation_angle_loss(t(angle))),
            ]
            for i, (ours, theirs) in enumerate(pairs):
                np.testing.assert_allclose(
                    float(ours), float(theirs), rtol=1e-5, atol=1e-7,
                    err_msg=f"HandLoss formula {i} diverged")
        finally:
            restore_stub_modules(saved)
