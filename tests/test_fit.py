"""Offline MANO fitting: recover a known pose from projected keypoints."""

import numpy as np
import jax
import jax.numpy as jnp

from poem_v2_tpu.fit import OneFrameFit
from poem_v2_tpu.mano import ManoLayer, synthetic_mano


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
