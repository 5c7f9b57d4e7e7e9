"""MANO layer tests: LBS invariants that must hold for any valid rig."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from poem_v2_tpu.mano import ManoLayer, synthetic_mano


def make_layer(**kw):
    return ManoLayer(model=synthetic_mano(), **kw)


class TestManoLayer:
    def test_zero_pose_is_template(self):
        layer = make_layer()
        pose = jnp.zeros((2, 48))
        betas = jnp.zeros((2, 10))
        out = layer(pose, betas)
        np.testing.assert_allclose(
            np.asarray(out.verts[0]), layer.model.v_template, atol=1e-5
        )
        assert out.joints.shape == (2, 21, 3)
        assert out.verts.shape == (2, 778, 3)

    def test_shape_blend(self):
        layer = make_layer()
        betas = jnp.asarray(np.random.RandomState(0).randn(1, 10), dtype=jnp.float32)
        out = layer(jnp.zeros((1, 48)), betas)
        want = layer.model.v_template + np.einsum(
            "vcs,s->vc", layer.model.shapedirs, np.asarray(betas[0])
        )
        np.testing.assert_allclose(np.asarray(out.verts[0]), want, atol=1e-5)

    def test_global_rotation_is_rigid(self):
        layer = make_layer()
        aa = np.zeros((1, 48), dtype=np.float32)
        aa[0, :3] = [0.3, -0.5, 0.2]
        out_rot = layer(jnp.asarray(aa), jnp.zeros((1, 10)))
        out_id = layer(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        rot = R.from_rotvec(aa[0, :3]).as_matrix()
        root = np.asarray(out_id.joints[0, 0])  # wrist (OpenPose id 0 = MANO joint 0)
        want = (np.asarray(out_id.verts[0]) - root) @ rot.T + root
        np.testing.assert_allclose(np.asarray(out_rot.verts[0]), want, atol=1e-4)

    def test_finger_rotation_moves_only_descendants(self):
        layer = make_layer()
        aa = np.zeros((1, 48), dtype=np.float32)
        # bend index finger middle joint (MANO joint 2 -> pose index 2)
        aa[0, 2 * 3 : 2 * 3 + 3] = [1.0, 0.0, 0.0]
        out = layer(jnp.asarray(aa), jnp.zeros((1, 10)))
        base = layer(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        moved = np.linalg.norm(np.asarray(out.verts[0] - base.verts[0]), axis=1)
        w = layer.model.lbs_weights
        descendants = w[:, [2, 3]].sum(1)  # joints 2,3 influence
        # vertices fully driven by untouched joints move only via pose blendshapes
        untouched = descendants < 1e-6
        assert moved[untouched].max() < 0.02
        assert moved[~untouched].max() > 0.005

    def test_center_idx(self):
        layer = make_layer(center_idx=9)
        out = layer(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        np.testing.assert_allclose(np.asarray(out.joints[0, 9]), np.zeros(3), atol=1e-6)

    def test_jit_and_grad(self):
        layer = make_layer()

        @jax.jit
        def loss(pose, betas):
            out = layer(pose, betas)
            return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

        g = jax.grad(loss)(jnp.ones((1, 48)) * 0.1, jnp.zeros((1, 10)))
        assert np.isfinite(np.asarray(g)).all()

    def test_tips_are_vertices(self):
        layer = make_layer()
        out = layer(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        # OpenPose id 4 (thumb tip) == vertex 744
        np.testing.assert_allclose(
            np.asarray(out.joints[0, 4]), np.asarray(out.verts[0, 744]), atol=1e-6
        )
