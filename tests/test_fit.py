"""Offline MANO fitting: recover a known pose from projected keypoints."""

import numpy as np
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
