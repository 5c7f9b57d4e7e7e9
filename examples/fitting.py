"""Offline MANO fitting quickstart: recover pose/shape/translation from
multi-view 2D keypoints (+ optional silhouettes).

Run: python examples/fitting.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from poem_v2_tpu.fit import OneFrameFit, OneFrameFitSilh  # noqa: F401
from poem_v2_tpu.geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid
from poem_v2_tpu.mano import ManoLayer


def main():
    mano = ManoLayer()
    rng = jax.random.PRNGKey(0)
    gt_pose = jax.random.normal(rng, (1, 48)) * 0.15
    out = mano(gt_pose, jnp.zeros((1, 10)))
    tsl = jnp.array([[0.0, 0.0, 0.5]])
    gt_joints = out.joints + tsl[:, None]

    # two cameras with a 30-degree baseline (distinct rays constrain depth)
    B, V = 1, 2
    intr = jnp.tile(jnp.array([[[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]]]), (B, V, 1, 1))
    c, s_ = np.cos(np.pi / 6), np.sin(np.pi / 6)
    cam2 = np.eye(4)
    cam2[:3, :3] = [[c, 0, s_], [0, 1, 0], [-s_, 0, c]]
    cam2[:3, 3] = [-0.25, 0.0, 0.07]
    extr = jnp.asarray(np.stack([np.eye(4), cam2])[None])
    target_2d = cam_intr_projection(intr, cam_extr_transf(invert_rigid(extr), gt_joints[:, None]))

    fitter = OneFrameFit(mano, steps=200, lr=1e-2)
    res = fitter.fit(target_2d, intr, extr, target_joints_3d=gt_joints)
    err = float(jnp.abs(res.joints - gt_joints).mean()) * 1000
    print(f"fit done: loss {float(res.losses[-1]):.5f}, mean joint err {err:.2f} mm")


if __name__ == "__main__":
    main()
