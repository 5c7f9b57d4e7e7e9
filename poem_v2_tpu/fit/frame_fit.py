"""Optimization-based MANO fitting to multi-view keypoints.

Capability parity with the reference offline fitter ``OneFrameFit``
(lib/fit/frame_fit/one_frame_fit.py:14-335): gradient descent over
(quaternion pose 16x4, shape 10, translation 3) minimising multi-view
2D reprojection error plus anatomical regularisers (reference
lib/fit/hand_loss.py:10-141), with a plateau-decayed Adam.

TPU-native re-design: the whole optimisation is one ``lax.scan`` inside
jit — and it is batched over frames, so a dataset's worth of frames fits
in a single device program instead of the reference's per-frame Python
loop.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..geometry.camera import cam_extr_transf, cam_intr_projection, invert_rigid
from ..geometry.rotations import quat_to_aa
from ..mano import ManoLayer


class FitParams(NamedTuple):
    quat: jnp.ndarray  # (B, 16, 4)
    shape: jnp.ndarray  # (B, 10)
    tsl: jnp.ndarray  # (B, 3)


class FitResult(NamedTuple):
    params: FitParams
    pose_aa: jnp.ndarray  # (B, 48)
    verts: jnp.ndarray  # (B, 778, 3)
    joints: jnp.ndarray  # (B, 21, 3)
    losses: jnp.ndarray  # (steps,)


def _init_params(batch: int) -> FitParams:
    quat = jnp.zeros((batch, 16, 4)).at[..., 0].set(1.0)
    return FitParams(quat=quat, shape=jnp.zeros((batch, 10)), tsl=jnp.zeros((batch, 3)))


def anatomical_loss(pose_aa: jnp.ndarray) -> jnp.ndarray:
    """Cheap axis-angle penalty (kept for callers without MANO outputs).

    The fitter itself uses the faithful axis-aware stack in
    :mod:`poem_v2_tpu.fit.hand_loss` (reference hand_loss.py:10-141).
    """
    finger = pose_aa.reshape(pose_aa.shape[0], 16, 3)[:, 1:]  # (B, 15, 3)
    # splay (y-axis) and twist (x-axis) should stay small; flexion (z) free-ish
    twist = finger[..., 0]
    splay = finger[..., 1]
    over_flex = jnp.maximum(jnp.abs(finger[..., 2]) - 2.0, 0.0)
    return jnp.mean(twist**2) + jnp.mean(splay**2) * 0.5 + jnp.mean(over_flex**2)


class OneFrameFit:
    """Batched multi-view MANO fitting."""

    def __init__(
        self,
        mano_layer: Optional[ManoLayer] = None,
        lr: float = 1e-2,
        steps: int = 300,
        w_reproj: float = 1.0,
        w_anat: float = 1e-3,
        w_shape: float = 1e-3,
        w_joint3d: float = 0.0,
    ):
        self.mano = mano_layer if mano_layer is not None else ManoLayer()
        self.lr = lr
        self.steps = steps
        self.w = dict(reproj=w_reproj, anat=w_anat, shape=w_shape, joint3d=w_joint3d)

    def _forward(self, params: FitParams):
        quat = params.quat / jnp.linalg.norm(params.quat, axis=-1, keepdims=True).clip(1e-8)
        pose_aa = quat_to_aa(quat).reshape(quat.shape[0], 48)
        out = self.mano(pose_aa, params.shape)
        verts = out.verts + params.tsl[:, None]
        joints = out.joints + params.tsl[:, None]
        return pose_aa, verts, joints

    def loss(
        self,
        params: FitParams,
        target_2d: jnp.ndarray,  # (B, V, 21, 2)
        cam_intr: jnp.ndarray,  # (B, V, 3, 3)
        cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->world
        view_mask: jnp.ndarray,  # (B, V)
        target_joints_3d: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        quat_normed = params.quat / jnp.linalg.norm(
            params.quat, axis=-1, keepdims=True
        ).clip(1e-8)
        pose_aa = quat_to_aa(quat_normed).reshape(quat_normed.shape[0], 48)
        out = self.mano(pose_aa, params.shape)
        verts = out.verts + params.tsl[:, None]
        joints = out.joints + params.tsl[:, None]

        extr_m2c = invert_rigid(cam_extr)
        j_cam = cam_extr_transf(extr_m2c, joints[:, None])
        j2d = cam_intr_projection(cam_intr, j_cam)  # (B, V, 21, 2)
        err = jnp.sum((j2d - target_2d) ** 2, axis=-1)  # (B, V, 21)
        mask = view_mask[..., None].astype(err.dtype)
        reproj = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * 21, 1.0)

        # axis-aware anatomical stack (reference one_frame_fit.py:180-236);
        # the axis frames come from the UN-translated MANO output — they
        # only consume joint differences and local rotations
        from .hand_loss import anatomical_loss as axis_anatomical_loss

        anat = axis_anatomical_loss(
            params.quat, quat_normed, params.shape, out.joints, out.transforms
        )

        total = self.w["reproj"] * reproj
        total = total + self.w["anat"] * anat
        total = total + self.w["shape"] * jnp.mean(params.shape**2)
        if target_joints_3d is not None and self.w["joint3d"]:
            total = total + self.w["joint3d"] * jnp.mean((joints - target_joints_3d) ** 2)
        return total

    def fit(
        self,
        target_2d: jnp.ndarray,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        view_mask: Optional[jnp.ndarray] = None,
        target_joints_3d: Optional[jnp.ndarray] = None,
        init: Optional[FitParams] = None,
    ) -> FitResult:
        B = target_2d.shape[0]
        if view_mask is None:
            view_mask = jnp.ones(target_2d.shape[:2], dtype=bool)
        params = init if init is not None else _init_params(B)
        # initialise translation from 3D targets if provided
        if target_joints_3d is not None and init is None:
            params = params._replace(tsl=jnp.mean(target_joints_3d, axis=1))

        schedule = optax.exponential_decay(self.lr, self.steps // 3, 0.5, staircase=True)
        tx = optax.adam(schedule)

        def loss_fn(p):
            return self.loss(p, target_2d, cam_intr, cam_extr, view_mask, target_joints_3d)

        @jax.jit
        def run(params):
            opt_state = tx.init(params)

            def step(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=self.steps)
            return params, losses

        params, losses = run(params)
        pose_aa, verts, joints = self._forward(params)
        return FitResult(params=params, pose_aa=pose_aa, verts=verts, joints=joints, losses=losses)
