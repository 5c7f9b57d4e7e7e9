"""Differentiable MANO layer in pure JAX (linear blend skinning).

Functional equivalent of ``manotorch.manolayer.ManoLayer`` as used by
the reference (axis-angle rot mode, ``use_pca=False``,
``flat_hand_mean=True``, optional ``center_idx``; see
lib/models/POEM.py:117-121 and lib/models/heads/ptEmb_head.py:732-736).

Outputs 778 vertices and 21 joints in OpenPose order (16 LBS joints +
5 fingertip vertices, reordered per lib/utils/transform.py:836-872).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import aa_to_rotmat
from ..utils.misc import CONST
from .model import ManoModel, default_mano


class ManoOutput(NamedTuple):
    verts: jnp.ndarray  # (B, 778, 3)
    joints: jnp.ndarray  # (B, 21, 3), OpenPose order
    transforms: jnp.ndarray  # (B, 16, 4, 4) global joint transforms


class ManoLayer:
    """Stateless callable; all parameters are constants baked into jit."""

    def __init__(
        self,
        model: Optional[ManoModel] = None,
        center_idx: Optional[int] = None,
        flat_hand_mean: bool = True,
        assets_root: Optional[str] = None,
    ):
        self.model = model if model is not None else default_mano(assets_root)
        self.center_idx = center_idx
        self.flat_hand_mean = flat_hand_mean
        m = self.model
        self.v_template = jnp.asarray(m.v_template)
        self.shapedirs = jnp.asarray(m.shapedirs)
        self.posedirs = jnp.asarray(m.posedirs.reshape(m.posedirs.shape[0], 3, -1))
        self.j_regressor = jnp.asarray(m.j_regressor)
        self.lbs_weights = jnp.asarray(m.lbs_weights)
        self.hands_mean = jnp.asarray(m.hands_mean)
        self.parents = np.asarray(m.parents)
        self.faces = m.faces

    @property
    def th_j_regressor(self) -> jnp.ndarray:
        """(16, 778) joint regressor (name mirrors manotorch's attribute)."""
        return self.j_regressor

    def __call__(self, pose_aa: jnp.ndarray, betas: jnp.ndarray) -> ManoOutput:
        """Run LBS.

        Args:
          pose_aa: (B, 48) axis-angle; [:, :3] is the global root rotation.
          betas: (B, 10) shape coefficients.
        """
        B = pose_aa.shape[0]
        pose = pose_aa.reshape(B, 16, 3)
        if not self.flat_hand_mean:
            pose = pose.at[:, 1:].add(self.hands_mean.reshape(15, 3))

        # 1. shape blend
        v_shaped = self.v_template + jnp.einsum(
            "vcs,bs->bvc", self.shapedirs, betas, precision="highest"
        )
        j_rest = jnp.einsum("jv,bvc->bjc", self.j_regressor, v_shaped, precision="highest")

        # 2. pose blend
        rots = aa_to_rotmat(pose)  # (B, 16, 3, 3)
        pose_feat = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(B, -1)  # (B, 135)
        v_posed = v_shaped + jnp.einsum(
            "vcp,bp->bvc", self.posedirs, pose_feat, precision="highest"
        )

        # 3. forward kinematics along the (static) tree
        transforms = self._global_transforms(rots, j_rest)

        # 4. skinning: remove rest-pose joint locations
        j_rest_h = jnp.concatenate([j_rest, jnp.zeros((B, 16, 1), dtype=j_rest.dtype)], -1)
        correction = jnp.einsum(
            "bjik,bjk->bji", transforms, j_rest_h, precision="highest"
        )  # (B, 16, 4)
        rel = transforms.at[..., :, 3].add(-correction) if False else (
            transforms - jnp.concatenate(
                [jnp.zeros_like(transforms[..., :3]), correction[..., None]], axis=-1
            )
        )
        vert_t = jnp.einsum("vj,bjik->bvik", self.lbs_weights, rel, precision="highest")
        v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)], -1)
        verts = jnp.einsum("bvik,bvk->bvi", vert_t, v_h, precision="highest")[..., :3]

        joints16 = transforms[..., :3, 3]
        joints21 = self._append_tips_openpose(joints16, verts)

        if self.center_idx is not None:
            centre = joints21[:, self.center_idx : self.center_idx + 1]
            verts = verts - centre
            joints21 = joints21 - centre
        return ManoOutput(verts=verts, joints=joints21, transforms=transforms)

    def _global_transforms(self, rots: jnp.ndarray, j_rest: jnp.ndarray) -> jnp.ndarray:
        """Compose per-joint local rotations into global 4x4 transforms.

        The 16-joint tree is static and tiny, so an unrolled Python loop
        (16 iterations, traced once) beats a scan on TPU.
        """
        B = rots.shape[0]

        def make_tf(rot, t):
            top = jnp.concatenate([rot, t[..., None]], axis=-1)  # (B, 3, 4)
            bottom = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), (B, 1, 4)
            )
            return jnp.concatenate([top, bottom], axis=-2)

        results = [make_tf(rots[:, 0], j_rest[:, 0])]
        for j in range(1, 16):
            p = int(self.parents[j])
            local = make_tf(rots[:, j], j_rest[:, j] - j_rest[:, p])
            results.append(
                jnp.einsum("bik,bkj->bij", results[p], local, precision="highest")
            )
        return jnp.stack(results, axis=1)  # (B, 16, 4, 4)

    def _append_tips_openpose(self, joints16: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
        tips_idx = jnp.asarray(
            [v[0] for _, v in sorted(CONST.MANO_KPID_2_VERTICES.items())], dtype=jnp.int32
        )
        tips = verts[:, tips_idx]
        joints21 = jnp.concatenate([joints16, tips], axis=1)
        return joints21[:, jnp.asarray(CONST.MANO_TO_OPENPOSE, dtype=jnp.int32)]
