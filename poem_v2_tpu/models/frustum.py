"""Camera-frustum 3D position embedding (PETR-style).

Masked-batch equivalent of the reference ``position_embeding``
(lib/models/heads/ptEmb_head.py:114-186): discretise each view's
frustum into W x H x D points (linear or LID depth bins over
[depth_start, depth_end]), lift through K^-1, transform to master space
with the camera extrinsics, normalise by the position range, and feed
``inverse_sigmoid`` logits to a small conv encoder.

Used by the optional PETR_EMBEDDING path of the POEM head and by the
PETR/MVP baselines.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.camera import inverse_sigmoid


def frustum_points(
    cam_intr: jnp.ndarray,  # (B, V, 3, 3)
    cam_extr: jnp.ndarray,  # (B, V, 4, 4) camera->master
    feat_hw: Tuple[int, int],
    inp_hw: Tuple[int, int],
    depth_num: int = 32,
    depth_start: float = 0.0,
    depth_end: float = 1.2,
    lid: bool = False,
) -> jnp.ndarray:
    """Frustum sample points in master space: (B, V, W, H, D, 3)."""
    H, W = feat_hw
    inp_h, inp_w = inp_hw
    dtype = jnp.float32

    coords_h = jnp.arange(H, dtype=dtype) * inp_h / H
    coords_w = jnp.arange(W, dtype=dtype) * inp_w / W
    index = jnp.arange(depth_num, dtype=dtype)
    if lid:
        bin_size = (depth_end - depth_start) / (depth_num * (1 + depth_num))
        coords_d = depth_start + bin_size * index * (index + 1)
    else:
        bin_size = (depth_end - depth_start) / depth_num
        coords_d = depth_start + bin_size * index

    # (W, H, D)
    u = coords_w[:, None, None]
    v = coords_h[None, :, None]
    d = coords_d[None, None, :]

    fx = cam_intr[..., 0, 0][..., None, None, None]
    fy = cam_intr[..., 1, 1][..., None, None, None]
    cx = cam_intr[..., 0, 2][..., None, None, None]
    cy = cam_intr[..., 1, 2][..., None, None, None]

    B, V = cam_intr.shape[:2]
    full = (B, V, W, H, depth_num)
    x = jnp.broadcast_to((u - cx) / fx * d, full)
    y = jnp.broadcast_to((v - cy) / fy * d, full)
    z = jnp.broadcast_to(d, full)

    xyz = jnp.stack([x, y, z], axis=-1)  # (B, V, W, H, D, 3)
    rot = cam_extr[..., :3, :3]
    t = cam_extr[..., :3, 3]
    return (
        jnp.einsum("bvij,bvwhdj->bvwhdi", rot, xyz, precision="highest")
        + t[:, :, None, None, None, :]
    )


class FrustumPositionEncoder(nn.Module):
    """inverse_sigmoid(normalised frustum) -> conv encoder -> embed_dims.

    ``hidden_mult`` matches the reference encoder widths: the POEM head's
    ``position_encoder`` hides at ``embed_dims * 2``
    (lib/models/heads/ptEmb_head.py:102-106) while the PETR head's hides
    at ``embed_dims * 4`` (lib/models/heads/petr_head.py:83-87).
    """

    embed_dims: int = 256
    depth_num: int = 32
    depth_start: float = 0.0
    depth_end: float = 1.2
    lid: bool = False
    position_range: Sequence[float] = (-0.6, -0.6, 0.0, 0.6, 0.6, 1.2)
    hidden_mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        cam_intr: jnp.ndarray,
        cam_extr: jnp.ndarray,
        feat_hw: Tuple[int, int],
        inp_hw: Tuple[int, int],
    ):
        """Returns (embedding (B, V, H, W, embed_dims),
        coords3d_abs (B, V, W, H, D, 3), coords_mask)."""
        pts = frustum_points(
            cam_intr, cam_extr, feat_hw, inp_hw,
            self.depth_num, self.depth_start, self.depth_end, self.lid,
        )
        pr = jnp.asarray(self.position_range, dtype=jnp.float32)
        lo, hi = pr[:3], pr[3:]
        norm = (pts - lo) / (hi - lo)
        coords_mask = (norm > 1.0) | (norm < 0.0)

        B, V, W, H, D, _ = norm.shape
        # (B, V, H, W, D*3) channels-last, channel = d*3 + coord — the
        # reference permutes (BN, W, H, D, 3) -> (BN, D, 3, H, W) before
        # flattening (ptEmb_head.py:179, petr_head.py:155), so converted
        # position-encoder conv weights expect DEPTH-major channels
        feat = jnp.transpose(norm, (0, 1, 3, 2, 4, 5)).reshape(B, V, H, W, D * 3)
        feat = inverse_sigmoid(feat)
        x = nn.Conv(
            self.embed_dims * self.hidden_mult, (1, 1), dtype=self.dtype, name="pe_conv1"
        )(feat.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype, name="pe_conv2")(x)
        return x, pts, coords_mask
