"""Baseline models + v1 heads: forward shapes and finiteness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_batch
from poem_v2_tpu.utils.config import Config


def petr_cfg():
    return Config(
        {
            "TYPE": "PETRMultiView",
            "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
            "HEAD": {
                "TYPE": "PETRHead",
                "EMBED_DIMS": 64,
                "IN_CHANNELS": 256,
                "NUM_QUERY": 799,
                "NUM_PREDS": 2,
                "NUM_REG_FCS": 2,
                "DEPTH_NUM": 8,
                "DEPTH_START": 0.0,
                "DEPTH_END": 1.2,
                "LID": False,
                "POSITION_RANGE": [-0.6, -0.6, 0.0, 0.6, 0.6, 1.2],
                "POSITIONAL_ENCODING": {"NUM_FEATS": 32, "NORMALIZE": True},
            },
            "DATA_PRESET": {"CENTER_IDX": 0, "NUM_JOINTS": 21},
        }
    )


class TestPETR:
    def test_forward(self):
        from poem_v2_tpu.models.petr import create_petr_model

        model, aux = create_petr_model(petr_cfg())
        batch = tiny_batch(batch_size=2, view_max=3, image_size=64)
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            batch["image"], batch["view_mask"], batch["cam_intr"], batch["cam_extr"],
        )
        preds = model.apply(
            variables,
            batch["image"], batch["view_mask"], batch["cam_intr"], batch["cam_extr"],
        )
        assert preds["all_coords_preds"].shape == (2, 2, 799, 3)
        assert np.isfinite(np.asarray(preds["pred_verts_3d"])).all()
        # coords must live inside the position range
        coords = np.asarray(preds["all_coords_preds"])
        assert coords[..., 2].min() >= 0.0 and coords[..., 2].max() <= 1.2


class TestV1Heads:
    def _common(self):
        rng = jax.random.PRNGKey(0)
        B, V, H, W = 2, 3, 8, 8
        feat = jax.random.normal(rng, (B, V, H, W, 32))
        vm = jnp.asarray([[True, True, True], [True, True, False]])
        intr = jnp.broadcast_to(
            jnp.asarray([[200.0, 0, 32], [0, 200.0, 32], [0, 0, 1]]), (B, V, 3, 3)
        )
        extr = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
        ref = jax.random.normal(rng, (B, 799, 3)) * 0.05 + jnp.asarray([0, 0, 0.6])
        template = np.random.RandomState(0).randn(799, 3).astype(np.float32) * 0.05
        return rng, feat, vm, intr, extr, ref, template

    def test_ptemb_head(self):
        from poem_v2_tpu.models.heads.v1_heads import POEMPositionEmbeddedAggregationHead

        rng, feat, vm, intr, extr, ref, template = self._common()
        head = POEMPositionEmbeddedAggregationHead(
            embed_dims=64, pt_feat_dim=64, in_channels=32, nsample=128,
            depth_num=8, pe_num_feats=16, n_blocks=2, n_neighbor=8, n_neighbor_query=8,
            radius=1.0,
        )
        variables = head.init(rng, feat, vm, intr, extr, ref, jnp.asarray(template), (64, 64))
        out = head.apply(variables, feat, vm, intr, extr, ref, jnp.asarray(template), (64, 64))
        assert out["all_coords_preds"].shape == (2, 2, 799, 3)
        assert np.isfinite(np.asarray(out["all_coords_preds"])).all()

    def test_proj_selfagg_head(self):
        from poem_v2_tpu.models.heads.v1_heads import POEMProjectiveSelfAggregationHead

        rng, feat, vm, intr, extr, ref, template = self._common()
        head = POEMProjectiveSelfAggregationHead(
            embed_dims=64, pt_feat_dim=64, in_channels=32, nsample=128,
            depth_num=8, pe_num_feats=16, n_blocks=2, n_neighbor=8, n_neighbor_query=8,
            radius=1.0, merge_mode="attn", query_type="KPT",
        )
        variables = head.init(rng, feat, vm, intr, extr, ref, jnp.asarray(template), (64, 64))
        out = head.apply(variables, feat, vm, intr, extr, ref, jnp.asarray(template), (64, 64))
        assert out["all_coords_preds"].shape == (2, 2, 799, 3)
        assert np.isfinite(np.asarray(out["all_coords_preds"])).all()


class TestFrustum:
    def test_points_lift_correctly(self):
        from poem_v2_tpu.models.frustum import frustum_points

        B, V = 1, 2
        intr = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]), (B, V, 3, 3)
        )
        extr = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
        pts = frustum_points(intr, extr, (4, 4), (64, 64), depth_num=4, depth_end=1.2)
        assert pts.shape == (B, V, 4, 4, 4, 3)
        # at pixel (u=32,v=32) (principal point) x=y=0
        p = np.asarray(pts)
        # u grid: [0,16,32,48] -> index 2 hits the principal point
        np.testing.assert_allclose(p[0, 0, 2, 2, :, :2], 0.0, atol=1e-5)
        # depth bins linear from 0 to 1.2
        np.testing.assert_allclose(p[0, 0, 0, 0, :, 2], [0.0, 0.3, 0.6, 0.9], atol=1e-5)


class TestHRNet:
    def test_tiny_hrnet_pyramid(self):
        from poem_v2_tpu.models.backbones.hrnet import HRNet

        m = HRNet(width=8, stage_modules=(1, 1, 1), stage_blocks=1)
        img = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), img)
        feats = m.apply(v, img)
        shapes = [f.shape for f in feats]
        assert shapes == [(1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 64)]


class TestHourglass:
    def test_bisected_branches(self):
        from poem_v2_tpu.models.backbones.hourglass import HourglassBisected

        m = HourglassBisected(features=32, depth=2)
        img = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), img)
        a, b = m.apply(v, img)
        assert a.shape == b.shape == (1, 16, 16, 32)
        # branches differ (independent decoder paths)
        p = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        a2, b2 = m.apply(v, p)
        assert np.abs(np.asarray(a2 - b2)).max() > 0


class TestTRv3:
    def test_hybrid_decoder(self):
        from poem_v2_tpu.models.decoder_v3 import PtEmbedTRv3

        rng = jax.random.PRNGKey(0)
        B, V, H, W, F, N, Q = 1, 2, 8, 8, 32, 128, 799
        m = PtEmbedTRv3(
            feat_dim=F, vt_hidden_dims=(64, 32), vt_output_dims=(32, 3), vt_num_layers=1,
            pt_n_blocks=1, pt_n_neighbor=8, pt_n_neighbor_query=8,
        )
        args = (
            jax.random.normal(rng, (B, N, 3)), jax.random.normal(rng, (B, N, F)),
            jax.random.normal(rng, (B, Q, 3)) * 0.1, jax.random.normal(rng, (B, Q, F)),
            jax.random.normal(rng, (B, V, H, W, F)), jnp.ones((B, V), bool),
            jnp.broadcast_to(jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]), (B, V, 3, 3)),
            jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)), jnp.asarray([[0, 0, 0.6]]), 0.1,
        )
        v = m.init({"params": rng, "dropout": rng}, *args)
        out = m.apply(v, *args)
        assert out.shape == (2, B, 799, 3)  # metro stage + 1 PT block
        assert np.isfinite(np.asarray(out)).all()
