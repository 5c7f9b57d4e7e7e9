"""Baseline models + v1 heads: forward shapes and finiteness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_batch
from poem_v2_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier


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


# --------------------------------------------------------------------------
# reference topology asset loaders (CMR transform.pkl / METRO npz)
# --------------------------------------------------------------------------
def test_metro_mesh_sampler_loader(tmp_path):
    """assets/mano_downsampling.npz format: object arrays of scipy sparse
    A/U/D (reference external/metro/base_model.py:336-344)."""
    import scipy.sparse as sp

    from poem_v2_tpu.models.metro import load_mesh_sampler

    rs = np.random.RandomState(0)
    D0 = sp.random(5, 12, density=0.4, random_state=rs, format="coo")
    U0 = sp.random(12, 5, density=0.4, random_state=rs, format="coo")
    A0 = sp.eye(12, format="coo")
    path = tmp_path / "mano_downsampling.npz"
    np.savez(path,
             A=np.asarray([A0], dtype=object),
             U=np.asarray([U0], dtype=object),
             D=np.asarray([D0], dtype=object))

    D, U = load_mesh_sampler(str(path))
    assert D.shape == (5, 12) and U.shape == (12, 5)
    np.testing.assert_allclose(D, np.asarray(D0.todense(), np.float32))
    np.testing.assert_allclose(U, np.asarray(U0.todense(), np.float32))


def test_cmr_spiral_transform_loader(tmp_path):
    """template/transform.pkl format: vertices/face/up_transform pickle
    (reference external/cmr/utils.py:16-52); spirals extracted from faces."""
    import pickle

    import scipy.sparse as sp

    from poem_v2_tpu.models.cmr import extract_spirals, load_spiral_transform

    # tiny two-level mesh hierarchy: an octahedron downsampled to a triangle
    verts0 = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32
    )
    faces0 = np.asarray(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    )
    verts1 = verts0[:3]
    faces1 = np.asarray([[0, 1, 2]])
    up = sp.random(6, 3, density=0.5, random_state=np.random.RandomState(1), format="coo")
    tmp = {
        "vertices": [verts0, verts1],
        "face": [faces0, faces1],
        "adj": [None, None],
        "down_transform": [sp.eye(3, 6, format="coo")],
        "up_transform": [up],
    }
    path = tmp_path / "transform.pkl"
    with open(path, "wb") as f:
        pickle.dump(tmp, f)

    vs, spirals, ups = load_spiral_transform(str(path), seq_length=(6, 3))
    assert len(vs) == 2 and len(spirals) == 2 and len(ups) == 1
    assert spirals[0].shape == (6, 6) and spirals[1].shape == (3, 3)
    np.testing.assert_allclose(ups[0], np.asarray(up.todense(), np.float32))

    # spiral contract: starts at the vertex itself, then its ordered 1-ring
    sp0 = extract_spirals(faces0, 6, 6)
    for v in range(6):
        assert sp0[v, 0] == v
        ring = set(sp0[v, 1:5])
        # octahedron: every vertex has exactly 4 neighbours
        true_ring = {int(x) for f in faces0 for x in f if v in f} - {v}
        assert ring == true_ring


def test_cmr_model_with_loaded_transform(tmp_path):
    """CMR builds and runs from a fabricated transform.pkl."""
    import pickle

    import scipy.sparse as sp

    from poem_v2_tpu.models.cmr import build_mesh_hierarchy, create_cmr_model
    from poem_v2_tpu.mano import ManoLayer
    from poem_v2_tpu.utils.config import Config

    # fabricate a pkl from the synthetic hierarchy so shapes are realistic
    mano = ManoLayer(center_idx=0)
    verts = np.asarray(mano(jnp.zeros((1, 48)), jnp.zeros((1, 10))).verts[0])
    vs, spirals, ups = build_mesh_hierarchy(verts)
    # faces are only needed for spiral extraction: use degenerate fans that
    # connect each vertex to its two nearest neighbours
    faces = []
    for v in vs:
        d2 = ((v[:, None] - v[None]) ** 2).sum(-1)
        nn2 = np.argsort(d2, axis=1)[:, 1:3]
        faces.append(np.stack([np.arange(len(v)), nn2[:, 0], nn2[:, 1]], axis=1))
    tmp = {
        "vertices": vs,
        "face": faces,
        "adj": [None] * len(vs),
        "down_transform": [sp.eye(vs[i + 1].shape[0], vs[i].shape[0]) for i in range(len(ups))],
        "up_transform": [sp.coo_matrix(u) for u in ups],
    }
    path = tmp_path / "transform.pkl"
    with open(path, "wb") as f:
        pickle.dump(tmp, f)

    cfg = Config({"BACKBONE": {"TYPE": "resnet18", "NORM": "gn"}, "TRANSFORM_PKL": str(path)})
    model, aux = create_cmr_model(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": rng, "dropout": rng}, img)
    out = model.apply(variables, img)
    assert out["pred_verts_3d_rel"].shape == (1, 778, 3)
