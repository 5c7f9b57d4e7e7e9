"""Shared test fixtures: tiny model configs + synthetic batches."""

import sys

import jax.numpy as jnp

from poem_v2_tpu.utils.config import Config

# Top-level namespaces the reference-import fixtures are allowed to stub and
# therefore to evict on teardown.  Everything else in sys.modules — above all
# torch.* and jax.* — must survive a fixture untouched: evicting lazily
# imported torch/jax submodules forces a re-import in the next parity file
# which re-runs C-level registrations (TORCH_LIBRARY c10d_functional, jax
# pallas config options) and errors the whole tier when run in one process.
_STUB_NAMESPACES = (
    "lib", "manotorch", "pytorch3d", "refcmr", "torch_scatter",
    "torchvision", "imageio",
)


def _fixture_owned(name):
    if name.startswith("ref_"):
        return True
    return any(name == p or name.startswith(p + ".") for p in _STUB_NAMESPACES)


def snapshot_stub_modules():
    """Snapshot only the sys.modules entries a reference fixture may touch."""
    return {k: v for k, v in sys.modules.items() if _fixture_owned(k)}


def restore_stub_modules(saved):
    """Evict fixture-owned modules and restore the pre-fixture snapshot."""
    for k in [k for k in sys.modules if _fixture_owned(k)]:
        del sys.modules[k]
    sys.modules.update(saved)

TINY_MODEL_CFG = Config(
    {
        "TYPE": "PtEmbedMultiviewStereoV2",
        "PRETRAINED": None,
        "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
        "HEAD": {
            "TYPE": "POEM_Generalized_Head",
            "TRANSFORMER": {
                "TYPE": "PtEmbedTRv4",
                "N_BLOCKS": 2,
                "INPUT_FEAT_DIM": 64,
                "NUM_HIDDEN_LAYERS": 4,
                "NUM_ATTENTION_HEADS": 4,
                "DROPOUT": 0.1,
                "BPS_FEAT_DIM": 256,
                "N_NEIGHBOR": 8,
                "N_NEIGHBOR_QUERY": 8,
            },
            "POSITIONAL_ENCODING": {
                "TYPE": "SinePositionalEncoding3D",
                "NUM_FEATS": 32,
                "NORMALIZE": True,
            },
            "WITH_POSITION": True,
            "WITH_MULTIVIEW": True,
            "NUM_QUERY": 799,
            "NUM_PREDS": 2,
            "DEPTH_NUM": 8,
            "POSITION_RANGE": [-0.6, -0.6, 0.0, 0.6, 0.6, 1.2],
            "LID": False,
            "DEPTH_START": 0.0,
            "DEPTH_END": 1.2,
            "POINTS_FEAT_DIM": 64,
            "EMBED_DIMS": 64,
            "IN_CHANNELS": 128,
            "CENTER_SHIFT": True,
            "N_SAMPLE": 256,
            "RADIUS_SAMPLE": 0.1,
            "CAM_FEAT_MERGE": "attn",
            "QUERY_TYPE": "KPT",
        },
        "LOSS": {
            "JOINTS_LOSS_TYPE": "l2",
            "VERTICES_LOSS_TYPE": "l1",
            "HEATMAP_JOINTS_WEIGHT": 10.0,
            "JOINTS_LOSS_WEIGHT": 1.0,
            "VERTICES_LOSS_WEIGHT": 1.0,
            "JOINTS_2D_LOSS_WEIGHT": 1.0,
            "VERTICES_2D_LOSS_WEIGHT": 0.0,
        },
        "DATA_PRESET": {
            "CENTER_IDX": 0,
            "NUM_JOINTS": 21,
            "NUM_VERTS": 778,
            "IMAGE_SIZE": [64, 64],
        },
    }
)


def tiny_batch(batch_size=2, view_max=4, image_size=64, seed=0, random_views=True):
    import jax.numpy as jnp  # noqa

    from poem_v2_tpu.data import SyntheticMultiviewDataset

    ds = SyntheticMultiviewDataset(
        batch_size=batch_size,
        view_max=view_max,
        image_size=image_size,
        seed=seed,
        random_views=random_views,
    )
    batch = ds.sample_batch()
    return {k: jnp.asarray(v) for k, v in batch.items()}
