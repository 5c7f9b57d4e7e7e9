"""Six-protocol eval_single contract: adapter -> dumper -> wds -> eval CLI.

Drives every DATASET_META protocol (reference scripts/eval_single.py:5-36)
end to end through the product front door: fabricated raw dataset root ->
map-style adapter -> shard dumper (reference tar layout) -> streaming
MultiviewWebDataset -> ``cli.eval`` with the protocol's pinned view range
and shard-name pattern -> metrics + AUC artifacts. The model is shrunk
via ``build_eval_cfg(model_overrides=...)`` so the whole matrix runs on
CPU; the protocol semantics (urls pattern, view_max, transforms, exact
KNN) stay exactly the released ones. Doubles as the adapter<->dumper<->
wds schema-contract test for every dataset family.
"""

import os
import re

import numpy as np
import pytest

from test_adapters import (
    make_arctic_root,
    make_dexycb_root,
    make_freihand_root,
    make_ho3d_root,
    make_interhand_root,
    make_oakink_root,
)

pytestmark = pytest.mark.slow

# tiny-model overrides: the synthetic_smoke.yaml model, which compiles in
# minutes on CPU (the release HRNet tiers are exercised on the TPU bench)
TINY_MODEL = {
    "BACKBONE": {"TYPE": "resnet18", "NORM": "gn"},
    "HEAD": {
        "TRANSFORMER": {
            "N_BLOCKS": 2, "INPUT_FEAT_DIM": 64, "NUM_ATTENTION_HEADS": 4,
            "DROPOUT": 0.1, "BPS_FEAT_DIM": 256, "N_NEIGHBOR": 8,
            "N_NEIGHBOR_QUERY": 8, "PARAMETRIC_OUTPUT": False,
        },
        "POSITIONAL_ENCODING": {"NUM_FEATS": 32, "NORMALIZE": True},
        "NUM_PREDS": 2, "DEPTH_NUM": 8, "POINTS_FEAT_DIM": 64,
        "EMBED_DIMS": 64, "IN_CHANNELS": 128, "N_SAMPLE": 256,
    },
}


class _SingleViewAsMultiview:
    """Single-view dataset -> dumper-ready one-view samples (the released
    Freihand_mv shards are single-view wds samples, eval_single.py:31-35)."""

    def __init__(self, base, n):
        self.base = base
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        label = {k: [v] for k, v in self.base.get_label(idx).items()}
        return {
            "key": f"sample_{idx:06d}",
            "images": [self.base.get_image(idx)],
            "label": label,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _build_chain(name, tmp_path):
    """Fabricated root -> multiview adapter for one protocol family."""
    root = str(tmp_path / name)
    os.makedirs(root, exist_ok=True)
    if name == "DexYCB":
        from poem_v2_tpu.data.adapters import DexYCB, DexYCBMultiView

        make_dexycb_root(root, frames=3)
        return DexYCBMultiView(
            DexYCB(root, sequences=["20200709-subject-01/20200709_141754"]),
            master_system="as_constant_camera",
        )
    if name == "HO3D":
        from poem_v2_tpu.data.adapters import HO3DV3, HO3DMultiView

        make_ho3d_root(root, frames=2)
        return HO3DMultiView(HO3DV3(root, "train"))
    if name == "Interhand":
        from poem_v2_tpu.data.adapters import InterHand, InterHandMultiView

        make_interhand_root(root, n_views=3, frames=2)
        return InterHandMultiView(InterHand(root, "train"))
    if name == "Oakink":
        from poem_v2_tpu.data.adapters import OakInk, OakInkMultiView

        make_oakink_root(root, frames=2)
        return OakInkMultiView(OakInk(root, "train+val"))
    if name == "Arctic":
        from poem_v2_tpu.data.adapters import Arctic, ArcticMultiView

        make_arctic_root(root, n_views=2, frames=2)
        return ArcticMultiView(Arctic(root, "train", "p1"))
    if name == "Freihand":
        from poem_v2_tpu.data.adapters import FreiHAND

        make_freihand_root(root, n=3)
        ds = FreiHAND(root, "train")
        return _SingleViewAsMultiview(ds, n=3)
    raise KeyError(name)


def _run_protocol(name, tmp_path, monkeypatch, eval_extra="auc",
                  model_size="small"):
    from poem_v2_tpu.cli import eval as eval_cli
    from poem_v2_tpu.cli.eval_single import DATASET_META, build_eval_cfg
    from poem_v2_tpu.data.dumper import dump_dataset

    meta = DATASET_META[name]
    mv = _build_chain(name, tmp_path)
    n = len(mv)

    # shard prefix from the pinned url pattern, e.g. Arctic_mv_val_p1
    base = os.path.basename(meta["urls"])
    prefix = re.match(r"(.+?)-(?:\{)?\d", base).group(1)
    tar_dir = tmp_path / "tars" / name
    n_dumped = dump_dataset(mv, str(tar_dir), prefix, samples_per_shard=2)
    assert n_dumped == n
    shards = sorted(os.listdir(tar_dir))
    assert all(re.fullmatch(rf"{re.escape(prefix)}-\d{{6}}\.tar", s) for s in shards)
    if len(shards) > 1:
        urls = str(tar_dir / f"{prefix}-{{000000..{len(shards) - 1:06d}}}.tar")
    else:
        urls = str(tar_dir / shards[0])

    overrides = dict(TINY_MODEL)
    if model_size.endswith("_MANO"):
        # keep the parametric branch the size table enables
        overrides = {**TINY_MODEL, "HEAD": {
            **TINY_MODEL["HEAD"],
            "TRANSFORMER": {**TINY_MODEL["HEAD"]["TRANSFORMER"],
                            "PARAMETRIC_OUTPUT": True},
        }}
    cfg = build_eval_cfg(name, model_size, reload_path="", urls=urls,
                         epoch_size=n, model_overrides=overrides)
    cfg.DATA_PRESET.IMAGE_SIZE = [64, 64]
    cfg.TRAIN.BATCH_SIZE = 2

    cfg_path = tmp_path / f"eval_{name}.yaml"
    with open(cfg_path, "w") as f:
        cfg.dump(f)

    monkeypatch.chdir(tmp_path)
    results = eval_cli.main([
        "-c", str(cfg_path), "--exp_id", "default",
        "--eval_extra", eval_extra, "--view_max", str(meta["max_view"]),
        "--exact_knn",
    ])

    for key in ("mpjpe", "mpvpe", "pa_mpjpe", "pa_mpvpe"):
        assert key in results and np.isfinite(results[key]), (name, key, results)

    exp_dirs = sorted((tmp_path / "exp").glob("default_eval_*"))
    assert exp_dirs, "eval CLI produced no experiment dir"
    dump = exp_dirs[-1]
    if eval_extra == "auc":
        auc = (dump / "auc.txt").read_text()
        assert re.search(r"auc_j 0\.\d+ auc_v 0\.\d+", auc), auc
        for pkl in ("res_auc_j.pkl", "res_auc_v.pkl"):
            import pickle

            with open(dump / pkl, "rb") as f:
                curve = pickle.load(f)
            thr, pck = np.asarray(curve[0]), np.asarray(curve[1])
            assert thr.shape == pck.shape and len(thr) == 20
    elif eval_extra == "draw":
        jpgs = list(dump.glob("draws/*.jpg")) + list(dump.glob("*.jpg"))
        assert jpgs, f"draw eval produced no images under {dump}"
    return results


@pytest.mark.parametrize("name", ["DexYCB", "HO3D", "Interhand", "Oakink",
                                  "Arctic", "Freihand"])
def test_eval_protocol_end_to_end(name, tmp_path, monkeypatch):
    _run_protocol(name, tmp_path, monkeypatch, eval_extra="auc")


def test_eval_protocol_draw_artifacts(tmp_path, monkeypatch):
    _run_protocol("DexYCB", tmp_path, monkeypatch, eval_extra="draw")


def test_eval_protocol_parametric_mano(tmp_path, monkeypatch):
    """The medium_MANO tier's eval chain (reference eval_single.py:74-86):
    PARAMETRIC_OUTPUT routes the decoder's final block through the
    106-param MANO branch; the released protocol pairs it with OakInk."""
    _run_protocol("Oakink", tmp_path, monkeypatch, eval_extra="auc",
                  model_size="medium_MANO")
