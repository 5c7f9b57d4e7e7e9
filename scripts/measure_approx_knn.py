"""Measure the approx-KNN output deviation ON THE REAL TPU.

PARITY.md deviation #5 / VERDICT r2 #6: the training path defaults to
``jax.lax.approx_max_k`` (recall ~0.95 on TPU) while eval is exact. On
CPU the op is exact, so the in-test measurement prints 0.000 mm and is
vacuous; this script replays the full-model torch-parity fixture —
converted reference-module weights + the identical head inputs — on the
TPU and diffs the exact vs approx head forward per decoder block.

Usage:
  1. JAX_PLATFORMS=cpu POEM_DUMP_HEAD=/tmp/head_fixture.pkl \
         python -m pytest tests/test_parity_full_model.py -x -q -s
  2. python scripts/measure_approx_knn.py /tmp/head_fixture.pkl
"""

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from poem_v2_tpu.models.poem import create_poem_model  # noqa: E402
from poem_v2_tpu.utils.config import Config  # noqa: E402


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/head_fixture.pkl"
    with open(path, "rb") as f:
        d = pickle.load(f)

    os.chdir(REPO)  # assets/ for the anchor/bps constants
    repo_cfg = Config.from_yaml("configs/release/train_medium.yaml")
    model_cfg = repo_cfg.MODEL
    model_cfg.BACKBONE.NORM = "frozen_bn"

    args = (
        jnp.asarray(d["mlvl"]),
        jnp.asarray(d["view_mask"]),
        jnp.asarray(d["cam_intr"]),
        jnp.asarray(d["cam_extr"]),
        jnp.asarray(d["master_joints_3d"]),
    )

    coords = {}
    for tag, exact, knn_k in (
        ("exact", True, 0),
        ("approx", False, 0),
        ("exact_k16", True, 16),   # VERDICT r2 #1b: K ablation on real weights
    ):
        if knn_k:
            model_cfg.HEAD.TRANSFORMER.N_NEIGHBOR = knn_k
            model_cfg.HEAD.TRANSFORMER.N_NEIGHBOR_QUERY = knn_k
        model, _ = create_poem_model(
            model_cfg, dtype=jnp.float32, use_flash=False, exact_knn=exact
        )
        if knn_k:
            model_cfg.HEAD.TRANSFORMER.N_NEIGHBOR = 32
            model_cfg.HEAD.TRANSFORMER.N_NEIGHBOR_QUERY = 32
        with jax.default_matmul_precision("highest"):
            out = model.head.apply(
                {"params": d["head_params"]}, *args,
                inp_res=tuple(d["inp_res"]), deterministic=True,
            )
        coords[tag] = np.asarray(out["all_coords_preds"])

    t = d["t_coords"]
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    for blk in range(coords["exact"].shape[0]):
        da = np.abs(coords["approx"][blk] - coords["exact"][blk])
        dk = np.abs(coords["exact_k16"][blk] - coords["exact"][blk])
        dt = np.abs(coords["exact"][blk] - t[blk])
        print(
            f"block {blk}: approx-vs-exact max {da.max() * 1e3:.3f} mm "
            f"mean {da.mean() * 1e3:.4f} mm | K16-vs-K32 max "
            f"{dk.max() * 1e3:.3f} mm mean {dk.mean() * 1e3:.4f} mm | "
            f"exact-vs-torch max {dt.max() * 1e3:.4f} mm"
        )

    # end-to-end metric deltas (VERDICT r3 #3): the 799 queries are the
    # template order joints(21) + verts(778) (ptEmb_head.py:885-891), so
    # the FINAL block's per-point Euclidean deviation IS the MPJPE/MPVPE
    # delta an eval run would see vs the exact config — comparable
    # directly against the 1e-3 m parity budget (BASELINE.json)
    final = coords["exact"][-1]
    nj = 21
    for tag in ("approx", "exact_k16"):
        dv = np.linalg.norm(coords[tag][-1] - final, axis=-1)  # (B, 799)
        mpjpe = dv[:, :nj].mean() * 1e3
        mpvpe = dv[:, nj:].mean() * 1e3
        print(
            f"{tag}: end-to-end ΔMPJPE {mpjpe:.4f} mm, ΔMPVPE {mpvpe:.4f} mm "
            f"(max joint {dv[:, :nj].max() * 1e3:.3f} mm, "
            f"max vert {dv[:, nj:].max() * 1e3:.3f} mm)"
        )


if __name__ == "__main__":
    main()
