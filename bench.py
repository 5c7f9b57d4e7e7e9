"""Benchmark: 8-view eval throughput (frames/sec/chip) on the POEM model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline north-star (BASELINE.json): >=500 8-view frames/sec/chip on a
v5e at parity accuracy. ``vs_baseline`` = value / 500.

The benchmarked path is the full eval forward of the medium-geometry
model (256^2 crops, 8 views, 4096 BPS, 3 decoder blocks, 256-wide):
backbone -> necks -> integral heatmap -> masked DLT -> BPS head.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _wait_for_tpu_relay(host="127.0.0.1", port=8093, max_wait_s=900.0):
    """Block until the axon TPU relay accepts connections, up to max_wait_s.

    No-op when the relay is up (the common case) or when the axon plugin
    is not configured at all (non-tunneled environments: real local TPU
    or CPU runs, where there is nothing to wait for).
    """
    import socket

    if os.environ.get("PALLAS_AXON_POOL_IPS", None) == "":
        return  # plugin explicitly disabled (CPU verification runs)

    def relay_up() -> bool:
        try:
            with socket.create_connection((host, port), timeout=5):
                return True
        except OSError:
            return False

    deadline = time.time() + max_wait_s
    waited = False
    while not relay_up():
        if time.time() > deadline:
            print(
                f"# WARNING: TPU relay {host}:{port} unreachable for "
                f"{max_wait_s:.0f}s; proceeding (result may be CPU-platform)",
                flush=True,
            )
            return
        waited = True
        time.sleep(30.0)
    if waited:
        # relay just recovered: give device registration a moment
        time.sleep(10.0)


def main():
    parser = argparse.ArgumentParser()
    # B16 fills the 128-wide lane dim of the batch-minor conv layouts XLA
    # picks for HRNet's 40/80-channel branches (profiled: 4.04 ms/sample at
    # B16 vs 5.22 at B8 and 4.11 at B32 on v5e)
    parser.add_argument("--batch-size", type=int, default=16, help="0 = auto sweep")
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--iters", type=int, default=20)
    # HRNet-W40 is the reference's release flagship (config/release/*.yaml)
    parser.add_argument("--backbone", type=str, default="HRNet")
    parser.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    parser.add_argument(
        "--norm", type=str, default="frozen_bn", choices=["frozen_bn", "gn", "bn"],
        help="eval-parity default frozen_bn (the reference evaluates with frozen "
             "BatchNorm, which folds to a free affine); gn matches from-scratch training",
    )
    parser.add_argument(
        "--knn_bf16", action="store_true",
        help="bf16 arg-min rounds in the fused KNN kernels (~2x the kernel's "
             "dominant cost; near-exact selection, deviation in docs/performance.md)",
    )
    parser.add_argument(
        "--knn_k", type=int, default=0,
        help="override N_NEIGHBOR/N_NEIGHBOR_QUERY (0 = reference K=32)",
    )
    parser.add_argument(
        "--size", type=str, default="medium",
        choices=["small", "medium", "large", "huge", "medium_MANO"],
        help="released model size tier (reference scripts/eval_single.py:38-39 "
             "MODEL_CATEGORY/EMBED_SIZE: 128/256/512/1024-wide)",
    )
    parser.add_argument(
        "--approx_knn", action="store_true",
        help="XLA approx_max_k KNN selection (recall ~0.95 on TPU) instead "
             "of the exact fused Pallas kernels; MPJPE deviation vs exact "
             "measured by scripts/measure_approx_knn.py (docs/performance.md)",
    )
    args = parser.parse_args()

    # The tunneled TPU relay (axon, 127.0.0.1:8093) drops occasionally and
    # may come back on its own; a bench run that starts during an outage
    # would otherwise silently record a CPU number (or hang in device
    # init). Wait for the relay — bounded — before touching jax.
    _wait_for_tpu_relay()

    import jax

    # persistent compile cache: the HRNet-B16 program takes minutes to
    # compile through the tunneled TPU; repeat bench runs should not pay it
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.utils.config import Config

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # the benched model is built from the SAME release recipe the eval CLI
    # uses (reference config/release/train_medium.yaml via scripts/
    # eval_single.py:38-39) so the bench cannot drift from the parity target
    yaml_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs", "release",
        f"train_{args.size}.yaml"
    )
    full_cfg = Config.from_yaml(yaml_path)
    cfg = full_cfg.MODEL
    tr = cfg.HEAD.TRANSFORMER
    expected_embed = {"small": 128, "medium": 256, "large": 512, "huge": 1024,
                      "medium_MANO": 256}[args.size]
    assert (
        cfg.BACKBONE.TYPE == "HRNet"
        and cfg.BACKBONE.WIDTH == 40
        and tr.N_BLOCKS == 3
        and tr.N_NEIGHBOR == 32
        and tr.N_NEIGHBOR_QUERY == 32
        and cfg.HEAD.N_SAMPLE == 4096
        and cfg.HEAD.EMBED_DIMS == expected_embed
        and full_cfg.DATA_PRESET.IMAGE_SIZE == [256, 256]
    ), "release recipe drifted from the benched flagship contract"
    if args.backbone != cfg.BACKBONE.TYPE:  # explicit tier override only
        cfg.BACKBONE.TYPE = args.backbone
        if args.backbone.lower().startswith("resnet"):
            cfg.HEAD.IN_CHANNELS = 256
    cfg.BACKBONE.NORM = args.norm
    if args.knn_k:
        tr.N_NEIGHBOR = args.knn_k
        tr.N_NEIGHBOR_QUERY = args.knn_k
    model, aux = create_poem_model(
        cfg, dtype=dtype, knn_bf16_dist=args.knn_bf16,
        fused_knn=False if args.approx_knn else None,
    )

    def run_at_batch(bs: int) -> float:
        ds = SyntheticMultiviewDataset(
            batch_size=bs,
            view_max=args.views,
            image_size=256,
            seed=0,
            random_views=False,
            view_range=(args.views, args.views),
        )
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        rng = jax.random.PRNGKey(0)
        # fabricate params host-side from eval_shape: the tunneled TPU
        # dispatches init eagerly (minutes); values don't affect timing
        shapes = jax.eval_shape(
            lambda: model.init(
                {"params": rng, "noise": rng, "dropout": rng},
                batch["image"],
                batch["view_mask"],
                batch["cam_intr"],
                batch["cam_extr"],
                batch["master_joints_3d"],
                train=False,
            )
        )
        rs = np.random.RandomState(0)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.asarray(rs.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
        )

        @jax.jit
        def forward(params, image, view_mask, cam_intr, cam_extr):
            preds = model.apply(
                {"params": params}, image, view_mask, cam_intr, cam_extr, None, train=False
            )
            return preds["pred_joints_3d"], preds["pred_verts_3d"]

        fargs = (
            variables["params"],
            batch["image"],
            batch["view_mask"],
            batch["cam_intr"],
            batch["cam_extr"],
        )
        # chained timing with host fetch: robust to lazy remote dispatch
        from poem_v2_tpu.utils.benchmarking import time_fn

        dt = time_fn(forward, *fargs, iters=args.iters)
        return bs / dt

    if args.batch_size:
        best = run_at_batch(args.batch_size)
    else:
        best = 0.0
        for bs in (8, 16, 32):
            try:
                fps = run_at_batch(bs)
            except Exception:
                break
            best = max(best, fps)

    result = {
        "metric": f"{args.views}view_eval_frames_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "frames/s",
        "vs_baseline": round(best / 500.0, 4),
        "config": f"configs/release/train_{args.size}.yaml ({args.backbone} {args.dtype} "
                  f"batch{args.batch_size or 'auto'} {args.views}view 4096bps 3blocks "
                  f"{expected_embed}d"
                  f"{' approxKNN' if args.approx_knn else ''}"
                  f"{f' K{args.knn_k}' if args.knn_k else ''})",
        # which hardware actually ran: guards against a tunnel outage
        # silently recording a CPU-platform number as the chip result
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
