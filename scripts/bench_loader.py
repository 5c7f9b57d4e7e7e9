"""Host input-pipeline feed-rate benchmark (SURVEY hard-part #6).

Can the host loader feed the chip at flagship rate?  Streams a
synthetic 8-view 256^2 shard set through the REAL pipeline — tar read,
jpeg decode, SimpleTransform3DMultiView, extrinsic re-basing, padded
collation (B16, V8) — and reports host samples/s against the measured
device step budgets (docs/performance.md: train 156.7 ms/step at B8,
eval 89.9 ms at B16).

Loader occupancy < 1.0 means the prefetcher (training/prefetch.py,
2 batches in flight) hides the loader entirely; > 1.0 means the device
starves and WORKERS must rise.

Usage:
  python scripts/bench_loader.py [--workers N] [--batches 30] [--aug]
Shards are dumped to /tmp/poem_loader_bench once and reused.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SHARD_DIR = "/tmp/poem_loader_bench"
N_SAMPLES = 256
VIEWS = 8
IMG = 256


def ensure_shards():
    import glob

    tars = sorted(glob.glob(os.path.join(SHARD_DIR, "Synth_mv_train-*.tar")))
    if len(tars) >= N_SAMPLES // 32:
        return tars
    print(f"# dumping {N_SAMPLES} synthetic samples to {SHARD_DIR} ...", flush=True)
    import dump_shards

    dump_shards.main([
        "--synthetic", "--out", SHARD_DIR, "--prefix", "Synth_mv_train",
        "--num", str(N_SAMPLES), "--views", str(VIEWS),
        "--image-size", str(IMG), "--per-shard", "32",
    ])
    return sorted(glob.glob(os.path.join(SHARD_DIR, "Synth_mv_train-*.tar")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--workers-mode", choices=("thread", "process"), default="thread")
    p.add_argument("--scaling-sweep", action="store_true",
                   help="measure samples/s for workers in {0,2,4,8} in both "
                        "pool modes and print the per-worker scaling model")
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--aug", action="store_true",
                   help="training augmentation pipeline (default: eval/no-aug)")
    args = p.parse_args()

    tars = ensure_shards()
    n_shards = len(tars) - 1

    from poem_v2_tpu.data.collate import batch_iterator
    from poem_v2_tpu.data.wds import MultiviewWebDataset
    from poem_v2_tpu.utils.config import Config

    tf = {"TYPE": "SimpleTransform3DMultiView", "AUG": False}
    if args.aug:
        tf = {
            "TYPE": "SimpleTransform3DMultiView", "AUG": True,
            "CENTER_JIT": 0.05, "SCALE_JIT": 0.06, "ROT_JIT": 5,
            "COLOR_JIT": 0.3, "ROT_PROB": 0.5,
            "OCCLUSION": False, "OCCLUSION_PROB": 0.2,
        }
    cfg = Config({
        "URLS": os.path.join(
            SHARD_DIR, "Synth_mv_train-{%06d..%06d}.tar" % (0, n_shards)),
        "RANDOM_N_VIEWS": False,
        "TRANSFORM": tf,
        "WORKERS": args.workers,
        "WORKERS_MODE": args.workers_mode,
    })
    preset = Config({"IMAGE_SIZE": [IMG, IMG], "CENTER_IDX": 0,
                     "NUM_JOINTS": 21, "NUM_VERTS": 778})

    def measure(workers, mode):
        c = Config({**cfg.to_dict(), "WORKERS": workers, "WORKERS_MODE": mode})
        ds = MultiviewWebDataset(c, data_preset=preset, is_train=True)

        def stream():
            # loop the epoch so --batches isn't bounded by the shard set
            while True:
                yield from ds

        it = batch_iterator(stream(), args.batch_size, VIEWS)
        next(it)  # warmup: opens tars, first decodes, numpy one-time costs
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            b = next(it)
            n += b["image"].shape[0]
        dt = time.perf_counter() - t0
        return n / dt, dt / args.batches * 1e3

    if args.scaling_sweep:
        # per-worker scaling model: efficiency = rate / (serial_rate * W).
        # On a 1-core host both pools stay ~flat (documented expectation);
        # on an n-core TPU host the thread pool should track min(W, cores)
        # and the process pool bounds GIL-limited transforms.
        serial, _ = measure(0, "thread")
        rows = [{"workers": 0, "mode": "serial", "samples_per_sec": round(serial, 2)}]
        for mode in ("thread", "process"):
            for w in (2, 4, 8):
                sps_w, _ = measure(w, mode)
                rows.append({
                    "workers": w, "mode": mode,
                    "samples_per_sec": round(sps_w, 2),
                    "speedup": round(sps_w / serial, 3),
                    "per_worker_efficiency": round(sps_w / (serial * w), 3),
                })
        print(json.dumps({"metric": "loader_scaling", "ncpu": os.cpu_count(),
                          "aug": bool(args.aug), "rows": rows}))
        return

    sps, ms_per_batch = measure(args.workers, args.workers_mode)

    # measured device budgets at flagship geometry (docs/performance.md)
    eval_step_ms, eval_bs = 89.9, 16
    train_step_ms, train_bs = 156.7, 8
    result = {
        "metric": "loader_samples_per_sec",
        "value": round(sps, 2),
        "unit": "samples/s",
        "workers": args.workers,
        "workers_mode": args.workers_mode,
        "aug": bool(args.aug),
        "ms_per_batch_b%d" % args.batch_size: round(ms_per_batch, 1),
        # device_rate / loader_rate: > 1.0 = the device starves
        "occupancy_vs_eval_b16": round((eval_bs / (eval_step_ms / 1e3)) / sps, 3),
        "occupancy_vs_train_b8": round((train_bs / (train_step_ms / 1e3)) / sps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
