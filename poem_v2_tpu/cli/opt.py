"""CLI argument parsing (reference lib/opt.py:9-55).

DDP-era flags (node rank, master addr/port, gpu ids) are gone — the JAX
runtime discovers the mesh; ``--mesh-data``/``--mesh-model`` select the
logical mesh shape instead.
"""

from __future__ import annotations

import argparse


def parse_exp_args(argv=None):
    p = argparse.ArgumentParser("POEM-v2-TPU")
    p.add_argument("-c", "--cfg", type=str, required=True, help="experiment config yaml")
    p.add_argument("--exp_id", type=str, default="default", help="experiment id")
    p.add_argument("--resume", type=str, default=None, help="experiment dir to resume")
    p.add_argument("--reload", type=str, default=None, help="checkpoint to load weights from")
    p.add_argument("-b", "--batch_size", type=int, default=None, help="global batch size")
    p.add_argument("--val_batch_size", type=int, default=None)
    p.add_argument("-w", "--workers", type=int, default=4)
    p.add_argument("--snapshot", type=int, default=1, help="epochs between ckpt snapshots")
    p.add_argument("--ckpt_freq", type=int, default=1,
                   help="epochs between rolling-checkpoint writes (reference "
                        "writes every epoch; raise for fast protocol runs "
                        "where the orbax write dominates the epoch). The "
                        "final epoch always checkpoints.")
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--log_freq", type=int, default=None,
                   help="steps between summary/console logs "
                        "(default: cfg.TRAIN.LOG_INTERVAL)")
    p.add_argument("--eval_extra", type=str, default="", help="auc | draw | save")
    p.add_argument("--view_max", type=int, default=8, help="padded view count")
    p.add_argument("--mesh_data", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--mesh_model", type=int, default=1, help="model-parallel mesh size")
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--flash_train", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="dense Pallas attention (custom VJP) in the training "
                        "fwd+bwd — DEFAULT since round 3 (grad-parity-tested "
                        "vs the einsum path); skips attention-prob dropout "
                        "(PARITY.md deviation #4). --no-flash_train restores "
                        "the reference-dropout einsum path")
    p.add_argument("--exact_knn", action="store_true",
                   help="exact lax.top_k KNN in the decoder (checkpoint-parity "
                        "evals; default approx_max_k, recall ~0.95)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host SPMD)")
    p.add_argument("--profile", type=str, default="",
                   help="capture a jax.profiler device trace of epoch 0 into this dir")
    return p.parse_args(argv)
