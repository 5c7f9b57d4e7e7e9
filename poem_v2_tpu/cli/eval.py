"""Evaluation entry point (reference scripts/eval.py).

Usage:
  python -m poem_v2_tpu.cli.eval -c configs/release/eval.yaml \\
      --reload exp/.../checkpoints/checkpoint --eval_extra auc
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from ..data import batch_iterator, create_dataset
from ..models.poem import create_poem_model
from ..training.evaluator import AUCCallback, Evaluator, IdleCallback, PredictionSaverCallback
from ..utils.config import get_config
from ..utils.logger import get_logger
from ..utils.recorder import Recorder
from .opt import parse_exp_args


def main(argv=None):
    args = parse_exp_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_config(args.cfg, arg=args, merge=True)
    logger = get_logger()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, aux = create_poem_model(
        cfg.MODEL, dtype=dtype, exact_knn=bool(getattr(args, "exact_knn", False))
    )

    dataset = create_dataset(
        cfg.DATASET.TEST,
        data_preset=cfg.DATA_PRESET,
        is_train=False,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    batch_size = cfg.TRAIN.get("VAL_BATCH_SIZE", cfg.TRAIN.BATCH_SIZE)

    recorder = Recorder(f"{args.exp_id}_eval", cfg=cfg, eval_only=True)

    # init params, then load the requested checkpoint
    first = next(iter(batch_iterator(dataset, batch_size, args.view_max, batch_size)))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "dropout": rng},
        jnp.asarray(first["image"]),
        jnp.asarray(first["view_mask"]),
        jnp.asarray(first["cam_intr"]),
        jnp.asarray(first["cam_extr"]),
        jnp.asarray(first["master_joints_3d"]),
        train=False,
    )
    params = variables["params"]
    pretrained = cfg.MODEL.get("PRETRAINED", None)
    if pretrained:
        params = Recorder.load_params(pretrained, params)
        logger.info(f"loaded weights from {pretrained}")

    if args.eval_extra == "auc":
        cb = AUCCallback(exp_dir=recorder.dump_path)
    elif args.eval_extra == "save":
        cb = PredictionSaverCallback(exp_dir=recorder.dump_path)
    elif args.eval_extra == "draw":
        from ..training.draw_callback import DrawingHandCallback

        cb = DrawingHandCallback(exp_dir=recorder.dump_path)
    else:
        cb = IdleCallback()

    evaluator = Evaluator(model, aux, center_idx=cfg.DATA_PRESET.CENTER_IDX)
    epoch_size = cfg.DATASET.TEST.get("EPOCH_SIZE", 0)
    results = evaluator.run(
        params,
        batch_iterator(dataset, batch_size, args.view_max, epoch_size),
        callback=cb,
    )
    logger.info("eval results: " + json.dumps(results, indent=2))
    recorder.record_metric(
        [f"{k}: {v:.6f}" for k, v in results.items()], epoch_idx=0, comment="eval"
    )
    return results


if __name__ == "__main__":
    main()
