"""Training-step throughput benchmark (single chip).

Times the full jitted SPMD train step (forward + backward + optimizer,
remat'd decoder blocks) on synthetic data; prints one JSON line like
bench.py but for training samples/sec.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backbone", type=str, default="HRNet")
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--flash-train", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--grad_clip_mode", type=str, default=None,
                   choices=["per_param", "global", "off"],
                   help="override TRAIN.GRAD_CLIP.MODE (A/B the clip cost)")
    p.add_argument("--fused-knn-train", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="A/B the fused-forward exact-KNN training path "
                        "(default: on whenever flash_train is on, on TPU)")
    args = p.parse_args()

    import jax

    # persistent compile cache (HRNet train-step compiles take minutes
    # through the tunneled TPU)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from poem_v2_tpu.data import SyntheticMultiviewDataset
    from poem_v2_tpu.models.poem import create_poem_model
    from poem_v2_tpu.parallel.mesh import create_mesh
    from poem_v2_tpu.training.trainer import Trainer
    from poem_v2_tpu.utils.config import Config

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    # same release recipe as bench.py/the eval CLI (from-scratch training
    # keeps the recipe's gn norm)
    yaml_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "configs", "release", "train_medium.yaml")
    full_cfg = Config.from_yaml(yaml_path)
    cfg = full_cfg.MODEL
    cfg.TRAIN = full_cfg.TRAIN
    cfg.DATA_PRESET = full_cfg.DATA_PRESET
    if args.backbone != cfg.BACKBONE.TYPE:
        cfg.BACKBONE.TYPE = args.backbone
        if args.backbone.lower().startswith("resnet"):
            cfg.HEAD.IN_CHANNELS = 256
    if args.grad_clip_mode == "off":
        cfg.TRAIN.GRAD_CLIP_ENABLED = False
    elif args.grad_clip_mode:
        cfg.TRAIN.GRAD_CLIP.MODE = args.grad_clip_mode
    model, aux = create_poem_model(cfg, dtype=dtype, remat=not args.no_remat,
                                   use_flash_train=args.flash_train,
                                   fused_knn_train=args.fused_knn_train)

    mesh = create_mesh()
    trainer = Trainer(model, aux, train_cfg=cfg.TRAIN, loss_cfg=cfg.LOSS, mesh=mesh,
                      steps_per_epoch=1000)
    ds = SyntheticMultiviewDataset(
        batch_size=args.batch, view_max=args.views, image_size=256, seed=0,
        random_views=False, view_range=(args.views, args.views),
    )
    batch = ds.sample_batch()
    # fabricate the train state host-side from eval_shape: on-device init
    # costs minutes on the tunneled TPU and the values don't affect timing
    dev_b = {k: jnp.asarray(v) for k, v in batch.items()}
    shapes = jax.eval_shape(trainer.init_state, dev_b)
    rs = np.random.RandomState(0)

    def fab(sd):
        if str(sd.dtype).startswith(("float", "bfloat")):
            return jnp.asarray(rs.normal(0, 0.02, sd.shape).astype(sd.dtype))
        return jnp.zeros(sd.shape, sd.dtype)

    state = jax.tree_util.tree_map(fab, shapes)

    # pre-shard the batch once: on tunneled devices per-step host->device
    # transfers would otherwise dominate the measurement
    from poem_v2_tpu.parallel.mesh import shard_batch

    dev_batch = shard_batch(trainer._to_device_batch(batch), mesh)
    # TWO warmup steps: the first compiles for the host-fabricated state's
    # signature, the second for the steady-state (device-typed) signature —
    # otherwise that second compile lands inside the timed loop
    state, metrics = trainer._train_step(state, dev_batch)
    _ = float(metrics["loss"])
    state, metrics = trainer._train_step(state, dev_batch)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = trainer._train_step(state, dev_batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": f"{args.views}view_train_samples_per_sec_per_chip",
        "value": round(args.batch / dt, 2),
        "unit": "samples/s",
        "step_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
