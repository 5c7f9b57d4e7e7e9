"""Training entry point.

SPMD equivalent of scripts/train_ddp.py: no process spawning, no NCCL —
one Python process per host, one jitted step over the device mesh.

Usage:
  python -m poem_v2_tpu.cli.train -c configs/release/train_medium.yaml --exp_id poem_medium
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import batch_iterator, create_dataset
from ..metrics import LossMetric
from ..models.poem import create_poem_model
from ..parallel.mesh import create_mesh
from ..training.trainer import Trainer
from ..utils.config import get_config
from ..utils.logger import get_logger
from ..utils.recorder import Recorder
from .opt import parse_exp_args

# fixed-set feeds larger than this stay on the streaming prefetch path
FIXED_FEED_CACHE_CAP_BYTES = 4e9


def main(argv=None):
    args = parse_exp_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if getattr(args, "multihost", False):
        # multi-host SPMD: one process per host, JAX runtime forms the mesh
        jax.distributed.initialize()
    cfg = get_config(args.cfg, arg=args, merge=True)
    logger = get_logger()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, aux = create_poem_model(
        cfg.MODEL, dtype=dtype, use_flash_train=bool(getattr(args, 'flash_train', True)),
        exact_knn=bool(getattr(args, 'exact_knn', False)),
    )
    mesh = create_mesh(data=args.mesh_data, model=args.mesh_model)
    logger.info(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    batch_size = cfg.TRAIN.BATCH_SIZE
    epoch_size = cfg.DATASET.TRAIN.get("EPOCH_SIZE", 210_000)
    steps_per_epoch = max(1, epoch_size // batch_size)

    trainer = Trainer(
        model,
        aux,
        train_cfg=cfg.TRAIN,
        loss_cfg=cfg.MODEL.LOSS,
        mesh=mesh,
        steps_per_epoch=steps_per_epoch,
    )
    recorder = Recorder(args.exp_id, cfg=cfg)
    from ..utils.summary_writer import SummaryWriter

    summary = SummaryWriter(log_dir=f"{recorder.dump_path}/runs")

    dataset = create_dataset(
        cfg.DATASET.TRAIN,
        data_preset=cfg.DATA_PRESET,
        is_train=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    def batches():
        return batch_iterator(dataset, batch_size, args.view_max, epoch_size)

    first = next(iter(batch_iterator(dataset, batch_size, args.view_max, batch_size)))
    state = trainer.init_state({k: jnp.asarray(v) for k, v in first.items()})
    pretrained_bb = cfg.MODEL.get("PRETRAINED_BACKBONE", None)
    if pretrained_bb:
        # backbone-only warm start (ImageNet HRNet converted by
        # scripts/prepare_hrnet.py)
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(pretrained_bb), {"backbone": state.params["backbone"]}
        )
        state = state.replace(
            params={**state.params, "backbone": restored["backbone"]}
        )
        logger.info(f"warm-started backbone from {pretrained_bb}")
    pretrained = cfg.MODEL.get("PRETRAINED", None)
    if pretrained:
        # warm-start weights only (the huge tier warm-starts from the
        # huge-part checkpoint — reference train_huge.yaml / --reload)
        state = state.replace(params=Recorder.load_params(pretrained, state.params))
        logger.info(f"warm-started weights from {pretrained}")
    start_epoch = 0
    if args.resume:
        state = recorder.resume(state, args.resume)
        # reference resume restores the epoch counter too
        # (train_ddp.py:91-92 via recorder.py:109-138); derive it from the
        # restored optimizer step so the LR schedule and the loop agree
        start_epoch = int(state.step) // steps_per_epoch
        logger.info(
            f"resumed from {args.resume} at step {int(state.step)} "
            f"(epoch {start_epoch})"
        )

    loss_metric = LossMetric()

    # CLI --log_freq overrides the config cadence (reference opt.py:37
    # feeds the model's summary log_freq the same way)
    log_interval = (
        args.log_freq if args.log_freq is not None else cfg.TRAIN.LOG_INTERVAL
    )

    from ..utils.profiling import StepTimer

    timer = StepTimer()
    evaluator = None
    val_ds = None
    val_feed = None

    # Fixed-set protocols (synthetic overfit/convergence runs) replay the
    # SAME batches every epoch — batch_iterator is deterministic — yet the
    # default feed re-ships them host->device each step, which dominates
    # the step on slow links (measured 2.5 s/step tunnel-fed vs ~0.2 s
    # device-resident for the 128^2 protocol). Cache the sharded device
    # batches once and replay from HBM; bounded so real datasets and big
    # protocols keep the streaming prefetch path.
    dev_cache = None
    scan_feed = None
    if bool(cfg.DATASET.TRAIN.get("FIXED_SET", False)):
        bytes_per_batch = sum(
            np.asarray(v).nbytes for v in first.values()
        )
        if bytes_per_batch * steps_per_epoch <= FIXED_FEED_CACHE_CAP_BYTES:
            from ..training.prefetch import prefetch_to_device as _pf

            dev_cache = list(_pf(batches(), trainer.mesh, size=2))
            logger.info(
                f"fixed-set feed cached on device: {len(dev_cache)} batches, "
                f"{bytes_per_batch * steps_per_epoch / 1e6:.0f} MB"
            )
            # uniform batch shapes -> stack once and run each epoch as ONE
            # dispatch (lax.scan over the step; Trainer.epoch_scan). Some
            # transports charge seconds per dispatch, which dominates
            # these small-model protocol runs.
            shapes0 = {k: v.shape for k, v in dev_cache[0].items()}
            if all(
                {k: v.shape for k, v in b.items()} == shapes0 for b in dev_cache
            ):
                scan_feed = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *dev_cache
                )

    for epoch in range(start_epoch, cfg.TRAIN.EPOCH):
        t0 = time.time()
        profiling = bool(args.profile) and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(args.profile)
        # double-buffer device feeds: batch n+1 transfers while n computes
        from ..training.prefetch import prefetch_to_device

        # device-side metric buffer: converting to host floats forces a sync,
        # so drain it only on log steps / epoch end (the reference logs each
        # LOG_INTERVAL too — POEM.py:485-514)
        pending_metrics = []

        def drain_metrics():
            for m in pending_metrics:
                loss_metric.feed({k: float(v) for k, v in m.items()}, batch_size)
            pending_metrics.clear()

        if scan_feed is not None:
            # whole epoch in one launch; metrics arrive stacked (S,)
            state, mstack = trainer.epoch_scan(state, scan_feed)
            host = {k: np.asarray(v) for k, v in mstack.items()}
            n_steps = len(dev_cache)
            for i in range(n_steps):
                loss_metric.feed(
                    {k: float(v[i]) for k, v in host.items()}, batch_size
                )
            global_step = (epoch + 1) * steps_per_epoch - 1
            for k, v in host.items():
                summary.add_scalar(k, float(v[-1]), global_step)
            dt = time.time() - t0
            logger.info(
                f"epoch {epoch} ({n_steps} steps, one launch) "
                f"loss {float(host['loss'][-1]):.4f} "
                f"({n_steps * batch_size / dt:.1f} samples/s, "
                f"{dt / n_steps * 1e3:.1f} ms/step)"
            )
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"profiler trace written to {args.profile}")
        else:
            for step_idx, dev_batch in enumerate(
                dev_cache
                if dev_cache is not None
                else prefetch_to_device(batches(), trainer.mesh, size=2)
            ):
                state, metrics = trainer.step_sharded(state, dev_batch)
                timer.tick()
                if profiling and step_idx >= 20:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info(f"profiler trace written to {args.profile}")
                pending_metrics.append(metrics)
                if step_idx % log_interval == 0:
                    drain_metrics()
                    global_step = epoch * steps_per_epoch + step_idx
                    for k, v in metrics.items():
                        summary.add_scalar(k, float(v), global_step)
                    logger.info(
                        f"epoch {epoch} step {step_idx}/{steps_per_epoch} "
                        f"loss {float(metrics['loss']):.4f} "
                        f"({timer.throughput(batch_size):.1f} samples/s, "
                        f"{timer.mean_step_time * 1e3:.1f} ms/step)"
                    )
                    # per-view overlay images every 5x interval (reference
                    # POEM.py:491-514 viz cadence)
                    if step_idx % (log_interval * 5) == 0 and "target_joints_2d" in dev_batch:
                        from ..viztools.draw import denormalize_image, draw_joints_2d

                        img0 = denormalize_image(np.asarray(dev_batch["image"][0, 0]))
                        gt0 = np.asarray(dev_batch["target_joints_2d"][0, 0])
                        summary.add_image(
                            "img/viz_joints_2d_train",
                            draw_joints_2d(img0, gt0),
                            global_step,
                            dataformats="HWC",
                        )
        drain_metrics()
        recorder.record_loss(loss_metric, epoch, comment="train")
        ckpt_freq = max(1, getattr(args, "ckpt_freq", 1))
        if (epoch + 1) % ckpt_freq == 0 or epoch == cfg.TRAIN.EPOCH - 1:
            recorder.record_checkpoint(state, epoch, snapshot_every=args.snapshot)
        loss_metric.reset()
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        # periodic validation (reference train_ddp.py:126-138, rank0-only
        # there; here the eval step is jitted like everything else)
        if "TEST" in cfg.DATASET and (epoch + 1) % args.eval_freq == 0:
            from ..training.evaluator import Evaluator

            if evaluator is None:
                # build once: a fresh Evaluator per epoch would re-jit its
                # eval step every time (minutes each on a tunneled chip)
                val_ds = create_dataset(
                    cfg.DATASET.TEST,
                    data_preset=cfg.DATA_PRESET,
                    is_train=False,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                )
                evaluator = Evaluator(
                    model, aux, center_idx=cfg.DATA_PRESET.CENTER_IDX
                )
            val_size = cfg.DATASET.TEST.get("EPOCH_SIZE", 1000)
            if val_feed is None and bool(cfg.DATASET.TEST.get("FIXED_SET", False)):
                # fixed val sets: transfer once, replay device-resident
                # across every periodic eval (same rationale as dev_cache)
                cached = [
                    {k: jnp.asarray(v) for k, v in b.items()}
                    for b in batch_iterator(val_ds, batch_size, args.view_max, val_size)
                ]
                if (
                    sum(v.nbytes for v in cached[0].values()) * len(cached)
                    <= FIXED_FEED_CACHE_CAP_BYTES
                ):
                    val_feed = cached
            results = evaluator.run(
                state.params,
                val_feed
                if val_feed is not None
                else batch_iterator(val_ds, batch_size, args.view_max, val_size),
            )
            recorder.record_metric(
                [f"{k}: {v:.6f}" for k, v in results.items()], epoch, comment="val"
            )
            logger.info(f"val epoch {epoch}: " + ", ".join(f"{k}={v:.4f}" for k, v in results.items()))

    logger.info("training finished")
    return state


if __name__ == "__main__":
    main()
