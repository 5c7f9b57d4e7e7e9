"""Optimizer + LR schedule builders (optax).

Parity with reference ``build_optimizer`` / ``build_scheduler`` /
``clip_gradient`` (lib/utils/net_utils.py:58-133): adam/adamw/sgd,
StepLR / MultiStepLR / cosine (per-step cosine with T_max = total
steps, matching scripts/train_ddp.py:112-116), L2 grad clipping.
"""

from __future__ import annotations


import optax


def build_schedule(cfg, steps_per_epoch: int) -> optax.Schedule:
    sched = cfg.get("SCHEDULER", "StepLR")
    lr = cfg.LR
    if sched in ("StepLR", "MultiStepLR"):
        decay_steps = cfg.get("LR_DECAY_STEP", [7])
        if isinstance(decay_steps, int):
            decay_steps = [decay_steps]
        gamma = cfg.get("LR_DECAY_GAMMA", 0.1)
        boundaries = {int(e) * steps_per_epoch: gamma for e in decay_steps}
        return optax.piecewise_constant_schedule(lr, boundaries)
    if sched in ("CosineLR", "cosine", "CosineAnnealingLR"):
        total = cfg.EPOCH * steps_per_epoch
        end = cfg.get("LR_MIN", 0.0)
        return optax.cosine_decay_schedule(lr, total, alpha=end / lr if lr else 0.0)
    if sched in ("constant", "none"):
        return optax.constant_schedule(lr)
    raise ValueError(f"unknown scheduler {sched!r}")


def build_optimizer(cfg, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    schedule = build_schedule(cfg, steps_per_epoch)
    name = cfg.get("OPTIMIZER", "adam").lower()
    wd = cfg.get("WEIGHT_DECAY", 0.0)
    if name == "adam":
        opt = optax.adam(schedule) if not wd else optax.adamw(schedule, weight_decay=wd)
    elif name == "adamw":
        opt = optax.adamw(schedule, weight_decay=wd)
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=cfg.get("MOMENTUM", 0.9))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    if cfg.get("GRAD_CLIP_ENABLED", True):
        clip = cfg.get("GRAD_CLIP", {})
        norm = clip.get("NORM", 1.0) if hasattr(clip, "get") else 1.0
        chain.append(optax.clip_by_global_norm(norm))
    chain.append(opt)
    tx = optax.chain(*chain)

    # optional gradient accumulation (absent in the reference, SURVEY §2.3)
    accum = cfg.get("GRAD_ACCUM_STEPS", 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
    return tx
