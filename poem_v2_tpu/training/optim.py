"""Optimizer + LR schedule builders (optax).

Parity with reference ``build_optimizer`` / ``build_scheduler`` /
``clip_gradient`` (lib/utils/net_utils.py:58-133): adam/adamw/sgd,
StepLR / MultiStepLR / cosine (per-step cosine with T_max = total
steps, matching scripts/train_ddp.py:112-116), L2 grad clipping.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax


def clip_by_per_param_norm(
    max_norm: float, norm_type: float = 2.0
) -> optax.GradientTransformation:
    """Clip every parameter tensor's p-norm to ``max_norm`` individually.

    Reference semantics: ``clip_gradient`` (lib/utils/net_utils.py:123-133)
    loops over parameters calling ``torch.nn.utils.clip_grad_norm_`` on
    each one — far more aggressive than a single global-norm clip.  Torch's
    formula per tensor: ``coef = max_norm / (norm + 1e-6)``, applied only
    when ``coef < 1``.
    """

    def clip_leaf(g):
        g32 = g.astype(jnp.float32)
        if norm_type == float("inf"):
            norm = jnp.max(jnp.abs(g32))
        else:
            norm = jnp.sum(jnp.abs(g32) ** norm_type) ** (1.0 / norm_type)
        coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
        return (g32 * coef).astype(g.dtype)

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


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
        get = clip.get if hasattr(clip, "get") else (lambda k, d=None: d)
        norm = get("NORM", 1.0)
        norm_type = float(get("TYPE", 2))
        # reference default = per-parameter clipping (net_utils.py:123-133);
        # MODE: global opts into the single global-norm clip instead
        if get("MODE", "per_param") == "global":
            chain.append(optax.clip_by_global_norm(norm))
        else:
            chain.append(clip_by_per_param_norm(norm, norm_type))
    chain.append(opt)
    tx = optax.chain(*chain)

    # optional gradient accumulation (absent in the reference, SURVEY §2.3)
    accum = cfg.get("GRAD_ACCUM_STEPS", 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
    return tx
