"""Persistent XLA compilation cache for the CLI entry points.

The tunneled TPU pays minutes of compile latency for the large train /
eval programs (the HRNet-B16 eval program alone takes minutes; the
parametric train step longer). ``bench.py`` has always pinned a
repo-local persistent cache for this reason; the train/eval CLIs reuse
the same directory so an interrupted run's ``--resume`` relaunch — the
reference lifecycle's recovery path (scripts/train_ddp.py:96-151) —
does not repay the compile.

Opt out with POEM_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile
time itself).
"""

from __future__ import annotations

import os


def enable_persistent_cache(root: str | None = None) -> str | None:
    """Point jax at the repo-local ``.jax_cache`` dir. Idempotent."""
    if os.environ.get("POEM_NO_COMPILE_CACHE"):
        return None
    import jax

    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.path.join(root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
