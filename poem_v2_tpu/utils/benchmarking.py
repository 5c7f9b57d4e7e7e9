"""Measurement helpers that are robust to lazy/async dispatch.

On some PJRT transports (notably tunneled remote TPUs), buffers report
ready without forcing execution and repeated identical calls may be
deduplicated — so wall-clock around ``block_until_ready`` measures
nothing. The only reliable bracket is: chain each iteration on the
previous result, then fetch a scalar derived from the final output to
the host.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def chained_time(
    step: Callable,  # (carry, *args) -> (new_carry, out)
    init_carry,
    args: Tuple,
    iters: int,
    reduce_fn: Callable = None,
) -> float:
    """Seconds per iteration with a data-dependent chain + final fetch."""
    reduce_fn = reduce_fn or jax.jit(lambda c: jnp.sum(c))
    # warmup (forces compile + one real execution)
    carry = init_carry
    carry, _ = step(carry, *args)
    _ = float(reduce_fn(carry))

    carry = init_carry
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, _ = step(carry, *args)
    _ = float(reduce_fn(carry))
    return (time.perf_counter() - t0) / iters


def time_fn(fn: Callable, *args, iters: int = 20) -> float:
    """Time a jitted fn whose output feeds the next call via a scalar tap."""

    @jax.jit
    def step(carry, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        tap = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        return carry + tap * 1e-30, out

    return chained_time(step, jnp.zeros((), jnp.float32), args, iters)
