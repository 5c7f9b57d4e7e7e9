"""Measurement helpers that are robust to lazy/async dispatch.

On some PJRT transports (notably tunneled remote TPUs), buffers report
ready without forcing execution, repeated identical calls may be
deduplicated, and EVERY dispatch pays a multi-ms host round-trip — so
wall-clock around ``block_until_ready`` measures nothing and per-call
loops measure mostly the tunnel (a 0.6 ms kernel reads as 5+ ms).

The only reliable bracket: run the WHOLE iteration loop on device in a
single program (``lax.fori_loop``), with each iteration data-dependent
on the loop carry so XLA cannot hoist the body, and fetch one scalar at
the end. One dispatch, one fetch, amortized over all iterations.
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
    """Seconds/iter with a host-side data-dependent chain + final fetch.

    Includes per-dispatch transport overhead — prefer :func:`time_fn`
    (on-device loop) for kernel timing; keep this for code that must
    observe per-call host behaviour.
    """
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


def _tap(out) -> jnp.ndarray:
    # tap EVERY numeric leaf: an int-only output (e.g. top_k indices) with
    # no float tap would leave the loop body independent of the carry and
    # XLA hoists the whole computation — the "measurement" reads ~0
    leaves = [
        l for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)
    ]
    return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)


def time_fn(fn: Callable, *args, iters: int = 20) -> float:
    """Seconds/iter of ``fn(*args)``: one on-device fori_loop, one fetch.

    Each iteration perturbs one input leaf by ``carry * 1e-30`` (a bitwise
    no-op on O(1) data but a real data dependence), so the compiler must
    re-execute the body ``iters`` times; the single final scalar fetch
    forces the whole chain.
    """
    flat, treedef = jax.tree_util.tree_flatten(args)
    pidx = None
    for i, l in enumerate(flat):
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact):
            pidx = i
            break

    if pidx is None:
        # no float input to thread the dependence through: host-side chain
        @jax.jit
        def step(carry, *a):
            return carry + _tap(fn(*a)) * 1e-30, None

        return chained_time(step, jnp.zeros((), jnp.float32), args, iters)

    @jax.jit
    def many(carry, flat):
        def body(_, c):
            f2 = list(flat)
            f2[pidx] = f2[pidx] + (c * 1e-30).astype(f2[pidx].dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, f2))
            return c + _tap(out) * 1e-30

        return jax.lax.fori_loop(0, iters, body, carry)

    # warmup: compile + one full execution, result fetched
    _ = float(many(jnp.zeros((), jnp.float32), flat))
    t0 = time.perf_counter()
    _ = float(many(jnp.zeros((), jnp.float32), flat))
    dt = time.perf_counter() - t0
    return dt / iters
