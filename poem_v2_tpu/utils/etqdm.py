"""Process-0-gated progress bars (reference lib/utils/etqdm.py).

Non-master processes iterate silently; without tqdm installed this
degrades to a plain iterator.
"""

from __future__ import annotations


def etqdm(iterable, **kwargs):
    try:
        import jax

        master = jax.process_index() == 0
    except Exception:
        master = True
    if not master:
        return iterable
    try:
        from tqdm import tqdm

        kwargs.setdefault("dynamic_ncols", True)
        return tqdm(iterable, **kwargs)
    except Exception:
        return iterable
