"""Shared timed-window helper for the perf decomposition scripts.

One implementation of the measurement methodology bench.py uses
(warm + small-slice device barrier + best-of-reps), so a methodology fix
lands in every perf script at once. The small-slice fetch of the LAST
output is the true device barrier on the axon tunnel
(jax.block_until_ready is unreliable there — CLAUDE.md).
"""
from __future__ import annotations

import time

import numpy as np

import jax

__all__ = ["timed"]


def _barrier(out):
    """Fetch 8 elements of the last leaf — forces completion in-order."""
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:8])


def timed(name, fn, *args, reps: int = 10, jit: bool = False,
          width: int = 12):
    """Best-of-`reps` wall time of fn(*args) with warm-up.

    Returns (name, ms). Pass jit=True to jax.jit fn first (callers that
    hand a pre-jitted/compiled callable leave it False).
    """
    if jit:
        fn = jax.jit(fn)
    _barrier(fn(*args))                      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _barrier(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:{width}s} {best * 1e3:8.2f} ms", flush=True)
    return name, best * 1e3
