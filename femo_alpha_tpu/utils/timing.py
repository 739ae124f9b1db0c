"""Wall-clock timing helpers (parity with the reference's timeit reporting,
utils_dolfinx.py:339-352). Blocks on device work so timings are honest.

Tunnel caveat (measured 2026-08-18 on the axon TPU platform): in a fresh
process, dispatch is queued lazily and ``jax.block_until_ready`` returns
BEFORE the queued programs execute — until the first device->host transfer
flushes the FIFO stream, after which the stream is eager and
``block_until_ready`` is reliable. Any timing taken in the lazy regime
under-measures by the full kernel time. ``ensure_eager_stream()`` performs
that first flush once per process; ``sync(tree)`` additionally fetches one
scalar element to host after blocking, which is regime-proof (costs one
~24 ms tunnel round trip — negligible against the >100 ms workloads we
time, and zero off the tunnel).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from .logging import log

_eager = False


def ensure_eager_stream() -> None:
    """Flush the device command queue once per process via a real
    device->host transfer, so subsequent ``block_until_ready`` calls
    actually wait for execution (see module docstring)."""
    global _eager
    if _eager:
        return
    np.asarray(jax.device_put(np.zeros(())) + 0.0)
    _eager = True


def sync(tree):
    """Honest timing barrier: block on ``tree`` and force a device->host
    transfer of one scalar element so queued-but-unflushed work cannot be
    missed. Returns ``tree``."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(jax.numpy.ravel(leaf)[:1])
            break
    return tree


class Timer:
    def __init__(self, name="", report=True):
        self.name = name
        self.report = report
        self.elapsed = None

    def __enter__(self):
        ensure_eager_stream()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # drain the device queue so the timing covers enqueued work
        np.asarray(jax.device_put(np.zeros(())) + 0.0)
        self.elapsed = time.perf_counter() - self.t0
        if self.report:
            log(f"{self.name}: {self.elapsed:.4f} s")
        return False


def block_until_ready(tree):
    return jax.block_until_ready(tree)
