"""Wall-clock timing helper (parity with the reference's timeit reporting,
utils_dolfinx.py:339-352). Blocks on device work so timings are honest."""

from __future__ import annotations

import time

import jax

from .logging import log


class Timer:
    def __init__(self, name="", report=True):
        self.name = name
        self.report = report
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # drain the device queue so the timing covers enqueued work
        jax.device_put(0.0).block_until_ready()
        self.elapsed = time.perf_counter() - self.t0
        if self.report:
            log(f"{self.name}: {self.elapsed:.4f} s")
        return False


def block_until_ready(tree):
    return jax.block_until_ready(tree)
