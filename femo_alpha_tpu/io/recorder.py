"""Recorder: per-optimizer-iteration state recording.

Parity with the reference's createRecorder + record machinery
(fea_dolfinx.py:209-222, state_operation.py:104-127): each recorded variable
gets an XDMF time series keyed by opt iteration, written only outside JAX
traces."""

from __future__ import annotations

import numpy as np

from .xdmf import XDMFWriter


class Recorder:
    def __init__(self, path, mesh):
        self.path = str(path)
        self.mesh = mesh
        self.writers = {}
        self.opt_iter = 0

    def record(self, name, values, center="Node"):
        import jax.core

        if isinstance(values, jax.core.Tracer):
            return  # inside a trace: skip silently (reference records inline)
        if name not in self.writers:
            self.writers[name] = XDMFWriter(
                f"{self.path}/record_{name}.xdmf", self.mesh)
        self.writers[name].write_function(
            name, np.asarray(values), time=float(self.opt_iter),
            center=center)

    def step(self):
        self.opt_iter += 1

    def close(self):
        for w in self.writers.values():
            w.close()
