"""Checkpoint / warm-start persistence.

Parity & upgrade over the reference's ad-hoc persistence (SURVEY.md §5:
.npy histories plate_sim.py:357-359, csdl.inline_import warm starts):
a single npz file holding named arrays (designs, states, histories) with a
tiny JSON-able metadata dict."""

from __future__ import annotations

import json

import numpy as np


def save_checkpoint(path, arrays: dict, metadata: dict | None = None):
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    payload["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_checkpoint(path):
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    meta = {}
    arrays = {}
    for k in data.files:
        if k == "__metadata__":
            meta = json.loads(bytes(data[k]).decode())
        else:
            arrays[k] = data[k]
    return arrays, meta
