"""Disk cache for host-built setup artifacts (affine bases, facet blocks).

The reference's lifecycle compiles forms once per process and keeps them
alive (FFCx JIT cache on disk, dolfinx Functions in memory). Here the
analogous artifacts — affine design bases (assembly/affine.py), facet
operator blocks — are pure arrays determined by (mesh, form, non-design
parameters). They are rebuilt per PROCESS, and the driver benchmark
deliberately isolates its scale point and cross-checks in child processes
(bench.py), so without a disk layer each child re-pays minutes of 1-core
host assembly. This module gives those artifacts the same
build-once-reuse-everywhere lifecycle as the XLA compile cache
(femo_alpha_tpu/__init__.py).

Safety: keys include a CODE fingerprint (file sizes+mtimes of the
femo_alpha_tpu source tree) so editing any kernel invalidates every
entry, and the caller's own content hash covers mesh/parameters. Entries
are plain .npz files under FEMO_SETUP_CACHE_DIR
(default /root/.cache/femo_setup). Disable with FEMO_SETUP_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

_CODE_FP = {}

# Which source subtrees determine each artifact kind's VALUES. A whole-tree
# fingerprint invalidates ~10 GB of host-assembled bases for an edit to
# bench.py or a solver loop that cannot change them (round 4: every solver
# tweak re-paid minutes of 1-core 988k-dof basis assembly). Content hashes
# (not mtimes): touching a file without changing it keeps the cache warm.
# Kinds not listed fall back to the whole tree.
_KIND_DIRS = {
    # affine design bases / facet operator blocks: produced by the
    # element/assembly/form stack
    "affine": ("assembly", "elements", "mesh", "spaces", "models",
               "solvers/dfloat.py", "config.py", "__init__.py"),
    "facetops": ("assembly", "elements", "mesh", "spaces", "models",
                 "solvers/dfloat.py", "config.py", "__init__.py"),
    # hostloop telemetry: performance HINTS only (every influenced value is
    # re-verified against measured truth) — version manually via _SCHEMA
    "hloop": ("adjoint/hostloop.py",),
}


def _code_fingerprint(kind: str = "") -> str:
    scope = _KIND_DIRS.get(kind)
    key = scope or "ALL"
    fp = _CODE_FP.get(key)
    if fp is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".py", ".cpp", ".so")):
                    continue
                p = os.path.join(dirpath, fn)
                rel = os.path.relpath(p, root)
                if scope is not None and not rel.startswith(scope):
                    continue
                try:
                    with open(p, "rb") as f:
                        h.update(rel.encode())
                        h.update(hashlib.sha1(f.read()).digest())
                except OSError:
                    continue
        fp = h.hexdigest()[:16]
        _CODE_FP[key] = fp
    return fp


def enabled() -> bool:
    return os.environ.get("FEMO_SETUP_CACHE", "1") != "0"


def _dir() -> str:
    d = os.environ.get("FEMO_SETUP_CACHE_DIR", "/root/.cache/femo_setup")
    os.makedirs(d, exist_ok=True)
    return d


def _path(kind: str, key: str) -> str:
    full = hashlib.sha1(
        f"{kind}|{key}|{_code_fingerprint(kind)}".encode()).hexdigest()
    return os.path.join(_dir(), f"{kind}-{full}.npz")


def load(kind: str, key: str):
    """List of numpy arrays previously stored under (kind, key), or None."""
    if not enabled():
        return None
    p = _path(kind, key)
    try:
        with np.load(p) as z:
            return [z[f"a{i}"] for i in range(int(z["n"]))]
    except Exception:
        return None


def store(kind: str, key: str, arrays) -> None:
    """Store a list of numpy arrays under (kind, key). Best-effort: any
    failure (disk full, races) leaves the cache cold, never corrupt —
    writes go to a temp file renamed into place atomically."""
    if not enabled():
        return
    p = _path(kind, key)
    tmp = p + f".tmp{os.getpid()}"
    try:
        payload = {f"a{i}": np.asarray(a) for i, a in enumerate(arrays)}
        payload["n"] = np.asarray(len(arrays))
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, p)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
