"""Topology kernels: native (C++) with identical numpy fallbacks."""

from __future__ import annotations

import ctypes

import numpy as np

from .loader import get_lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_edges(conn, local_edges):
    """(edges (n_e,2), cell_edges (nc, n_le), counts (n_e,)) — unique edges
    with sorted vertex pairs in lexicographic order."""
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    le = np.ascontiguousarray(local_edges, dtype=np.int32)
    nc, nv = conn.shape
    n_le = le.shape[0]
    lib = get_lib()
    if lib is not None:
        max_e = nc * n_le
        edges = np.empty((max_e, 2), dtype=np.int32)
        cell_edges = np.empty((nc, n_le), dtype=np.int32)
        counts = np.empty(max_e, dtype=np.int32)
        n_e = lib.build_edges(
            _i32p(conn), nc, nv, _i32p(le), n_le,
            _i32p(edges), _i32p(cell_edges), _i32p(counts),
        )
        return edges[:n_e].copy(), cell_edges, counts[:n_e].copy()
    # numpy fallback (identical semantics)
    pairs = conn[:, le]  # (nc, n_le, 2)
    key = np.sort(pairs.reshape(-1, 2), axis=1)
    uniq, inv, counts = np.unique(key, axis=0, return_inverse=True,
                                  return_counts=True)
    return (
        uniq.astype(np.int32),
        inv.reshape(nc, n_le).astype(np.int32),
        counts.astype(np.int32),
    )


def build_csr_pattern(dofmap, n_dofs):
    """(perm, seg, rows, cols) for CSR assembly (see assembly/sparse.py)."""
    dofmap = np.ascontiguousarray(dofmap, dtype=np.int32)
    nc, nd = dofmap.shape
    lib = get_lib()
    if lib is not None:
        total = nc * nd * nd
        perm = np.empty(total, dtype=np.int32)
        seg = np.empty(total, dtype=np.int32)
        rows = np.empty(total, dtype=np.int32)
        cols = np.empty(total, dtype=np.int32)
        nnz = lib.build_csr_pattern(
            _i32p(dofmap), nc, nd, n_dofs,
            _i32p(perm), _i32p(seg), _i32p(rows), _i32p(cols),
        )
        return perm, seg, rows[:nnz].copy(), cols[:nnz].copy()
    rows = np.repeat(dofmap, nd, axis=1).reshape(-1)
    cols = np.tile(dofmap, (1, nd)).reshape(-1)
    key = rows.astype(np.int64) * n_dofs + cols
    perm = np.argsort(key, kind="stable").astype(np.int32)
    sk = key[perm]
    uniq, seg = np.unique(sk, return_inverse=True)
    return (
        perm,
        seg.astype(np.int32),
        (uniq // n_dofs).astype(np.int32),
        (uniq % n_dofs).astype(np.int32),
    )


def rcm_order(edges, n_nodes):
    """Reverse Cuthill-McKee permutation (new -> old) of the node graph."""
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        perm = np.empty(n_nodes, dtype=np.int32)
        lib.rcm_order(_i32p(edges), len(edges), n_nodes, _i32p(perm))
        return perm
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    data = np.ones(len(edges))
    g = sp.csr_matrix(
        (data, (edges[:, 0], edges[:, 1])), shape=(n_nodes, n_nodes))
    return np.asarray(
        reverse_cuthill_mckee(g + g.T), dtype=np.int32)
