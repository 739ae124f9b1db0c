"""Native C++ meshops vs numpy fallback equivalence."""

import numpy as np
import pytest

from femo_alpha_tpu.native import (
    build_csr_pattern,
    build_edges,
    native_available,
    rcm_order,
)
from femo_alpha_tpu.native import topology as topo
from femo_alpha_tpu.mesh import LOCAL_EDGES, createUnitSquareMesh


def _numpy_edges(conn, le):
    pairs = conn[:, le]
    key = np.sort(pairs.reshape(-1, 2), axis=1)
    uniq, inv, counts = np.unique(key, axis=0, return_inverse=True,
                                  return_counts=True)
    return uniq, inv.reshape(conn.shape[0], le.shape[0]), counts


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_edges_match_numpy():
    mesh = createUnitSquareMesh(13, 7, "triangle")
    le = LOCAL_EDGES["triangle"]
    e1, ce1, c1 = build_edges(mesh.conn, le)
    e2, ce2, c2 = _numpy_edges(mesh.conn, le)
    assert np.array_equal(e1, e2)
    assert np.array_equal(ce1, ce2)
    assert np.array_equal(c1, c2)


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_csr_pattern_matches_numpy():
    mesh = createUnitSquareMesh(4, 3, "quad")
    from femo_alpha_tpu.spaces import FunctionSpace

    V = FunctionSpace(mesh, "P", 2)
    perm1, seg1, rows1, cols1 = build_csr_pattern(V.dofmap, V.n_dofs)
    # force numpy fallback
    lib = topo.get_lib
    try:
        topo.get_lib = lambda: None
        perm2, seg2, rows2, cols2 = build_csr_pattern(V.dofmap, V.n_dofs)
    finally:
        topo.get_lib = lib
    assert np.array_equal(rows1, rows2)
    assert np.array_equal(cols1, cols2)
    assert np.array_equal(seg1, seg2)
    # perms may differ among equal keys; the assembled data must agree
    key1 = np.sort(perm1)
    key2 = np.sort(perm2)
    assert np.array_equal(key1, key2)


def test_rcm_valid_and_effective_on_shuffled_mesh():
    mesh = createUnitSquareMesh(20, 20, "triangle")
    mesh._build_topology()
    perm = rcm_order(mesh.edges, mesh.n_nodes)
    assert sorted(perm.tolist()) == list(range(mesh.n_nodes))
    # RCM must fix a randomly shuffled numbering (structured numbering is
    # already near-optimal, so test against a scrambled graph)
    rng = np.random.default_rng(0)
    shuf = rng.permutation(mesh.n_nodes).astype(np.int32)
    edges_shuf = shuf[mesh.edges]
    perm2 = rcm_order(edges_shuf, mesh.n_nodes)
    inv = np.empty_like(perm2)
    inv[perm2] = np.arange(len(perm2))
    bw_shuf = np.abs(edges_shuf[:, 0] - edges_shuf[:, 1]).max()
    bw_rcm = np.abs(
        inv[edges_shuf[:, 0]] - inv[edges_shuf[:, 1]]).max()
    assert bw_rcm < 0.3 * bw_shuf
