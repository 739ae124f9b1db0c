"""Mesh I/O: gmsh .msh (v2.2 + v4.1) and XDMF readers/writers.

Covers the reference's readFEAMesh/import_mesh surface
(utils_dolfinx.py:34-128). The reference's own shipped meshes are git-lfs
pointer stubs (no payload in the snapshot), so format coverage is by
write->read roundtrips plus the committed generated fixtures at the same
scales (c172-like 648 quads, pav-like 2388 quads incl. ribs, dolfinx-layout
XDMF plate)."""

import os

import numpy as np
import pytest

from femo_alpha_tpu.mesh import (
    Mesh,
    createRectangleMesh,
    createWingShellMesh,
    readFEAMesh,
)
from femo_alpha_tpu.io.gmsh import read_msh, write_msh
from femo_alpha_tpu.io.xdmf import read_xdmf_mesh, write_xdmf_mesh

DATA = os.path.join(os.path.dirname(__file__), "data")


def _rand_mesh(seed=0, cell_type="quad"):
    m = createRectangleMesh(4, 3, (0, 0), (2.0, 1.5), cell_type, gdim=3,
                            structured=False)
    rng = np.random.default_rng(seed)
    coords = np.asarray(m.coords).copy()
    coords[:, 2] = rng.standard_normal(len(coords)) * 0.1
    return Mesh(coords, m.conn, cell_type)


@pytest.mark.parametrize("version", ["2.2", "4.1"])
@pytest.mark.parametrize("cell_type", ["quad", "triangle"])
def test_msh_roundtrip(tmp_path, version, cell_type):
    m = _rand_mesh(cell_type=cell_type)
    tags = np.ones(m.n_cells, dtype=np.int64)
    tags[m.n_cells // 2:] = 7
    path = str(tmp_path / f"rt_{version}_{cell_type}.msh")
    write_msh(path, m, version=version, cell_tags=tags,
              physical_names={1: "a", 7: "b"})
    r = read_msh(path)
    assert r.cell_type == cell_type
    assert r.n_nodes == m.n_nodes and r.n_cells == m.n_cells
    np.testing.assert_allclose(r.coords, m.coords, rtol=0, atol=1e-14)
    np.testing.assert_array_equal(r.conn, m.conn)
    assert set(r.cell_tags) == {1, 7}
    np.testing.assert_array_equal(r.cell_tags[7],
                                  np.arange(m.n_cells // 2, m.n_cells))
    assert r.physical_names[7] == "b"


def test_msh_lfs_stub_raises(tmp_path):
    p = tmp_path / "stub.msh"
    p.write_text("version https://git-lfs.github.com/spec/v1\n"
                 "oid sha256:abc\nsize 1234\n")
    with pytest.raises(ValueError, match="git-lfs"):
        read_msh(str(p))


def test_read_committed_msh_fixtures():
    small = readFEAMesh(os.path.join(DATA, "c172_like_wing_648.msh"))
    assert small.cell_type == "quad"
    assert small.n_cells == 648 and small.n_nodes == 660
    assert set(small.cell_tags) == {1, 2}
    assert len(small.cell_tags[2]) == 8  # one rib ladder (n_chord-2)

    big = readFEAMesh(os.path.join(DATA, "pav_like_wing_2388.msh"))
    assert big.n_cells == 2388
    assert len(big.cell_tags[2]) == 6 * 14  # six ribs
    # regenerate and compare geometry exactly (deterministic generator)
    ref = createWingShellMesh(n_chord=16, n_span=72,
                              rib_stations=(12, 24, 36, 48, 60, 72),
                              shuffle_seed=2)
    np.testing.assert_allclose(big.coords, ref.coords, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(big.conn, ref.conn)


def test_xdmf_mesh_roundtrip(tmp_path):
    m = _rand_mesh(seed=3)
    for inline in (False, True):
        path = str(tmp_path / f"rt_{inline}.xdmf")
        write_xdmf_mesh(path, m, inline=inline)
        r = read_xdmf_mesh(path)
        assert r.n_nodes == m.n_nodes and r.n_cells == m.n_cells
        np.testing.assert_allclose(r.coords, m.coords, rtol=0, atol=1e-14)
        np.testing.assert_array_equal(r.conn, m.conn)


def test_read_committed_xdmf_plate():
    m = readFEAMesh(os.path.join(DATA, "plate_2_10_quad_10_50.xdmf"))
    assert m.cell_type == "quad"
    assert m.n_cells == 500 and m.n_nodes == 561
    assert m.coords[:, 0].max() == 2.0 and m.coords[:, 1].max() == 10.0


def test_wing_mesh_topology():
    """Closed tube skin: exterior facets are exactly the root + tip loops;
    rib junction edges are non-manifold (3 incident cells) and interior."""
    nl = 2 * 10
    m = createWingShellMesh(n_chord=10, n_span=32, rib_stations=(16,),
                            shuffle_seed=1)
    m._build_topology()
    # root loop + tip loop + the rib ladder's two end verticals (the rib
    # spans chord positions 1..n_chord-1, so its first/last vertical edge
    # has a single incident cell)
    assert m.n_ext_facets == 2 * nl + 2
    # all cells have positive area (non-degenerate quads)
    cc = m.cell_coords()
    e1 = cc[:, 1] - cc[:, 0]
    e2 = cc[:, 3] - cc[:, 0]
    area = np.linalg.norm(np.cross(e1, e2), axis=1)
    assert area.min() > 1e-9
    # root facet tag covers the whole root loop
    assert len(m.facet_tags[100]) == nl
    # rib junction edges recorded
    assert len(m.facet_tags[200]) == 2 * 8


def test_wing_mesh_assembles():
    """A loaded wing mesh flows into the shell PDE and assembles a finite
    residual (smoke: the unstructured quad path end-to-end)."""
    import jax.numpy as jnp

    from femo_alpha_tpu.models.rm_shell.pde import RMShellPDE

    m = readFEAMesh(os.path.join(DATA, "c172_like_wing_648.msh"))
    pde = RMShellPDE(m, element_wise_material=True)
    form = pde.make_residual_form()
    from femo_alpha_tpu.assembly.assemble import assemble_residual

    nel = m.n_cells
    u = jnp.zeros(pde.W.n_dofs)
    params = {
        "thickness": jnp.full(nel, 0.01),
        "E": jnp.full(nel, 7.0e10),
        "nu": jnp.full(nel, 0.3),
        "uhat": jnp.zeros(pde.VU.n_dofs),
        "F_solid": jnp.zeros(pde.VF.n_dofs).at[2::3].set(100.0),
    }
    r = assemble_residual(form, u, params)
    assert np.all(np.isfinite(np.asarray(r)))
    assert float(jnp.linalg.norm(r)) > 0.0


def test_msh_reorder_maps_are_file_positions(tmp_path):
    """The CADDEE-contract maps must hold 0-based FILE POSITIONS (caller
    arrays are indexed by file row), NOT raw gmsh tags: with scrambled,
    non-contiguous 1-based node tags and shuffled elements, solving on the
    .msh mesh with file-ordered inputs must exactly match an identity-map
    in-memory mesh built from the same file-ordered data. (Regression: raw
    tags silently shifted every per-node/per-cell input by one.)"""
    import jax.numpy as jnp
    from femo_alpha_tpu.mesh import Mesh
    from femo_alpha_tpu.models import RMShellModel

    rng = np.random.default_rng(5)
    nxn, nyn = 5, 3  # 4x2 quads
    xs, ys = np.linspace(0, 2, nxn), np.linspace(0, 1, nyn)
    grid = np.array([[x, y, 0.0] for y in ys for x in xs])
    nn = len(grid)
    file_perm = rng.permutation(nn)  # node order in the FILE
    coords_file = grid[file_perm]
    # scrambled, NON-CONTIGUOUS tags (legal in gmsh)
    tags = (rng.permutation(nn) * 3 + 7).astype(int)
    row_of_grid = np.empty(nn, dtype=int)
    row_of_grid[file_perm] = np.arange(nn)

    def gid(i, j):
        return j * nxn + i

    quads_grid = [[gid(i, j), gid(i + 1, j), gid(i + 1, j + 1), gid(i, j + 1)]
                  for j in range(nyn - 1) for i in range(nxn - 1)]
    rng.shuffle(quads_grid)  # element order in the FILE
    conn_file_rows = np.array([[row_of_grid[v] for v in q]
                               for q in quads_grid])

    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$Nodes", str(nn)]
    for r in range(nn):
        x, y, z = coords_file[r]
        lines.append(f"{tags[r]} {x} {y} {z}")
    lines += ["$EndNodes", "$Elements", str(len(quads_grid))]
    for e, q in enumerate(quads_grid):
        node_tags = " ".join(str(tags[row_of_grid[v]]) for v in q)
        lines.append(f"{e + 101} 3 2 1 1 {node_tags}")
    lines += ["$EndElements"]
    path = os.path.join(tmp_path, "scrambled.msh")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    m = readFEAMesh(path)
    igi = np.asarray(m.input_global_indices)
    oci = np.asarray(m.original_cell_index)
    assert sorted(igi.tolist()) == list(range(nn))
    assert sorted(oci.tolist()) == list(range(len(quads_grid)))
    # mesh.coords[i] must be the file row igi[i]
    assert np.allclose(np.asarray(m.coords), coords_file[igi])

    # end-to-end: same physics on an identity-map in-memory mesh built
    # from the file-ordered data; inputs supplied in FILE order
    m2 = Mesh(coords_file, conn_file_rows.astype(np.int32), "quad")
    p_file = np.zeros((nn, 3))
    p_file[:, 2] = 1.0e3 * (1.0 + coords_file[:, 0])
    th_file = 0.05 + 0.03 * rng.random(len(quads_grid))
    kw = dict(E=jnp.full(len(quads_grid), 7e10),
              nu=jnp.full(len(quads_grid), 0.3),
              density=jnp.full(len(quads_grid), 2700.0))

    def bc(x):
        return x[:, 0] < 1e-9

    out_a = RMShellModel(m, shell_bc_func=bc, element_wise_material=True
                         ).evaluate(jnp.asarray(p_file),
                                    jnp.asarray(th_file), **kw)
    out_b = RMShellModel(m2, shell_bc_func=bc, element_wise_material=True
                         ).evaluate(jnp.asarray(p_file),
                                    jnp.asarray(th_file), **kw)
    assert np.isclose(float(out_a.compliance), float(out_b.compliance),
                      rtol=1e-12)
    assert np.isclose(float(out_a.mass), float(out_b.mass), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_a.disp_extracted),
                               np.asarray(out_b.disp_extracted),
                               rtol=0, atol=1e-12)
