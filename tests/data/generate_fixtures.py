"""Regenerate the committed mesh fixtures (deterministic).

The reference ships its aircraft/plate meshes as git-lfs pointer stubs
(no payload in the snapshot), so these generated equivalents stand in at
the same scales:
  c172_like_wing_648.msh   — gmsh v2.2, 648 quads (c172_650.msh scale)
  pav_like_wing_2388.msh   — gmsh v4.1, 2388 quads incl. 6 rib stations
                             (pav_wing_...2374_quad.xdmf scale)
  plate_2_10_quad_10_50.xdmf/.h5 — dolfinx-layout XDMF plate
                             (plate_2_10_quad_10_50.xdmf twin)

Run:  python tests/data/generate_fixtures.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from femo_alpha_tpu.mesh import createRectangleMesh, createWingShellMesh
from femo_alpha_tpu.io.gmsh import write_msh
from femo_alpha_tpu.io.xdmf import write_xdmf_mesh


def main():
    import numpy as np

    wing_small = createWingShellMesh(n_chord=10, n_span=32,
                                     rib_stations=(16,), shuffle_seed=1)
    tags = np.ones(wing_small.n_cells, dtype=np.int64)
    tags[wing_small.cell_tags[2]] = 2
    write_msh(os.path.join(HERE, "c172_like_wing_648.msh"), wing_small,
              version="2.2", cell_tags=tags,
              physical_names={1: "skin", 2: "rib"})

    wing_big = createWingShellMesh(n_chord=16, n_span=72,
                                   rib_stations=(12, 24, 36, 48, 60, 72),
                                   shuffle_seed=2)
    tags = np.ones(wing_big.n_cells, dtype=np.int64)
    tags[wing_big.cell_tags[2]] = 2
    write_msh(os.path.join(HERE, "pav_like_wing_2388.msh"), wing_big,
              version="4.1", cell_tags=tags,
              physical_names={1: "skin", 2: "rib"})

    plate = createRectangleMesh(10, 50, (0.0, 0.0), (2.0, 10.0), "quad",
                                gdim=3, structured=False)
    write_xdmf_mesh(os.path.join(HERE, "plate_2_10_quad_10_50.xdmf"), plate)
    print("fixtures written:", wing_small, wing_big, plate)


if __name__ == "__main__":
    main()
