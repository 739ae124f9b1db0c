"""CSR sparsity pattern precomputed on host; device assembly by segment_sum.

Used for preconditioner construction, dense/host reference checks, and
export. The main operator path stays matrix-free (make_matvec) because
batched dense element matmuls map better onto the MXU than irregular sparse
ops. Replaces PETSc Mat assembly (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .assemble import gather_1d


class CSRPattern:
    def __init__(self, dofmap, n_dofs):
        from ..native import build_csr_pattern

        dofmap = np.asarray(dofmap)
        order, seg, row_ids, cols = build_csr_pattern(dofmap, n_dofs)
        self.n = n_dofs
        self.nnz = len(cols)
        self.indices = cols
        self.row_ids = row_ids
        counts = np.bincount(self.row_ids, minlength=n_dofs)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        # device side
        self.perm_d = jnp.asarray(order.astype(np.int32))
        self.seg_d = jnp.asarray(seg.astype(np.int32))
        self.row_ids_d = jnp.asarray(self.row_ids)
        self.indices_d = jnp.asarray(self.indices)

    def assemble(self, Ae):
        """Element matrices (nc, nd, nd) -> CSR data (nnz,) on device."""
        return jax.ops.segment_sum(
            gather_1d(Ae.reshape(-1), self.perm_d), self.seg_d,
            num_segments=self.nnz,
        )

    def matvec(self, data, x):
        return jax.ops.segment_sum(
            data * gather_1d(x, self.indices_d), self.row_ids_d,
            num_segments=self.n,
        )

    def to_scipy(self, data):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (np.asarray(data), self.indices, self.indptr), shape=(self.n, self.n)
        )

    def to_dense(self, data):
        return np.asarray(self.to_scipy(data).todense())
