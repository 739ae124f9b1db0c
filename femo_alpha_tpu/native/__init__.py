"""Native (C++) setup-time kernels, loaded via ctypes.

Compiled lazily with g++ on first use; every entry point has a numpy
fallback so the framework works without a toolchain. This is the in-repo
replacement for the host-side responsibilities of the reference's external
native stack (dolfinx mesh/topology/sparsity C++, SURVEY.md §2.2)."""

from .loader import get_lib, native_available
from .topology import build_edges, build_csr_pattern, rcm_order

__all__ = [
    "get_lib",
    "native_available",
    "build_edges",
    "build_csr_pattern",
    "rcm_order",
]
