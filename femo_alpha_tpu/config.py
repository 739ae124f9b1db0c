"""Global configuration for femo_alpha_tpu.

The reference exposes configuration through instance attributes and module
booleans (SURVEY.md §5, fea_dolfinx.py:37-48). Here it is a dataclass of
defaults consulted by solvers/assembly; models take explicit kwargs.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp


@dataclasses.dataclass
class Config:
    # default floating dtype for FEM arrays (f64 when x64 enabled)
    dtype: object = None
    # index dtype for dofmaps/connectivity
    index_dtype: object = jnp.int32
    # print solver reports (parity with FEA.REPORT, fea_dolfinx.py:46)
    report: bool = False
    # fail loudly on nonconvergence (reference default is silent-False;
    # SURVEY.md §5 says fail loudly by default — we do)
    error_on_nonconvergence: bool = True

    def __post_init__(self):
        if self.dtype is None:
            x64 = os.environ.get("FEMO_X64", "1") != "0"
            self.dtype = jnp.float64 if x64 else jnp.float32


config = Config()


def fdtype():
    """Default floating dtype."""
    return config.dtype


def idtype():
    """Default index dtype."""
    return config.index_dtype
