"""Observables: complex polarization and structure factor.

Reference semantics: DeepSolid/estimator.py:15-85.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.parallel import DATA_AXIS, pmean_if_axis
from deepsolid_tpu.system.cell import Cell, reciprocal_vectors


def make_complex_polarization(cell: Cell, direction: int = 0, ndim: int = 3):
    """Order parameter <exp(i b . sum_i r_i)> (useful for hydrogen chains)."""
    rec_vec = jnp.asarray(reciprocal_vectors(cell.lattice)[direction])

    def complex_polarization(data):
        leading = list(data.shape[:-1])
        pos = data.reshape(leading + [-1, ndim])
        dots = jnp.einsum("i,...i->...", rec_vec.astype(pos.dtype), pos)
        dots = jnp.sum(dots, axis=-1)
        pol = jnp.mean(jnp.exp(1j * dots), axis=-1)
        return pmean_if_axis(pol, DATA_AXIS)

    return complex_polarization


def make_structure_factor(cell: Cell, nq: int = 4, ndim: int = 3):
    """S(k) on an nq^3 reciprocal mesh (finite-size corrections, PRB 94,
    035126)."""
    mesh = np.meshgrid(*[np.arange(nq)] * 3, indexing="ij")
    points = np.stack([m.ravel() for m in mesh], axis=0).T
    qvecs = jnp.asarray(points @ reciprocal_vectors(cell.lattice))
    nelec = cell.nelectron

    def structure_factor(data):
        leading = list(data.shape[:-1])
        pos = data.reshape(leading + [-1, ndim])
        dots = jnp.einsum("kj,...j->...k", qvecs.astype(pos.dtype), pos)
        rho_k = jnp.sum(jnp.exp(1j * dots), axis=-2)  # sum over electrons
        rho_one = pmean_if_axis(jnp.mean(rho_k, axis=0), DATA_AXIS)
        rho_two = pmean_if_axis(jnp.mean(jnp.abs(rho_k) ** 2, axis=0), DATA_AXIS)
        return (rho_two - jnp.abs(rho_one) ** 2) / nelec

    return structure_factor
