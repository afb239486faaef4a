"""Minimal-image displacements and periodic wrapping (JAX, jit-safe).

Functional, TPU-friendly re-design of the reference's class-based dispatch
(DeepSolid/distance.py:32-185). Lattice classification happens at trace
time on host numpy (static), so jitted code contains only the cheapest
specialization: a fractional-coordinate wrap for any lattice, or a 27-image
search for highly skewed lattices where the fractional wrap is not exact.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _needs_image_search(lattice: np.ndarray) -> bool:
    """Whether the nearest-image can differ from the fractional-wrap image.

    For orthogonal (incl. diagonal) lattices the fractional wrap is exact.
    For skewed lattices it can miss the true minimal image; the reference
    uses a 27-image argmin in that case (distance.py:70-89).
    """
    lattice = np.asarray(lattice)
    off = lattice @ lattice.T - np.diag(np.diag(lattice @ lattice.T))
    return bool(np.any(np.abs(off) > 1e-10))


def min_image_frac(dx: jnp.ndarray, lattice, inv_lattice) -> jnp.ndarray:
    """Wrap displacement(s) into [-1/2, 1/2) fractional box."""
    frac = dx @ inv_lattice
    frac = (frac + 0.5) % 1.0 - 0.5
    return frac @ lattice


def min_image_search(dx: jnp.ndarray, lattice, shifts) -> jnp.ndarray:
    """True minimal image via search over the 27 neighbor-cell shifts."""
    cand = dx[None, ...] + shifts.reshape((-1,) + (1,) * (dx.ndim - 1) + (3,))
    d2 = jnp.sum(cand * cand, axis=-1)
    idx = jnp.argmin(d2, axis=0)
    return jnp.take_along_axis(cand, idx[None, ..., None], axis=0)[0]


class MinimalImage:
    """Precomputed minimal-image helper for a fixed lattice.

    Host-side construction; methods are pure jnp functions safe under jit.
    """

    def __init__(self, lattice):
        lattice = np.asarray(lattice, np.float64)
        self.lattice = lattice
        self.inv_lattice = np.linalg.inv(lattice)
        self.general = _needs_image_search(lattice)
        pts = np.array(list(itertools.product((-1, 0, 1), repeat=3)), np.float64)
        self.shifts = pts @ lattice

    def displacement(self, dx: jnp.ndarray) -> jnp.ndarray:
        """Minimal-image displacement for raw displacement(s) dx (..., 3)."""
        wrapped = min_image_frac(dx, self.lattice.astype(dx.dtype),
                                 self.inv_lattice.astype(dx.dtype))
        if self.general:
            wrapped = min_image_search(wrapped, self.lattice.astype(dx.dtype),
                                       self.shifts.astype(dx.dtype))
        return wrapped

    def dist_i(self, targets: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Pairwise minimal-image displacements x_i - target_j, (n, m, 3)."""
        targets = targets.reshape(1, -1, 3)
        x = x.reshape(-1, 1, 3)
        return self.displacement(x - targets)

    def dist_matrix(self, x: jnp.ndarray) -> jnp.ndarray:
        """Electron-electron minimal-image displacements, diag zeroed."""
        v = self.dist_i(x, x)
        n = v.shape[0]
        return v * (1.0 - jnp.eye(n, dtype=v.dtype))[..., None]


def enforce_pbc(lattice, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wrap electron positions into the cell spanned by `lattice` rows.

    Args:
      lattice: (3, 3) rows = lattice vectors (array-like; static or traced).
      x: positions, shape (..., n*3) flat or (..., n, 3).

    Returns:
      (wrapped_x, wrap) with wrapped_x the same shape as x and `wrap` the
      integer image counts, shape (..., n, 3).
    Reference semantics: distance.py:144-163.
    """
    lattice = jnp.asarray(lattice)
    shape = x.shape
    pos = x.reshape(shape[:-1] + (-1, 3)) if shape[-1] != 3 else x
    inv = jnp.linalg.inv(lattice).astype(pos.dtype)
    frac = pos @ inv
    wrap = jnp.floor(frac)
    wrapped = (frac - wrap) @ lattice.astype(pos.dtype)
    return wrapped.reshape(shape), wrap
