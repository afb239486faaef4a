"""Ewald summation for the periodic Coulomb Hamiltonian.

Reference semantics: DeepSolid/ewaldsum.py:33-200 (itself derived from
PyQMC). New implementation notes:
  * G-vectors are enumerated on host inside the exact weight-cutoff
    ellipsoid (weight > 1e-12) instead of a fixed gmax=200 box scan — same
    resulting G set, tiny host memory.
  * All precomputed state is a frozen dataclass of arrays, so the energy
    functions are pure and jit/vmap/shard_map friendly.
  * Real-space sums run over the 27 neighbor images (nlatvec=1), matching
    the reference default.

Energy convention (atomic units): for charges {q_i} and neutralizing
background, E = E_real + E_recip + self/background constants, split into
(ee, ei, ii) parts exactly like the reference so logs are comparable.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.ops.distance import MinimalImage


def _gpoints_in_cutoff(recvec2pi: np.ndarray, alpha: float, volume: float,
                       tol: float = 1e-12) -> Tuple[np.ndarray, np.ndarray]:
    """Half-space reciprocal points with weight 4pi exp(-g^2/4a^2)/(V g^2) > tol.

    The weight is monotone decreasing in g^2 for g^2 > 0, so points inside a
    radius g_cut solve the same selection as the reference's fixed box scan.
    """
    # Find g_cut: w(g) = tol  ->  exp(-g^2/4a^2) = tol * V * g^2 / (4 pi)
    g = 1.0
    for _ in range(200):
        rhs = tol * volume * g * g / (4 * np.pi)
        if rhs <= 0 or rhs >= 1:
            g *= 1.5
            continue
        g_new = 2.0 * alpha * np.sqrt(-np.log(rhs))
        if abs(g_new - g) < 1e-10:
            break
        g = g_new
    g_cut = g * 1.0001

    # integer bounding box for |n @ recvec2pi| <= g_cut
    inv = np.linalg.inv(recvec2pi)
    bounds = np.ceil(g_cut * np.linalg.norm(inv, axis=0)).astype(int)
    ns = np.array(
        list(
            itertools.product(
                *[range(-b, b + 1) for b in bounds]
            )
        ),
        dtype=np.float64,
    )
    # keep strict half space: (x>0) or (x=0,y>0) or (x=0,y=0,z>0)
    x, y, z = ns.T
    half = (x > 0) | ((x == 0) & (y > 0)) | ((x == 0) & (y == 0) & (z > 0))
    ns = ns[half]
    gpoints = ns @ recvec2pi
    g2 = np.sum(gpoints**2, axis=-1)
    gweight = 4 * np.pi * np.exp(-g2 / (4 * alpha**2)) / (volume * g2)
    keep = gweight > tol
    return gpoints[keep], gweight[keep]


@dataclasses.dataclass(frozen=True)
class EwaldSum:
    """Precomputed Ewald state for a fixed simulation cell."""

    latvec: np.ndarray
    atom_coords: np.ndarray
    atom_charges: np.ndarray
    nelec: Tuple[int, int]
    alpha: float
    gpoints: np.ndarray  # (ng, 3)
    gweight: np.ndarray  # (ng,)
    lattice_displacements: np.ndarray  # (27, 3)
    ion_exp: np.ndarray  # (ng,) complex structure factor of the ions
    ion_ion: float  # bare ion-ion Ewald energy (real+recip)
    ijconst: float
    squareconst: float
    ii_const: float
    i_sum: float

    @classmethod
    def build(cls, cell, ewald_gmax_tol: float = 1e-12, nlatvec: int = 1,
              alpha: float = None) -> "EwaldSum":
        """Host-side setup from a `Supercell` (or any `Cell` with nelec)."""
        latvec = np.asarray(cell.lattice, np.float64)
        coords = np.asarray(cell.atom_coords, np.float64)
        charges = np.asarray(cell.atom_charges, np.float64)
        volume = abs(np.linalg.det(latvec))
        recvec = np.linalg.inv(latvec).T  # rows (no 2 pi)

        if alpha is None:
            smallest_height = np.amin(1.0 / np.linalg.norm(recvec, axis=1))
            alpha = 5.0 / smallest_height

        gpoints, gweight = _gpoints_in_cutoff(
            2 * np.pi * recvec, alpha, volume, ewald_gmax_tol
        )

        pts = np.array(
            list(itertools.product(range(-nlatvec, nlatvec + 1), repeat=3)),
            np.float64,
        )
        lattice_displacements = pts @ latvec

        # constants (reference: ewaldsum.py:92-107)
        i_sum = float(np.sum(charges))
        ii_sum2 = float(np.sum(charges**2))
        ii_sum = (i_sum**2 - ii_sum2) / 2
        ijconst = -np.pi / (volume * alpha**2)
        squareconst = -alpha / np.sqrt(np.pi) + ijconst / 2
        ii_const = ii_sum * ijconst + ii_sum2 * squareconst

        # ion-ion energy (reference: ewaldsum.py:120-136)
        gdotr = gpoints @ coords.T  # (ng, natom)
        ion_exp = np.exp(1j * gdotr) @ charges
        ion_ion_rec = float(gweight @ np.abs(ion_exp) ** 2)
        if len(charges) > 1:
            # host-side float64 minimal image: going through the JAX
            # MinimalImage here runs a bf16 matmul on TPU backends and
            # quantizes the ion-ion CONSTANT by O(1e-3) Ha (caught by the
            # exact-Ewald pair test). 27-image search, pure numpy.
            diff = coords[:, None, :] - coords[None, :, :]  # (na, na, 3)
            shifts = pts @ latvec  # reuse the +/-1 integer box below
            cand = diff[:, :, None, :] + shifts[None, None, :, :]
            best = np.argmin(np.sum(cand * cand, axis=-1), axis=-1)
            d = np.take_along_axis(
                cand, best[:, :, None, None], axis=2
            )[:, :, 0, :]
            rvec = d[None, :, :, :] + lattice_displacements[:, None, None, :]
            r = np.linalg.norm(rvec, axis=-1)
            # self-pairs at zero displacement are masked by triu; keep them
            # off zero so the division stays finite
            r = np.where(r < 1e-300, 1.0, r)
            qij = charges[:, None] * charges[None, :]
            import scipy.special as _sp  # host-only

            ion_ion_real = float(
                np.sum(np.triu(qij * _sp.erfc(alpha * r) / r, k=1))
            )
        else:
            ion_ion_real = 0.0

        return cls(
            latvec=latvec,
            atom_coords=coords,
            atom_charges=charges,
            nelec=tuple(cell.nelec),
            alpha=float(alpha),
            gpoints=gpoints,
            gweight=gweight,
            lattice_displacements=lattice_displacements,
            ion_exp=ion_exp,
            ion_ion=ion_ion_real + ion_ion_rec,
            ijconst=float(ijconst),
            squareconst=float(squareconst),
            ii_const=float(ii_const),
            i_sum=i_sum,
        )

    # -- per-count constants (reference: ewaldsum.py:109-118) -----------------
    def ee_const(self, ne: int) -> float:
        return ne * (ne - 1) / 2 * self.ijconst + ne * self.squareconst

    def ei_const(self, ne: int) -> float:
        return -ne * self.i_sum * self.ijconst

    # -- device-side energy ----------------------------------------------------
    def energy(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(ee, ei, ii) Ewald energies for one walker x (nelec*3,)."""
        dtype = x.dtype
        ne = sum(self.nelec)
        pos = x.reshape(ne, 3)
        latvec = jnp.asarray(self.latvec, dtype)
        disp = jnp.asarray(self.lattice_displacements, dtype)
        coords = jnp.asarray(self.atom_coords, dtype)
        charges = jnp.asarray(self.atom_charges, dtype)
        gpoints = jnp.asarray(self.gpoints, dtype)
        gweight = jnp.asarray(self.gweight, dtype)
        alpha = jnp.asarray(self.alpha, dtype)

        mi = MinimalImage(self.latvec)

        # real-space e-i
        ei_d = mi.dist_i(coords.reshape(-1), pos.reshape(-1))  # (ne, natom, 3)
        r_ei = jnp.linalg.norm(
            ei_d[:, :, None, :] + disp[None, None, :, :], axis=-1
        )
        cij = jnp.sum(jax.lax.erfc(alpha * r_ei) / r_ei, axis=-1)
        ei_real = jnp.sum(-charges[None, :] * cij)

        # real-space e-e
        if ne > 1:
            ee_d = mi.dist_matrix(pos.reshape(-1))  # (ne, ne, 3)
            r_ee = jnp.linalg.norm(
                ee_d[None, :, :, :] + disp[:, None, None, :], axis=-1
            )
            tri = jnp.triu(jnp.ones((ne, ne), dtype), k=1)
            # diagonal at zero displacement is masked; keep r off zero so the
            # masked division stays finite (0 * inf = nan otherwise)
            r_safe = jnp.where(r_ee < 1e-30, jnp.asarray(1.0, dtype), r_ee)
            ee_real = jnp.sum(
                tri[None] * jax.lax.erfc(alpha * r_safe) / r_safe
            )
        else:
            ee_real = jnp.asarray(0.0, dtype)

        # reciprocal space (reference: ewaldsum.py:174-183)
        gdotr = pos @ gpoints.T  # (ne, ng)
        sum_sin = jnp.sum(jnp.sin(gdotr), axis=0)
        sum_cos = jnp.sum(jnp.cos(gdotr), axis=0)
        ee_recip = jnp.dot(sum_sin**2 + sum_cos**2, gweight)
        ion_re = jnp.asarray(self.ion_exp.real, dtype)
        ion_im = jnp.asarray(self.ion_exp.imag, dtype)
        ei_recip = 2.0 * jnp.dot(-ion_re * sum_cos - ion_im * sum_sin, gweight)

        ee = ee_real + ee_recip + self.ee_const(ne)
        ei = ei_real + ei_recip + self.ei_const(ne)
        ii = jnp.asarray(self.ion_ion + self.ii_const, dtype)
        return ee, ei, ii

    def total_energy(self, x: jnp.ndarray) -> jnp.ndarray:
        ee, ei, ii = self.energy(x)
        return ee + ei + ii

    @property
    def madelung(self) -> float:
        """Ion-ion energy incl. neutralizing-background constants.

        The reference asserts this equals PySCF's `energy_nuc()`
        (hamiltonian.py:170-173); tests here validate it against known
        Madelung constants instead.
        """
        return float(self.ion_ion + self.ii_const)
