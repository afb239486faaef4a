"""Periodic Gaussian-type-orbital evaluation in JAX.

Bloch AOs: phi_{mu k}(r) = sum_T chi_mu(r - R_mu - T) e^{i k . T} with the
lattice sum truncated where exp(-alpha_min R^2) < eps. On-device equivalent
of PySCF's eval_gto("PBCGTOval_sph") used by the reference for pretraining
targets (hf.py:106-122) — but jittable, so targets evaluate inside the
pretrain step with no host round-trip.

Shells are CARTESIAN with any angular momentum the basis tables provide
(s, p, and 6-component d as of cc-pVDZ); cartesian p == spherical p.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.ops.distance import enforce_pbc
from deepsolid_tpu.scf.basis import Shell, num_ao, primitive_norm


def _lattice_images(lattice: np.ndarray, rcut: float) -> np.ndarray:
    """Integer-combination translations T with any point of the cell within
    rcut of the home cell (conservative bounding box)."""
    inv = np.linalg.inv(lattice)
    bounds = np.ceil(rcut * np.linalg.norm(inv, axis=0)).astype(int) + 1
    pts = np.array(
        list(itertools.product(*[range(-b, b + 1) for b in bounds])),
        np.float64,
    )
    ts = pts @ lattice
    keep = np.linalg.norm(ts, axis=1) <= rcut + np.linalg.norm(lattice, axis=1).max()
    return ts[keep]


@dataclasses.dataclass(frozen=True)
class PeriodicAOEvaluator:
    """Precompiled shell data for evaluating Bloch AOs at given k-points."""

    shells: Sequence[Shell]
    lattice: np.ndarray
    kpts: np.ndarray  # (nk, 3)
    images: np.ndarray  # (nT, 3)

    @classmethod
    def build(cls, cell, shells: Sequence[Shell], kpts, eps: float = 1e-10):
        alpha_min = min(float(s.exponents.min()) for s in shells)
        rcut = float(np.sqrt(-np.log(eps) / alpha_min))
        images = _lattice_images(np.asarray(cell.lattice), rcut)
        return cls(
            shells=tuple(shells),
            lattice=np.asarray(cell.lattice),
            kpts=np.asarray(kpts, np.float64).reshape(-1, 3),
            images=images,
        )

    @property
    def nao(self) -> int:
        return num_ao(self.shells)

    def eval_aos(self, pos: jnp.ndarray) -> jnp.ndarray:
        """AO values. pos: (n, 3) -> (nk, n, nao) complex.

        Positions are wrapped into the home cell; the wrap phase e^{i k.L m}
        is equivalent to extending the lattice sum (reference applies the
        same correction at hf.py:118-120).
        """
        dtype = pos.dtype
        n = pos.shape[0]
        wrapped, wrap = enforce_pbc(self.lattice, pos.reshape(-1))
        wrapped = wrapped.reshape(n, 3)
        # phase correction for the wrap: chi evaluated at r - m L is the
        # Bloch AO at r times e^{-i k.(m L)}; equivalently multiply by
        # e^{+i k.(m L)} to undo (same convention as the reference).
        wrapL = wrap.reshape(n, 3) @ jnp.asarray(self.lattice, dtype)
        kdot_wrap = wrapL @ jnp.asarray(self.kpts.T, dtype)  # (n, nk)
        wrap_phase = jnp.exp(1j * kdot_wrap)  # (n, nk)

        images = jnp.asarray(self.images, dtype)  # (nT, 3)
        kdot_t = jnp.asarray(self.kpts, dtype) @ images.T  # (nk, nT)
        phase_t = jnp.exp(1j * kdot_t)

        cols = []
        for shell in self.shells:
            center = jnp.asarray(shell.center, dtype)
            alpha = jnp.asarray(shell.exponents, dtype)
            coef = jnp.asarray(
                shell.coefficients * primitive_norm(shell.exponents, shell.l),
                dtype,
            )
            d = wrapped[:, None, :] - center[None, None, :] - images[None, :, :]
            r2 = jnp.sum(d * d, axis=-1)  # (n, nT)
            radial = jnp.exp(-alpha[None, None, :] * r2[..., None]) @ coef
            if shell.l == 0:
                # (nk, n): sum_T radial * e^{ik.T}
                ao = jnp.einsum("nt,kt->kn", radial.astype(phase_t.dtype), phase_t)
                cols.append(ao[..., None])
            elif shell.l == 1:
                aop = jnp.einsum(
                    "ntc,kt->knc", (d * radial[..., None]).astype(phase_t.dtype),
                    phase_t,
                )
                cols.append(aop)
            else:
                from deepsolid_tpu.scf.integrals import CART

                polys = jnp.stack(
                    [
                        d[..., 0] ** lx * d[..., 1] ** ly * d[..., 2] ** lz
                        for (lx, ly, lz) in CART[shell.l]
                    ],
                    axis=-1,
                )  # (n, nT, ncart)
                aop = jnp.einsum(
                    "ntc,kt->knc",
                    (polys * radial[..., None]).astype(phase_t.dtype),
                    phase_t,
                )
                cols.append(aop)
        aos = jnp.concatenate(cols, axis=-1)  # (nk, n, nao)
        return aos * wrap_phase.T[:, :, None]
