"""Orbital sources for pretraining targets and occupied k-lists.

The reference couples pretraining to PySCF HF (hf.py:44-218,
pretrain.py:152-154) with a host round-trip every iteration. Natively an
`OrbitalSource` is any object with:
  * `klist`            — (k_up, k_dn) occupied k per orbital (numpy)
  * `orbital_mats(x)`  — JAX-pure batched orbital matrices
so targets evaluate on-device inside the jitted pretrain step.

Sources:
  * PlaneWaveOrbitals — occupied free-electron states (exact for the
    uniform-gas limit; a good nodal-structure initializer generally)
  * scf.hf.ScfOrbitals — native periodic Hartree-Fock in a GTO basis
    (see deepsolid_tpu/scf/hf.py)
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from deepsolid_tpu.scf.free_electron import plane_wave_states
from deepsolid_tpu.system.cell import Supercell


class PlaneWaveOrbitals:
    """Slater determinant of occupied plane waves e^{i q . r}, q = k + G."""

    def __init__(self, sc: Supercell, twist=(0.0, 0.0, 0.0), policy="auto"):
        states = plane_wave_states(sc, twist=twist, policy=policy)
        self.klist = tuple(s[0] for s in states)
        self.qlist = tuple(s[1] for s in states)
        self.spins = sc.nelec

    def orbital_mats(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: (batch, ne*3) -> [(batch, n_s, n_s) complex] per active spin."""
        pos = x.reshape(x.shape[0], -1, 3)
        out = []
        start = 0
        for s, n in enumerate(self.spins):
            if n == 0:
                continue
            r = pos[:, start:start + n]
            q = jnp.asarray(self.qlist[s], pos.dtype)
            out.append(jnp.exp(1j * jnp.einsum("bid,jd->bij", r, q)))
            start += n
        return out

    def slogdet(self, x: jnp.ndarray) -> jnp.ndarray:
        """Batched log|det| of the plane-wave determinant (for sampling)."""
        mats = self.orbital_mats(x)
        return sum(jnp.linalg.slogdet(m)[1] for m in mats)
