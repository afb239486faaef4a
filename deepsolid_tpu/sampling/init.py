"""Initial electron placement around nuclei.

Reference semantics: DeepSolid/init_guess.py:27-80. Electrons are assigned
to atoms according to per-element ground-state spin configurations,
rebalanced to match the requested (nalpha, nbeta), jittered with a
Gaussian, and wrapped into the simulation cell.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.ops.distance import enforce_pbc
from deepsolid_tpu.system import elements
from deepsolid_tpu.system.cell import Cell


def init_electrons(
    key: jnp.ndarray,
    cell: Cell,
    electrons: Tuple[int, int],
    batch_size: int,
    init_width: float = 0.8,
) -> jnp.ndarray:
    """Returns walker positions, shape (batch_size, nelectron * 3)."""
    charges = cell.atom_charges
    if int(round(float(np.sum(charges)))) != sum(electrons):
        if cell.natom == 1:
            spin_configs = [tuple(electrons)]
        else:
            raise NotImplementedError(
                "No initialization policy for charged multi-atom cells."
            )
    else:
        spin_configs = []
        for sym, q in zip(cell.atom_symbols, charges):
            el = elements.from_symbol(sym)
            core = int((el.atomic_number - q) // 2)  # ECP-screened core pairs
            spin_configs.append((el.nalpha - core, el.nbeta - core))
        assert sum(sum(c) for c in spin_configs) == sum(electrons)
        rng = np.random.RandomState(0)
        # flip alpha->beta on random atoms until channel totals match
        while tuple(sum(c) for c in zip(*spin_configs)) != tuple(electrons):
            i = rng.randint(len(spin_configs))
            na, nb = spin_configs[i]
            if tuple(sum(c) for c in zip(*spin_configs))[0] > electrons[0]:
                if na > 0:
                    spin_configs[i] = (na - 1, nb + 1)
            else:
                if nb > 0:
                    spin_configs[i] = (na + 1, nb - 1)

    positions = []
    for s in range(2):
        for j in range(cell.natom):
            positions.append(
                np.tile(cell.atom_coords[j], spin_configs[j][s])
            )
    centers = jnp.asarray(np.concatenate(positions))

    key, sub = jax.random.split(key)
    guess = centers + init_width * jax.random.normal(
        sub, shape=(batch_size, centers.size), dtype=centers.dtype
    )
    wrapped, _ = enforce_pbc(cell.lattice, guess)
    return wrapped
