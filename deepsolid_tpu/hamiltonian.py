"""Local energy: kinetic (Laplacian of log psi) + Ewald Coulomb.

Reference semantics: DeepSolid/hamiltonian.py:163-228.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from deepsolid_tpu.ops.ewald import EwaldSum
from deepsolid_tpu.ops.laplacian import make_kinetic


def make_local_energy(
    f: Callable,
    supercell,
    mode: str = "partition",
    partition_number: int = 3,
    network=None,
    deriv_axis=None,
) -> Callable:
    """Builds E_L(params, x) -> (kinetic complex, ewald real) for one walker.

    f(params, x) must return complex log psi. mode='forward' uses the
    forward-Laplacian engine and requires `network` (the Network object);
    `deriv_axis` optionally shards its 3N tangent columns over that mesh
    axis (the production 2-D ('data', 'deriv') mesh).
    """
    if mode == "forward":
        if network is None:
            raise ValueError("laplacian mode 'forward' requires network=")
        from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward

        kinetic = make_kinetic_forward(network, deriv_axis=deriv_axis)
    elif deriv_axis is not None:
        raise ValueError(
            "deriv-axis sharding requires laplacian_mode='forward'"
        )
    else:
        kinetic = make_kinetic(f, mode=mode, partition_number=partition_number)
    ewald = EwaldSum.build(supercell)

    def local_energy(params, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ke = kinetic(params, x)
        ee, ei, ii = ewald.energy(x)
        return ke, ee + ei + ii

    local_energy.ewald = ewald  # expose precomputed state (Madelung checks)
    return local_energy
