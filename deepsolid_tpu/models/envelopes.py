"""Multiplicative decay envelopes shaping orbitals around nuclei.

Reference semantics: DeepSolid/network.py:335-372. The envelope input is
the periodic e-atom distance (isotropic) or the periodic relative
coordinates (diagonal/full), so the envelope itself is lattice-periodic.
"""

from __future__ import annotations

import jax.numpy as jnp


def isotropic_envelope(r_ae: jnp.ndarray, params) -> jnp.ndarray:
    """Atom-centred exponential decays, one rate per (atom, orbital).

    out[n, p] = sum_a pi[a, p] * exp(-|sigma[a, p]| * r[n, a]);
    r_ae: (n, natom, 1) -> (n, nparam).
    """
    decay = jnp.exp(-jnp.abs(params["sigma"] * r_ae))
    return jnp.einsum("nap,ap->np", decay, params["pi"])


def diagonal_envelope(ae: jnp.ndarray, params) -> jnp.ndarray:
    """Per-axis scaled decay; ae: (n, natom, 3) -> (n, nparam)."""
    r = jnp.linalg.norm(ae[..., None] * params["sigma"], axis=2)
    return jnp.sum(jnp.exp(-r) * params["pi"], axis=1)


def full_envelope(ae: jnp.ndarray, params, name=None, eps=None, taps=None
                  ) -> jnp.ndarray:
    """Fully anisotropic decay with a (3,3) covariance per atom/orbital.

    `name`/`eps`/`taps` hook the bilinear sigma application into the KFAC
    capture machinery (the reference tags it with qmc1_tag for its
    QmcBlockedDense block, network.py:361): taps[name] records the input
    ae, eps[name] perturbs the ae.sigma output.
    """
    # sigma: (3, 3, natom, nparam); ae: (n, natom, 3)
    ae_sigma = jnp.einsum("nak,kmap->nmap", ae, params["sigma"])
    if name is not None:
        if eps is not None and name in eps:
            ae_sigma = ae_sigma + eps[name]
        if taps is not None:
            taps[name] = ae
    r = jnp.linalg.norm(ae_sigma, axis=1)  # (n, natom, nparam)
    return jnp.sum(jnp.exp(-r) * params["pi"], axis=1)


ENVELOPES = {
    "isotropic": isotropic_envelope,
    "diagonal": diagonal_envelope,
    "full": full_envelope,
}


def init_envelope_params(natom: int, nparam: int, envelope_type: str, dtype):
    params = {"pi": jnp.ones((natom, nparam), dtype)}
    if envelope_type == "isotropic":
        params["sigma"] = jnp.ones((natom, nparam), dtype)
    elif envelope_type == "diagonal":
        params["sigma"] = jnp.ones((natom, 3, nparam), dtype)
    elif envelope_type == "full":
        params["sigma"] = jnp.tile(
            jnp.eye(3, dtype=dtype)[..., None, None], [1, 1, natom, nparam]
        )
    else:
        raise ValueError(f"Unknown envelope type: {envelope_type}")
    return params
