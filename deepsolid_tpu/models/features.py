"""Lattice-periodic generalized distance features.

Two families (selected by `distance_type`):
  * 'nu'  — polynomial periodic metric, Phys. Rev. B 94, 035157.
            Reference semantics: DeepSolid/network.py:189-224.
  * 'tri' — sin/cos periodic map, Phys. Rev. Lett. 130, 036401.
            Reference semantics: DeepSolid/network.py:227-246.

Electron-atom features are periodic in the PRIMITIVE cell; electron-electron
features in the SIMULATION (super)cell (network.py:278-301). Everything here
is pure jnp on (..., 3) displacement arrays so the same code paths serve the
value, JVP and forward-Laplacian evaluations.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from deepsolid_tpu.ops.distance import enforce_pbc


def _scaled_f(w: jnp.ndarray) -> jnp.ndarray:
    """Periodic |w| with matched value/derivative at the zone boundary."""
    aw = jnp.abs(w)
    return aw * (1.0 - aw * aw * aw / (4.0 * jnp.pi**3))


def _scaled_g(w: jnp.ndarray) -> jnp.ndarray:
    """Periodic odd coordinate map with cusp-preserving slope at 0."""
    aw = jnp.abs(w)
    return w * (1.0 - 1.5 * aw / jnp.pi + 0.5 * (aw / jnp.pi) ** 2)

def nu_distance(dx: jnp.ndarray, av, bv) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Periodic generalized distance and relative coordinates ('nu').

    Args:
      dx: raw displacements (..., 3).
      av: (m, 3) feature lattice vectors over 2*pi (rows).
      bv: (m, 3) feature reciprocal vectors (rows).

    Returns:
      (sd, rel): sd (...,) generalized distance; rel (..., 3) periodic
      relative coordinates.
    """
    av = jnp.asarray(av, dx.dtype)
    bv = jnp.asarray(bv, dx.dtype)
    w = dx @ bv.T  # (..., m) projections
    # wrap into (-pi, pi]
    w = w - ((w + jnp.pi) // (2.0 * jnp.pi)) * 2.0 * jnp.pi
    # metric: |a_l|^2 f(w_l)^2 + sum_{l != l'} (a_l . a_l') g(w_l) g(w_l')
    f2 = (jnp.linalg.norm(av, axis=-1) * _scaled_f(w)) ** 2
    sg = _scaled_g(w)
    rel = sg @ av  # (..., 3)
    metric = av @ av.T
    cross = metric * (sg[..., :, None] * sg[..., None, :])
    off = cross * (1.0 - jnp.eye(metric.shape[-1], dtype=dx.dtype))
    sd2 = jnp.sum(f2, axis=-1) + jnp.sum(off, axis=(-1, -2))
    return jnp.sqrt(sd2), rel


def tri_distance(dx: jnp.ndarray, av, bv) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Periodic generalized distance and relative coordinates ('tri')."""
    av = jnp.asarray(av, dx.dtype)
    bv = jnp.asarray(bv, dx.dtype)
    w = dx @ bv.T
    sg, cg = jnp.sin(w), jnp.cos(w)
    rel = jnp.concatenate([sg @ av, cg @ av], axis=-1)  # (..., 6)
    metric = av @ av.T
    pair = (1.0 - cg[..., :, None]) * (1.0 - cg[..., None, :]) + (
        sg[..., :, None] * sg[..., None, :]
    )
    sd2 = jnp.einsum("...ij,ij->...", pair, metric)
    return jnp.sqrt(sd2), rel


_DISTANCE_FNS = {"nu": nu_distance, "tri": tri_distance}
# relative-coordinate dims per distance type
REL_DIMS = {"nu": 3, "tri": 6}


def input_feature_dims(natom: int, distance_type: str) -> Tuple[int, int]:
    """(one-electron, two-electron) input feature widths."""
    rel = REL_DIMS[distance_type]
    return (natom * (rel + 1), rel + 1)


def periodic_input_features(
    x: jnp.ndarray,
    atoms,
    *,
    prim_lattice,
    prim_av,
    prim_bv,
    sim_lattice,
    sim_av,
    sim_bv,
    distance_type: str = "nu",
):
    """Builds the periodic network inputs from raw electron positions.

    Args:
      x: flat electron positions (nelec * 3,).
      atoms: (natom, 3) primitive-cell atom positions.

    Returns:
      ae_rel: (nelec, natom, rel) periodic e-atom relative coords.
      ee_rel: (nelec, nelec, rel) periodic e-e relative coords (diag zeroed).
      r_ae: (nelec, natom, 1) periodic e-atom generalized distances.
      r_ee: (nelec, nelec, 1) periodic e-e generalized distances (diag zeroed).

    Reference semantics: network.py:249-302.
    """
    dist_fn = _DISTANCE_FNS[distance_type]
    pos = x.reshape(-1, 3)
    n = pos.shape[0]
    atoms = jnp.asarray(atoms, pos.dtype)

    prim_x, _ = enforce_pbc(prim_lattice, pos.reshape(-1))
    prim_x = prim_x.reshape(-1, 3)
    ae_disp = prim_x[:, None, :] - atoms[None, :, :]
    r_ae, ae_rel = dist_fn(ae_disp, prim_av, prim_bv)

    sim_x, _ = enforce_pbc(sim_lattice, pos.reshape(-1))
    sim_x = sim_x.reshape(-1, 3)
    eye = jnp.eye(n, dtype=pos.dtype)
    ee_disp = sim_x[:, None, :] - sim_x[None, :, :]
    # keep the diagonal off zero so sqrt gradients stay finite, then mask
    r_ee, ee_rel = dist_fn(ee_disp + eye[..., None], sim_av, sim_bv)
    r_ee = r_ee * (1.0 - eye)
    ee_rel = ee_rel * (1.0 - eye)[..., None]

    return ae_rel, ee_rel, r_ae[..., None], r_ee[..., None]
