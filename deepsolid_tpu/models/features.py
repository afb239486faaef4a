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


def nu_distance_jet(dx, av, bv):
    """Analytic jets of nu_distance wrt the raw displacement dx.

    Returns (sd, dsd, lap_sd, rel, drel, lap_rel) with derivative axes
    LAST: dsd (..., 3), drel (..., 3, rel_dim). Replaces ~10 autodiff
    passes per pair in the forward-Laplacian seeding with one closed-form
    evaluation (the O(N^2) pair seeds dominate otherwise).
    """
    av = jnp.asarray(av, dx.dtype)
    bv = jnp.asarray(bv, dx.dtype)
    w = dx @ bv.T
    w = w - ((w + jnp.pi) // (2.0 * jnp.pi)) * 2.0 * jnp.pi  # (..., m)
    aw = jnp.abs(w)
    sw = jnp.sign(w)
    pi = jnp.pi

    # f = |w| - w^4/(4 pi^3);  g = w - 3 w|w|/(2 pi) + w^3/(2 pi^2)
    f = aw - w**4 / (4.0 * pi**3)
    fp = sw - w**3 / pi**3
    fpp = -3.0 * w * w / pi**3
    g = w - 3.0 * w * aw / (2.0 * pi) + w**3 / (2.0 * pi**2)
    gp = 1.0 - 3.0 * aw / pi + 1.5 * w * w / pi**2
    gpp = -3.0 * sw / pi + 3.0 * w / pi**2

    a2 = jnp.sum(av * av, axis=-1)      # (m,)  |a_l|^2
    b2 = jnp.sum(bv * bv, axis=-1)      # (m,)  |B_l|^2
    metric = av @ av.T                   # (m, m)
    off = metric * (1.0 - jnp.eye(metric.shape[0], dtype=dx.dtype))
    bdotb = bv @ bv.T                    # (m, m)

    # rel_j = sum_l g(w_l) A_{lj}
    rel = g @ av
    drel = jnp.einsum("...l,ld,lj->...dj", gp, bv, av)
    lap_rel = (gpp * b2) @ av

    # sd^2 and its jets
    mg = g @ off.T                       # (..., l): sum_{l' != l} M_{ll'} g_{l'}
    sd2 = jnp.sum(a2 * f * f, axis=-1) + jnp.sum(g * mg, axis=-1)
    coeff = 2.0 * a2 * f * fp + 2.0 * mg * gp  # (..., l)
    dsd2 = coeff @ bv                    # (..., 3)
    lap_sd2 = jnp.sum(
        (2.0 * a2 * (fp * fp + f * fpp) + 2.0 * mg * gpp) * b2, axis=-1
    ) + 2.0 * jnp.einsum("...l,...m,lm,lm->...", gp, gp, off, bdotb)

    sd = jnp.sqrt(sd2)
    dsd = dsd2 / (2.0 * sd[..., None])
    lap_sd = lap_sd2 / (2.0 * sd) - jnp.sum(dsd2 * dsd2, axis=-1) / (
        4.0 * sd2 * sd
    )
    return sd, dsd, lap_sd, rel, drel, lap_rel


def tri_distance_jet(dx, av, bv):
    """Analytic jets of tri_distance wrt dx (same output layout as nu)."""
    av = jnp.asarray(av, dx.dtype)
    bv = jnp.asarray(bv, dx.dtype)
    w = dx @ bv.T
    sg, cg = jnp.sin(w), jnp.cos(w)
    b2 = jnp.sum(bv * bv, axis=-1)
    metric = av @ av.T
    bdotb = bv @ bv.T

    rel = jnp.concatenate([sg @ av, cg @ av], axis=-1)
    drel = jnp.concatenate(
        [
            jnp.einsum("...l,ld,lj->...dj", cg, bv, av),
            jnp.einsum("...l,ld,lj->...dj", -sg, bv, av),
        ],
        axis=-1,
    )
    lap_rel = jnp.concatenate([(-sg * b2) @ av, (-cg * b2) @ av], axis=-1)

    # sd^2 = sum_{ll'} M_{ll'} [ (1-c_l)(1-c_l') + s_l s_l' ]
    one_c = 1.0 - cg
    m_oc = one_c @ metric.T
    m_s = sg @ metric.T
    sd2 = jnp.sum(one_c * m_oc + sg * m_s, axis=-1)
    # d/dw_l: 2 [ s_l * m_oc_l + c_l * m_s_l ]
    dw = 2.0 * (sg * m_oc + cg * m_s)  # (..., l)
    dsd2 = dw @ bv
    # second derivative wrt w_l (diagonal): 2[c_l m_oc_l - s_l m_s_l
    #   + s_l^2 M_ll + c_l^2 M_ll]; cross terms l != l':
    #   2[s_l s_l' + c_l c_l'] M_{ll'}
    diag = 2.0 * (
        cg * m_oc - sg * m_s + (sg * sg + cg * cg) * jnp.diag(metric)
    )
    lap_sd2 = jnp.sum(diag * b2, axis=-1) + 2.0 * (
        jnp.einsum("...l,...m,lm,lm->...", sg, sg, metric, bdotb)
        + jnp.einsum("...l,...m,lm,lm->...", cg, cg, metric, bdotb)
        - jnp.sum((sg * sg + cg * cg) * jnp.diag(metric) * b2, axis=-1)
    )
    sd = jnp.sqrt(sd2)
    dsd = dsd2 / (2.0 * sd[..., None])
    lap_sd = lap_sd2 / (2.0 * sd) - jnp.sum(dsd2 * dsd2, axis=-1) / (
        4.0 * sd2 * sd
    )
    return sd, dsd, lap_sd, rel, drel, lap_rel


DISTANCE_JET_FNS = {"nu": nu_distance_jet, "tri": tri_distance_jet}
