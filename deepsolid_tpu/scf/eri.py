"""Periodic two-electron (J/K) matrices for the native SCF.

Ewald-split Coulomb:
  * long range  — reciprocal space via analytic Bloch pair-density
    Fourier transforms (the same machinery as the nuclear LR term).
    Exchange needs mixed-k pair densities, whose momentum support is
    q + G with q = k' - k, so the FT is evaluated on shifted G sets.
  * short range — erfc(beta r12) ERIs via McMurchie-Davidson remain to
    be implemented (docs/ROADMAP.md item 1); this module currently
    provides the validated long-range building blocks.

Conventions: Bloch AOs phi_{mu k}(r) = sum_T chi_mu(r - T) e^{i k.T}
(un-normalized lattice sums, matching scf/hf.py core_matrices); density
matrices D_k are per-spin occupied C C^H; all outputs are per PRIMITIVE
cell. Validated against dense-grid numerical integration on small cells
(tests/test_scf_jk.py).
"""

from __future__ import annotations

import numpy as np

from deepsolid_tpu.scf import basis as basis_lib
from deepsolid_tpu.scf import integrals as ints
from deepsolid_tpu.scf.gto import _lattice_images


def _shell_offsets(shells):
    offs = []
    off = 0
    for s in shells:
        offs.append(off)
        off += s.nfunc
    return offs, off


def bloch_pair_ft(shells, lattice, kpts, gpts, eps: float = 1e-10):
    """rho_k[mu nu](G) = sum_T e^{i k.T} \\int chi_mu(r) chi_nu(r - T) e^{-iG.r} dr.

    Returns complex array (nk, nao, nao, ng). `gpts` may be any set of
    3-vectors (shifted sets for exchange).
    """
    kpts = np.asarray(kpts).reshape(-1, 3)
    gpts = np.asarray(gpts).reshape(-1, 3)
    offs, nao = _shell_offsets(shells)
    nk, ng = kpts.shape[0], gpts.shape[0]

    alpha_min = min(float(s.exponents.min()) for s in shells)
    rcut = np.sqrt(-np.log(eps) / (alpha_min / 2.0))
    images = _lattice_images(np.asarray(lattice), rcut)

    out = np.zeros((nk, nao, nao, ng), np.complex128)
    for i, si in enumerate(shells):
        for j, sj in enumerate(shells):
            b_pos = sj.center[None, :] + images
            ab = si.center[None, :] - b_pos
            mu_pair = (si.exponents.min() * sj.exponents.min()) / (
                si.exponents.min() + sj.exponents.min()
            )
            keep = mu_pair * np.sum(ab * ab, -1) < -np.log(eps)
            if not np.any(keep):
                continue
            bk = b_pos[keep]
            phases = np.exp(1j * kpts @ images[keep].T)  # (nk, nT)

            na, nb = len(si.exponents), len(sj.exponents)
            al = si.exponents.reshape(na, 1, 1)
            be = sj.exponents.reshape(1, nb, 1)
            ca = (si.coefficients
                  * basis_lib.primitive_norm(si.exponents, si.l))
            cb = (sj.coefficients
                  * basis_lib.primitive_norm(sj.exponents, sj.l))
            rows = []
            for la3 in ints.CART[si.l]:
                cols = []
                for lb3 in ints.CART[sj.l]:
                    ft = ints.pair_density_ft(
                        la3, lb3, al, be,
                        np.broadcast_to(si.center, (1, 1, 1, 3)),
                        bk[None, None], gpts,
                    )  # (na, nb, nT, ng)
                    cols.append(np.einsum("a,b,abtg->tg", ca, cb, ft))
                rows.append(cols)
            blk = np.array(rows)  # (nfa, nfb, nT, ng)
            out[:, offs[i]:offs[i] + blk.shape[0],
                offs[j]:offs[j] + blk.shape[1]] += np.einsum(
                    "kt,abtg->kabg", phases, blk
                )
    return out


def lr_weights(gpts, beta, volume):
    """Long-range Coulomb kernel 4 pi e^{-G^2/4 beta^2} / (V G^2); zero at G=0."""
    g2 = np.sum(np.asarray(gpts) ** 2, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = 4.0 * np.pi * np.exp(-g2 / (4.0 * beta**2)) / (volume * g2)
    return np.where(g2 < 1e-12, 0.0, w)


def coulomb_lr(rho_g, dm_total, gw):
    """Long-range Hartree J_k[mu nu] from the total density.

    rho_g: (nk, nao, nao, ng) Bloch pair FTs at the unshifted G set;
    dm_total: (nk, nao, nao) spin-summed density matrices; gw: (ng,).
    """
    nk = rho_g.shape[0]
    # n_e(G) = (1/nk) sum_k tr(D_k rho_k(G)^*): the electron density FT
    n_g = np.einsum("kab,kabg->g", dm_total, np.conj(rho_g)) / nk
    return np.einsum("kabg,g,g->kab", rho_g, gw, n_g)


def exchange_lr(shells, lattice, kpts, gpts, gw, dm_k, beta, volume,
                eps=1e-10):
    """Long-range exchange K_k[mu nu] for ONE spin channel.

    K_k[mu nu] = (1/nk) sum_k' sum_{lam sig} D_k'[lam sig]
                 sum_G w(|G+q|) rho^{kk'}[mu lam](G+q) rho^{kk'}[sig nu](G+q)^*
    with q = k' - k. Mixed-k pair densities live on the shifted sets
    G + q, evaluated with the SAME bloch_pair_ft at shifted points.
    """
    kpts = np.asarray(kpts).reshape(-1, 3)
    nk = kpts.shape[0]
    nao = dm_k.shape[-1]
    out = np.zeros((nk, nao, nao), np.complex128)
    # distinct momentum transfers q = k' - k (nk of them on a regular grid)
    for ik in range(nk):
        for ikp in range(nk):
            q = kpts[ikp] - kpts[ik]
            gq = np.asarray(gpts) + q
            wq = lr_weights(gq, beta, volume)
            # rho^{kk'}[mu lam](G+q): lattice phases use k' (the ket k)
            rho = bloch_pair_ft(shells, lattice, kpts[ikp:ikp + 1], gq,
                                eps)[0]  # (nao, nao, ng)
            out[ik] += np.einsum(
                "ls,alg,g,sbg->ab", dm_k[ikp], rho, wq, np.conj(rho)
            ) / nk
    return out
