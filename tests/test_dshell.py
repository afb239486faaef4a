"""d-shell (l = 2) support through the SCF stack.

The E/R recursions, pair FTs and ERI quartets are written for general l;
these tests pin the l = 2 path with synthetic d shells: quadrature
oracles for the one-electron integrals, grid FT for the Bloch pair
density, beta-independence of the Ewald-split h and J/K, and the
jittable AO evaluator against a direct lattice sum.
"""

import numpy as np
import pytest

from deepsolid_tpu.scf import eri
from deepsolid_tpu.scf import hf as hf_lib
from deepsolid_tpu.scf.basis import Shell, primitive_norm
from deepsolid_tpu.scf.gto import PeriodicAOEvaluator
from deepsolid_tpu.scf.integrals import CART
from deepsolid_tpu.system import Atom, Cell, make_supercell

pytestmark = pytest.mark.slow  # grid-oracle module: minutes-scale

L = 9.0


def d_system():
    cell = Cell.from_atoms(
        [Atom("H", (0.3, 0.1, 0.0)), Atom("H", (2.0, 0.2, 0.4))],
        np.eye(3) * L,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = [
        Shell(l=0, exponents=np.array([1.1, 0.25]),
              coefficients=np.array([0.5, 0.6]), atom_index=0,
              center=np.array([0.3, 0.1, 0.0])),
        Shell(l=2, exponents=np.array([0.9, 0.3]),
              coefficients=np.array([0.7, 0.4]), atom_index=1,
              center=np.array([2.0, 0.2, 0.4])),
    ]
    return sc, shells


def grid_aos(shells, n=54, images=1):
    xs = (np.arange(n) + 0.5) / n * L
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    import itertools

    cols = []
    for sh in shells:
        norm = primitive_norm(sh.exponents, sh.l)
        vals = np.zeros((len(pts), sh.nfunc))
        for m in itertools.product(range(-images, images + 1), repeat=3):
            center = sh.center + np.asarray(m, np.float64) * L
            d = pts - center
            r2 = np.sum(d * d, -1)
            rad = np.exp(-r2[:, None] * sh.exponents) @ (
                sh.coefficients * norm
            )
            for ci, (lx, ly, lz) in enumerate(CART[sh.l]):
                vals[:, ci] += (
                    d[:, 0] ** lx * d[:, 1] ** ly * d[:, 2] ** lz * rad
                )
        cols.append(vals)
    return pts, np.concatenate(cols, axis=1), (L / n) ** 3


def test_overlap_and_pair_ft_vs_grid():
    sc, shells = d_system()
    kpts = np.zeros((1, 3))
    s_k, t_k, v_k = hf_lib.core_matrices(sc.prim, shells, kpts, eps=1e-10)
    pts, aos, dv = grid_aos(shells)
    s_grid = np.einsum("pa,pb->ab", aos, aos) * dv
    np.testing.assert_allclose(s_k[0].real, s_grid, rtol=2e-3, atol=3e-4)

    g = np.array([[2 * np.pi / L, 0, 0], [0, 0, 4 * np.pi / L]])
    rho = eri.bloch_pair_ft(shells, sc.lattice, kpts, g)[0]
    for gi in range(2):
        phase = np.exp(-1j * pts @ g[gi])
        want = np.einsum("pa,pb,p->ab", aos, aos, phase) * dv
        np.testing.assert_allclose(rho[..., gi], want, rtol=5e-3, atol=5e-4)


def test_core_beta_independence_with_d():
    """Ewald-split nuclear attraction must not depend on the split beta
    — exercises the erfc McMurchie-Davidson path at tmax = 4."""
    sc, shells = d_system()
    kpts = np.zeros((1, 3))
    _, _, v1 = hf_lib.core_matrices(sc.prim, shells, kpts, beta=0.7)
    _, _, v2 = hf_lib.core_matrices(sc.prim, shells, kpts, beta=1.1)
    np.testing.assert_allclose(v1, v2, atol=1e-8)


def test_jk_beta_independence_with_d():
    """Split J/K with a d shell: SR erfc ERI quartets up to (dd|dd)."""
    sc, shells = d_system()
    kpts = np.zeros((1, 3))
    nao = 7
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, nao, 2))
    dm = np.einsum("kai,kbi->kab", x, x).astype(np.complex128)

    def split(beta):
        s_k, _, _ = hf_lib.core_matrices(sc.prim, shells, kpts, beta=beta)
        sr = eri.SrBlocks(shells, sc.lattice, kpts, beta, s_k, eps=1e-8)
        lr = eri.LrBlocks(
            shells, sc.lattice, kpts, beta, sc.prim.volume,
            eri.full_gpoints(sc.lattice, beta),
        )
        return (sr.coulomb(dm) + lr.coulomb(dm),
                sr.exchange(dm) + lr.exchange(dm))

    j1, k1 = split(0.8)
    j2, k2 = split(1.15)
    np.testing.assert_allclose(j1, j2, atol=5e-6)
    np.testing.assert_allclose(k1, k2, atol=5e-6)


def test_ao_evaluator_d_matches_grid():
    sc, shells = d_system()
    kpts = np.array([[0.1, 0.0, 0.05]])
    ev = PeriodicAOEvaluator.build(sc.prim, shells, kpts)
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, L, size=(5, 3))
    got = np.asarray(ev.eval_aos(pos))[0]

    import itertools

    want = np.zeros((5, 7), np.complex128)
    col = 0
    for sh in shells:
        norm = primitive_norm(sh.exponents, sh.l)
        for m in itertools.product(range(-2, 3), repeat=3):
            t_vec = np.asarray(m, np.float64) * L
            d = pos - sh.center - t_vec
            r2 = np.sum(d * d, -1)
            rad = np.exp(-r2[:, None] * sh.exponents) @ (
                sh.coefficients * norm
            )
            ph = np.exp(1j * kpts[0] @ t_vec)
            for ci, (lx, ly, lz) in enumerate(CART[sh.l]):
                want[:, col + ci] += (
                    d[:, 0] ** lx * d[:, 1] ** ly * d[:, 2] ** lz * rad * ph
                )
        col += sh.nfunc
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
