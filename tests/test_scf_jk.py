"""Long-range J/K matrices vs brute-force grid integration (H2, 1 k-point).

The oracle builds the Bloch AOs on a dense real-space grid over the cell,
forms the LR Coulomb kernel in G space, and contracts everything
numerically — pinning every normalization convention in scf/eri.py.
"""

import itertools

import numpy as np
import pytest

from deepsolid_tpu.scf import eri
from deepsolid_tpu.scf.basis import build_shells, primitive_norm
from deepsolid_tpu.scf.free_electron import twisted_kpts
from deepsolid_tpu.system import Atom, Cell, make_supercell

pytestmark = pytest.mark.slow  # grid-oracle module: minutes-scale


def setup_h2(L=6.0):
    cell = Cell.from_atoms(
        [Atom("H", (0.2, 0.1, 0.0)), Atom("H", (1.6, 0.0, 0.3))],
        np.eye(3) * L,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = twisted_kpts(sc)  # one k-point (gamma)
    return sc, shells, kpts


def grid_aos(shells, lattice, n=32, images=2):
    # midpoint rule on periodic Gaussians converges exponentially:
    # n=32 over L=6 gives ~5e-5 relative quadrature error for the
    # tightest STO-3G H pair (alpha_sum ~ 6.8), well inside the 5e-3
    # tolerances below, at ~3.4x less cost than the round-1 n=48
    """Bloch AOs at gamma on a uniform cell grid: (npts, nao)."""
    L = lattice[0, 0]
    xs = (np.arange(n) + 0.5) / n * L
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    aos = []
    for sh in shells:
        norm = primitive_norm(sh.exponents, sh.l)
        vals = 0.0
        for m in itertools.product(range(-images, images + 1), repeat=3):
            center = sh.center + np.asarray(m, np.float64) @ lattice
            d = pts - center
            r2 = np.sum(d * d, -1)
            rad = np.exp(-r2[:, None] * sh.exponents) @ (sh.coefficients * norm)
            if sh.l == 0:
                vals = vals + rad[:, None]
            else:
                vals = vals + d * rad[:, None]
        aos.append(vals if sh.l else vals)
    cols = []
    for sh, v in zip(shells, aos):
        cols.append(v.reshape(len(pts), -1))
    return pts, np.concatenate(cols, axis=1), (L / n) ** 3


def test_pair_ft_convention():
    """bloch_pair_ft at gamma equals the grid FT of the periodic pair."""
    sc, shells, kpts = setup_h2()
    g = np.array([[2 * np.pi / 6.0, 0, 0], [0, 4 * np.pi / 6.0, 0]])
    rho = eri.bloch_pair_ft(shells, sc.lattice, kpts, g)[0]
    pts, aos, dv = grid_aos(shells, sc.lattice)
    for gi in range(2):
        phase = np.exp(-1j * pts @ g[gi])
        want = np.einsum("pa,pb,p->ab", aos, aos, phase) * dv
        np.testing.assert_allclose(rho[..., gi], want, rtol=2e-3, atol=2e-4)


def test_lr_coulomb_vs_grid():
    """J_LR from eri.coulomb_lr equals the grid LR-Hartree matrix."""
    sc, shells, kpts = setup_h2()
    beta = 0.6
    volume = sc.volume

    # G set: all recip points with non-negligible LR weight
    b = 2 * np.pi / 6.0
    rng = range(-7, 8)
    gpts = np.array([[i * b, j * b, k * b] for i in rng for j in rng for k in rng])
    gw = eri.lr_weights(gpts, beta, volume)
    keep = gw > 1e-14
    gpts, gw = gpts[keep], gw[keep]

    rho = eri.bloch_pair_ft(shells, sc.lattice, kpts, gpts)
    rng_np = np.random.RandomState(0)
    dm = rng_np.rand(1, rho.shape[1], rho.shape[1])
    dm = (dm + dm.transpose(0, 2, 1)) / 2

    got = eri.coulomb_lr(rho, dm, gw)[0]

    # oracle: grid FTs (independent of the analytic pair FTs) contracted
    # with the textbook formula J = sum_G w conj(F_munu) n_hat(G)
    pts, aos, dv = grid_aos(shells, sc.lattice)
    ft = np.einsum(
        "pa,pb,pg->abg", aos, aos, np.exp(-1j * pts @ gpts.T)
    ) * dv
    n_hat = np.einsum("ab,abg->g", dm[0], ft)
    want = np.einsum("abg,g,g->ab", np.conj(ft), gw, n_hat)
    np.testing.assert_allclose(got.real, want.real, rtol=5e-3, atol=5e-4)


def test_lr_exchange_vs_grid():
    """K_LR at gamma equals the grid exchange with the LR kernel."""
    sc, shells, kpts = setup_h2()
    beta = 0.6
    volume = sc.volume
    b = 2 * np.pi / 6.0
    rng = range(-7, 8)
    gpts = np.array([[i * b, j * b, k * b] for i in rng for j in rng for k in rng])
    gw0 = eri.lr_weights(gpts, beta, volume)
    keep = gw0 > 1e-14
    gpts = gpts[keep]

    rng_np = np.random.RandomState(1)
    nao = 2
    dm = rng_np.rand(1, nao, nao)
    dm = (dm + dm.transpose(0, 2, 1)) / 2

    got = eri.exchange_lr(shells, sc.lattice, kpts, gpts,
                          eri.lr_weights(gpts, beta, volume), dm, beta,
                          volume)[0]

    # oracle: K[mu nu] = sum_{ls} D[ls] (mu l | v_LR | s nu) on the grid:
    # (mu l| v |s nu) = sum_G w(G) FT[mu l](G) conj(FT[s nu](G))
    pts, aos, dv = grid_aos(shells, sc.lattice)
    gw = eri.lr_weights(gpts, beta, volume)
    ft = np.einsum(
        "pa,pb,pg->abg", aos, aos, np.exp(-1j * pts @ gpts.T)
    ) * dv
    want = np.einsum("ls,alg,g,sbg->ab", dm[0], ft, gw, np.conj(ft))
    np.testing.assert_allclose(got.real, want.real, rtol=5e-3, atol=5e-4)
