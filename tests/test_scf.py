"""Native SCF: integral oracles (numerical quadrature) + orbital source."""

import numpy as np
import pytest

from deepsolid_tpu.scf import integrals as ints
from deepsolid_tpu.scf.basis import build_shells, sto3g_shells_for_atom


import functools


@functools.lru_cache(maxsize=8)
def _grid_pts(half, n):
    xs = np.linspace(-half, half, n, endpoint=False) + half / n
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.stack([X, Y, Z], axis=-1).reshape(-1, 3), xs[1] - xs[0]


def grid_quad(f, center, half=9.0, n=121):
    """Midpoint quadrature of f over a cube around `center`."""
    pts0, dx = _grid_pts(float(half), int(n))
    return np.sum(f(pts0 + np.asarray(center))) * dx**3


def gauss(pts, l3, alpha, center):
    d = pts - center
    r2 = np.sum(d * d, -1)
    out = np.exp(-alpha * r2)
    for dim, l in enumerate(l3):
        out = out * d[:, dim] ** l
    return out


CASES = [
    ((0, 0, 0), (0, 0, 0), 0.9, 0.6),
    ((1, 0, 0), (0, 0, 0), 1.3, 0.5),
    ((0, 1, 0), (0, 0, 1), 0.8, 1.1),
    ((1, 0, 0), (1, 0, 0), 0.7, 0.9),
]
A = np.array([0.1, -0.2, 0.3])
B = np.array([-0.4, 0.5, 0.1])
C = np.array([0.3, 0.2, -0.6])


@pytest.mark.parametrize("la3,lb3,alpha,beta", CASES)
def test_overlap_vs_quadrature(la3, lb3, alpha, beta):
    got = ints.overlap_prim(la3, lb3, np.float64(alpha), np.float64(beta),
                            (A - B))
    want = grid_quad(
        lambda p: gauss(p, la3, alpha, A) * gauss(p, lb3, beta, B), (A + B) / 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("la3,lb3,alpha,beta", CASES)
def test_kinetic_vs_quadrature(la3, lb3, alpha, beta):
    got = ints.kinetic_prim(la3, lb3, np.float64(alpha), np.float64(beta),
                            (A - B))

    def lap_b(pts):
        # numerical Laplacian of the ket via central differences
        h = 1e-4
        out = -6.0 * gauss(pts, lb3, beta, B)
        for d in range(3):
            e = np.zeros(3)
            e[d] = h
            out = out + gauss(pts + e, lb3, beta, B) + gauss(pts - e, lb3, beta, B)
        return out / h**2

    want = -0.5 * grid_quad(
        lambda p: gauss(p, la3, alpha, A) * lap_b(p), (A + B) / 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "la3,lb3,alpha,beta,omega",
    # the two high-l quadrature oracles cost ~40 s each; one stays
    # default, the rest ride the slow lane (the nuclear path is also
    # pinned by every SCF literature-energy test)
    [
        pytest.param(*(CASES[0] + (None,)), marks=pytest.mark.slow),
        pytest.param(*(CASES[2] + (0.7,)), marks=pytest.mark.slow),
        CASES[3] + (None,),
    ],
)
def test_nuclear_vs_quadrature(la3, lb3, alpha, beta, omega):
    from scipy.special import erf, erfc

    got = ints.nuclear_prim(
        la3, lb3, np.float64(alpha), np.float64(beta), A, B, C, omega=omega
    )

    # split the kernel: smooth erf part on a wide grid; the 1/r-cusp erfc
    # part on a fine local grid around C (midpoint rule converges O(dx^2))
    a_split = 3.0

    def pair(pts):
        return gauss(pts, la3, alpha, A) * gauss(pts, lb3, beta, B)

    def f_smooth(pts):
        r = np.maximum(np.linalg.norm(pts - C, axis=-1), 1e-12)
        kern = erf(a_split * r) / r
        if omega is not None:
            kern = kern - erfc(omega * r) / r * 0  # placeholder, see below
        return pair(pts) * kern

    def f_cusp(pts):
        r = np.maximum(np.linalg.norm(pts - C, axis=-1), 1e-12)
        return pair(pts) * erfc(a_split * r) / r

    # offset the fine grids so no midpoint lands exactly on the 1/r cusp
    c_off = C + 0.0112358
    want_bare = grid_quad(f_smooth, (A + B) / 2, half=9.0, n=141) + grid_quad(
        f_cusp, c_off, half=3.0, n=241
    )
    if omega is None:
        want = want_bare
    else:
        # erf(w r)/r = 1/r - erfc(w r)/r; the erfc(w r)/r piece is also
        # cusped but short-ranged: fine local grid
        def f_att(pts):
            r = np.maximum(np.linalg.norm(pts - C, axis=-1), 1e-12)
            return pair(pts) * erfc(omega * r) / r

        want = want_bare - grid_quad(f_att, c_off, half=7.0, n=241)
    # residual cusp-grid bias bounds the oracle accuracy; the attenuated
    # oracle subtracts two cusped grids, doubling its bias
    tol = (2e-4, 3e-5) if omega is None else (6e-4, 1e-4)
    np.testing.assert_allclose(got, want, rtol=tol[0], atol=tol[1])


def test_pair_density_ft_vs_quadrature():
    g = np.array([[0.4, -0.3, 0.2], [1.0, 0.0, 0.0]])
    for la3, lb3, alpha, beta in CASES[:2]:
        got = ints.pair_density_ft(
            la3, lb3, np.float64(alpha), np.float64(beta), A, B, g
        )
        for gi in range(2):
            want = grid_quad(
                lambda p: gauss(p, la3, alpha, A)
                * gauss(p, lb3, beta, B)
                * np.exp(-1j * p @ g[gi]),
                (A + B) / 2,
            )
            np.testing.assert_allclose(got[gi], want, rtol=1e-6)


def test_sto3g_tables():
    shells = sto3g_shells_for_atom(6)  # carbon: 1s, 2s, 2p
    assert [l for l, _, _ in shells] == [0, 0, 1]
    np.testing.assert_allclose(shells[0][1][0], 71.6168, rtol=1e-3)
    np.testing.assert_allclose(shells[2][1][0], 2.9412, rtol=1e-3)


def test_h_atom_core_energy_periodic_limit():
    """Lowest core band of periodic H -> molecular STO-3G <1s|h|1s>."""
    from deepsolid_tpu.scf.hf import ScfOrbitals
    from deepsolid_tpu.system import Atom, Cell, make_supercell

    # molecular reference: E = (S^-1-normalized) <1s|T+V|1s> for STO-3G H
    exps, coefs = sto3g_shells_for_atom(1)[0][1:]
    from deepsolid_tpu.scf.basis import primitive_norm

    c = coefs * primitive_norm(exps, 0)
    al = exps[:, None]
    be = exps[None, :]
    zero = np.zeros(3)
    s = np.einsum("a,b,ab->", c, c, ints.overlap_prim((0,) * 3, (0,) * 3, al, be, zero))
    t = np.einsum("a,b,ab->", c, c, ints.kinetic_prim((0,) * 3, (0,) * 3, al, be, zero))
    v = -np.einsum(
        "a,b,ab->", c, c,
        ints.nuclear_prim((0,) * 3, (0,) * 3, al, be, zero, zero, zero),
    )
    e_mol = (t + v) / s
    np.testing.assert_allclose(e_mol, -0.466582, atol=2e-5)

    # The periodic eigenvalue carries the simple-cubic Madelung image
    # shift xi/L (electron at a nucleus sees all nuclear images +
    # background): check the CORRECTED value converges to the molecular
    # one, which also validates the Ewald-split potential's 1/L physics.
    # simple-cubic Madelung constant; the eigenvalue shift is +xi/L here:
    # the (positive) proton images + their neutralizing background raise
    # the electron's on-site energy
    XI_SC = 2.837297
    errs = []
    for L in (10.0, 20.0):
        cell = Cell.from_atoms([Atom("H", (0, 0, 0))], np.eye(3) * L, spin=1)
        sc = make_supercell(cell, np.eye(3))
        src = ScfOrbitals.build(sc, basis="sto-3g")
        eps = src.band_energies[0][0]
        errs.append(abs(eps - XI_SC / L - e_mol))
    assert errs[1] < errs[0]
    assert errs[1] < 0.01, errs


def test_scf_orbital_source_shapes_and_bloch():
    import jax
    import jax.numpy as jnp

    from deepsolid_tpu.scf.hf import ScfOrbitals

    from fixtures import lih_supercell

    sc = lih_supercell()
    src = ScfOrbitals.build(sc, basis="sto-3g")
    assert src.klist[0].shape == (2, 3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, sc.nelectron * 3) * 3)
    mats = src.orbital_mats(x)
    assert mats[0].shape == (2, 2, 2)
    assert np.all(np.isfinite(np.asarray(mats[0]).view(np.float64)))
    # Bloch periodicity: |psi| invariant under supercell translation of all e-
    L = jnp.tile(jnp.asarray(sc.lattice[1]), sc.nelectron)
    sl1 = np.asarray(src.slogdet(x))
    sl2 = np.asarray(src.slogdet(x + L))
    np.testing.assert_allclose(sl1, sl2, rtol=1e-6)
