"""Short-range erfc ERIs + self-consistent UHF validation.

Strategy:
  * SR + LR must reassemble the FULL periodic Coulomb: compare the
    Ewald-split J/K (sr_eri_tensors + LrBlocks at a given beta) against
    a bare-kernel reciprocal-space evaluation on a large G set (the LR
    machinery itself is grid-validated in tests/test_scf_jk.py, so with
    beta=None and enough G vectors it is an independent oracle for the
    total).
  * beta-independence: the split point is arbitrary; two betas must
    give the same total J/K.
  * molecular limit: periodic UHF for H2 in a large box must reproduce
    the textbook molecular RHF/STO-3G energy (Szabo & Ostlund:
    E = -1.1167 Ha at R = 1.4 a0) once the exxdiv Madelung correction
    removes the leading finite-size error.
"""

import numpy as np
import pytest


from deepsolid_tpu.scf import eri
from deepsolid_tpu.scf import hf as hf_lib
from deepsolid_tpu.scf.basis import build_shells
from deepsolid_tpu.scf.free_electron import twisted_kpts
from deepsolid_tpu.system import Atom, Cell, make_supercell


def setup_h2(L=8.0):
    # L=8 keeps the bare-kernel oracle G set ~3.4x smaller than the
    # round-1 L=12 box (suite hygiene, VERDICT weak #7) with identical
    # discriminating power — the split identity holds for any cell.
    cell = Cell.from_atoms(
        [Atom("H", (0.2, 0.1, 0.0)), Atom("H", (1.6, 0.0, 0.3))],
        np.eye(3) * L,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    return sc, shells


def random_dm(nk, nao, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(nk, nao, 2)) + 1j * rng.normal(size=(nk, nao, 2))
    return np.einsum("kai,kbi->kab", x, x.conj())


def split_jk(sc, shells, kpts, beta, dm_spin):
    lattice = np.asarray(sc.prim.lattice)
    volume = abs(np.linalg.det(lattice))
    s_k, _, _ = hf_lib.core_matrices(sc.prim, shells, kpts, beta=beta)
    sr = eri.SrBlocks(shells, lattice, kpts, beta, s_k, eps=1e-9)
    lr = eri.LrBlocks(
        shells, lattice, kpts, beta, volume, eri.full_gpoints(lattice, beta)
    )
    j = sr.coulomb(dm_spin) + lr.coulomb(dm_spin)
    k = sr.exchange(dm_spin) + lr.exchange(dm_spin)
    return j, k


def bare_jk(sc, shells, kpts, dm_spin, gmax=16.0):
    """Full periodic J/K from the bare reciprocal-space kernel (oracle)."""
    lattice = np.asarray(sc.prim.lattice)
    volume = abs(np.linalg.det(lattice))
    recip = 2 * np.pi * np.linalg.inv(lattice).T
    nmax = int(np.ceil(gmax / np.linalg.norm(recip, axis=1).min())) + 1
    grid = np.arange(-nmax, nmax + 1)
    pts = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    gpts = pts.reshape(-1, 3) @ recip
    gpts = gpts[np.linalg.norm(gpts, axis=1) <= gmax]
    lr = eri.LrBlocks(shells, lattice, kpts, None, volume, gpts)
    return lr.coulomb(dm_spin), lr.exchange(dm_spin)


@pytest.fixture(scope="module")
def h2_gamma():
    sc, shells = setup_h2()
    kpts = twisted_kpts(sc)
    dm = random_dm(kpts.shape[0], 2, seed=0)
    return sc, shells, kpts, dm


def test_jk_total_matches_bare_oracle(h2_gamma):
    sc, shells, kpts, dm = h2_gamma
    j, k = split_jk(sc, shells, kpts, beta=0.9, dm_spin=dm)
    j_ref, k_ref = bare_jk(sc, shells, kpts, dm)
    np.testing.assert_allclose(j, j_ref, atol=2e-6)
    np.testing.assert_allclose(k, k_ref, atol=2e-6)


def test_jk_beta_independence(h2_gamma):
    sc, shells, kpts, dm = h2_gamma
    j1, k1 = split_jk(sc, shells, kpts, beta=0.7, dm_spin=dm)
    j2, k2 = split_jk(sc, shells, kpts, beta=1.2, dm_spin=dm)
    np.testing.assert_allclose(j1, j2, atol=1e-7)
    np.testing.assert_allclose(k1, k2, atol=1e-7)


def test_jk_hermitian(h2_gamma):
    sc, shells, kpts, dm = h2_gamma
    j, k = split_jk(sc, shells, kpts, beta=0.9, dm_spin=dm)
    np.testing.assert_allclose(j, j.conj().transpose(0, 2, 1), atol=1e-9)
    np.testing.assert_allclose(k, k.conj().transpose(0, 2, 1), atol=1e-9)


@pytest.mark.slow
def test_exchange_multi_k_beta_independence():
    """Mixed-k exchange (B-translation phases) must also be split-invariant."""
    sc, shells = setup_h2(L=10.0)
    kpts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, np.pi / 10.0]])
    dm = random_dm(2, 2, seed=3)
    j1, k1 = split_jk(sc, shells, kpts, beta=0.7, dm_spin=dm)
    j2, k2 = split_jk(sc, shells, kpts, beta=1.1, dm_spin=dm)
    np.testing.assert_allclose(j1, j2, atol=1e-7)
    np.testing.assert_allclose(k1, k2, atol=1e-7)


@pytest.mark.slow
def test_h2_uhf_molecular_limit():
    """Periodic UHF -> molecular RHF/STO-3G as the box grows.

    The exact molecular value from these same integrals is
    E = -1.1167148 Ha (H2, R = 1.4 a0, STO-3G; Szabo & Ostlund quote
    -1.1167). With the exxdiv Madelung correction the finite-size error
    follows a clean L^-3 law (measured: -5.85, -2.97, -1.72, -0.94 mHa
    at L = 12, 15, 18, 22 — successive ratios match (L2/L1)^3)."""
    e_mol = -1.1167148
    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0)), Atom("H", (1.4, 0.0, 0.0))],
        np.eye(3) * 12.0,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = twisted_kpts(sc)
    mf = hf_lib.run_uhf(sc, shells, kpts)
    assert mf.converged, f"UHF failed to converge in {mf.n_cycles} cycles"
    err = mf.e_tot - e_mol
    # below molecular (image attraction) by the known L^-3 amount
    assert -8e-3 < err < 0.0, mf.e_tot


def test_h_atom_uhf_molecular_limit():
    """One-electron UHF: J cancels bare K exactly; exxdiv + Ewald-split
    constants must reassemble the isolated H/STO-3G energy (-0.4665817
    from these integrals) with only an O(1/L^3) residual."""
    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0))], np.eye(3) * 14.0, spin=1
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = twisted_kpts(sc)
    mf = hf_lib.run_uhf(sc, shells, kpts)
    assert mf.converged
    assert abs(mf.e_tot - (-0.4665817)) < 2e-3, mf.e_tot


@pytest.mark.slow
def test_scforbitals_hf_level():
    """ScfOrbitals(level='hf') produces a usable orbital source."""
    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0)), Atom("H", (1.4, 0.0, 0.0))],
        np.eye(3) * 12.0,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    orbs = hf_lib.ScfOrbitals.build(sc, basis="sto-3g", level="hf")
    assert orbs.klist[0].shape == (1, 3)
    x = np.random.default_rng(0).normal(size=(3, 6)) * 2.0
    mats = orbs.orbital_mats(x)
    assert mats[0].shape == (3, 1, 1)


def test_level_shift_damp_same_fixed_point():
    """The rescue-pass knobs (level shift on virtuals + pre-DIIS Fock
    damping) leave the converged UHF fixed point unchanged: at
    idempotency Q D S = 0, so the shifted Fock has the same occupied
    solutions and the same FDS-SDF error (scf/hf.py:_scf_cycles)."""
    from deepsolid_tpu.scf import eri as eri_lib
    from deepsolid_tpu.ops.ewald import EwaldSum
    from deepsolid_tpu.scf.hf import (
        _density, _fill_aufbau, _scf_cycles, _solve_bands, core_matrices,
        exx_madelung,
    )

    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0)), Atom("H", (1.4, 0.0, 0.0))],
        np.eye(3) * 12.0,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = twisted_kpts(sc)

    prim = sc.prim
    lattice = np.asarray(prim.lattice)
    volume = abs(np.linalg.det(lattice))
    beta = 5.0 / volume ** (1.0 / 3.0)
    s_k, t_k, v_k = core_matrices(prim, shells, kpts, beta=beta)
    h_k = t_k + v_k
    sr = eri_lib.SrBlocks(shells, lattice, kpts, beta, s_k, 1e-8)
    gpts = eri_lib.full_gpoints(lattice, beta)
    lr = eri_lib.LrBlocks(shells, lattice, kpts, beta, volume, gpts)
    xi = exx_madelung(sc.lattice)
    e_nn = EwaldSum.build(prim).madelung
    n_occ = tuple(sc.nelec)
    eps0, c0 = _solve_bands(h_k, s_k)
    dm0 = [_density(c0, _fill_aufbau(eps0, n)) for n in n_occ]

    plain = _scf_cycles(h_k, s_k, sr, lr, xi, e_nn, n_occ,
                        [d.copy() for d in dm0], kpts.shape[0])
    shifted = _scf_cycles(h_k, s_k, sr, lr, xi, e_nn, n_occ,
                          [d.copy() for d in dm0], kpts.shape[0],
                          level_shift=0.3, damp=0.5, diis_start_cycle=5)
    assert plain.converged and shifted.converged
    np.testing.assert_allclose(shifted.e_tot, plain.e_tot, atol=2e-7)


def test_uhf_cache_skips_unconverged_entries(tmp_path, monkeypatch):
    """An unconverged cached UHF entry must be recomputed, not served:
    the rescue pass / damping defaults can improve after the entry was
    written, and a converged=False hit would pin the run forever
    (scf/hf.py:run_uhf_cached)."""
    monkeypatch.setenv("DEEPSOLID_TPU_SCF_CACHE", str(tmp_path))
    sc, shells = setup_h2()
    kpts = twisted_kpts(sc)

    eps = ([np.zeros(2)], [np.zeros(2)])
    c = ([np.eye(2, dtype=complex)], [np.eye(2, dtype=complex)])
    calls = []

    def fake_run_uhf(sc_, shells_, kpts_, converged):
        calls.append(converged)
        return hf_lib.MeanField(e_tot=-1.0, converged=converged,
                                eps=eps, c=c, n_cycles=7)

    monkeypatch.setattr(
        hf_lib, "run_uhf", lambda *a, **k: fake_run_uhf(*a, converged=False)
    )
    mf1 = hf_lib.run_uhf_cached(sc, shells, kpts, "sto-3g")
    assert not mf1.converged and calls == [False]

    # second call: the unconverged entry on disk must NOT short-circuit
    monkeypatch.setattr(
        hf_lib, "run_uhf", lambda *a, **k: fake_run_uhf(*a, converged=True)
    )
    mf2 = hf_lib.run_uhf_cached(sc, shells, kpts, "sto-3g")
    assert mf2.converged and calls == [False, True]

    # third call: converged entry IS served (no recompute)
    mf3 = hf_lib.run_uhf_cached(sc, shells, kpts, "sto-3g")
    assert mf3.converged and calls == [False, True]
    np.testing.assert_allclose(mf3.c[0][0], c[0][0])


def test_fermi_occupations_sum_and_aufbau_limit():
    """Fractional occupations sum to n_occ at any sigma; as sigma -> 0
    they converge to the aufbau integer filling away from degeneracy."""
    rng = np.random.default_rng(5)
    eps_all = [np.sort(rng.uniform(-2.0, 2.0, 7)) for _ in range(3)]
    n_occ = 9
    for sigma in (0.5, 0.1, 0.01):
        occ = hf_lib._fermi_occupations(eps_all, n_occ, sigma)
        tot = sum(float(np.sum(o)) for o in occ)
        assert abs(tot - n_occ) < 1e-6, (sigma, tot)
        assert all(np.all((o >= 0) & (o <= 1)) for o in occ)
    cold = hf_lib._fermi_occupations(eps_all, n_occ, 1e-5)
    aufbau = hf_lib._fill_aufbau(eps_all, n_occ)
    for ki, bands in enumerate(aufbau):
        want = np.zeros(len(eps_all[ki]))
        want[bands] = 1.0
        np.testing.assert_allclose(cold[ki], want, atol=1e-6)


def test_density_frac_matches_integer_at_unit_occupations():
    rng = np.random.default_rng(6)
    c = [rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))]
    bands = [[0, 2]]
    frac = [np.array([1.0, 0.0, 1.0, 0.0])]
    np.testing.assert_allclose(
        hf_lib._density_frac(c, frac), hf_lib._density(c, bands), atol=1e-14
    )


@pytest.mark.slow
def test_smearing_anneal_reproduces_plain_uhf():
    """The Fermi-smearing anneal (sigma=0 final stage) must land on the
    same UHF fixed point a well-behaved plain SCF finds."""
    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0))], np.eye(3) * 14.0, spin=1
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = twisted_kpts(sc)
    plain = hf_lib.run_uhf(sc, shells, kpts)
    assert plain.converged

    from deepsolid_tpu.ops.ewald import EwaldSum

    prim = sc.prim
    lattice = np.asarray(prim.lattice)
    volume = abs(np.linalg.det(lattice))
    beta = 5.0 / volume ** (1.0 / 3.0)
    s_k, t_k, v_k = hf_lib.core_matrices(prim, shells, kpts, beta=beta)
    h_k = t_k + v_k
    sr = eri.SrBlocks(shells, lattice, kpts, beta, s_k, 1e-8)
    gpts = eri.full_gpoints(lattice, beta)
    lr = eri.LrBlocks(shells, lattice, kpts, beta, volume, gpts)
    xi = hf_lib.exx_madelung(sc.lattice)
    e_nn = EwaldSum.build(prim).madelung
    n_occ = tuple(sc.nelec)
    eps0, c0 = hf_lib._solve_bands(h_k, s_k)
    dm = [
        hf_lib._density(c0, hf_lib._fill_aufbau(eps0, n))
        for n in n_occ
    ]
    # warm anneal stages, then the sigma=0 stage the rescue path ends on
    for sigma in (0.2, 0.05, 0.01, 0.0):
        res = hf_lib._scf_cycles(
            h_k, s_k, sr, lr, xi, e_nn, n_occ, dm, kpts.shape[0],
            conv_tol=1e-8, damp=0.3, diis_start_cycle=3,
            smearing_sigma=sigma,
        )
    assert res.converged
    np.testing.assert_allclose(res.e_tot, plain.e_tot, atol=1e-7)


def test_krhf_matches_uhf_closed_shell():
    """restricted=True (KRHF, reference hf.py:61-81 parity): for a
    closed-shell system the restricted fixed point coincides with the
    UHF one, and the spin manifolds are tied by construction."""
    sc, shells = setup_h2()
    kpts = twisted_kpts(sc)
    u = hf_lib.run_uhf(sc, shells, kpts)
    r = hf_lib.run_uhf(sc, shells, kpts, restricted=True)
    assert u.converged and r.converged
    np.testing.assert_allclose(r.e_tot, u.e_tot, atol=1e-7)
    for ck_a, ck_b in zip(r.c[0], r.c[1]):
        np.testing.assert_array_equal(ck_a, ck_b)
    for ek_a, ek_b in zip(r.eps[0], r.eps[1]):
        np.testing.assert_array_equal(ek_a, ek_b)


def test_krhf_rejects_open_shell():
    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0))], np.eye(3) * 8.0, spin=1
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    with pytest.raises(ValueError, match="closed shell"):
        hf_lib.run_uhf(sc, shells, twisted_kpts(sc), restricted=True)


def test_scforbitals_rhf_level():
    """cfg.pretrain.scf='rhf' builds a restricted orbital source whose
    spin channels share one set of bands."""
    sc, shells = setup_h2()
    src = hf_lib.ScfOrbitals.build(sc, basis="sto-3g", level="rhf")
    np.testing.assert_array_equal(src.c_occ[0][0], src.c_occ[1][0])
