"""Element-general ET-DZ basis generator tests (scf/etdz.py).

The generator replaces hand-copied per-element Gaussian tables with an
atomic even-tempered-bath UHF + own-orbital contraction; parity role:
the reference's any-element PySCF basis bridge (DeepSolid/hf.py:26).
Certification anchors are the published numerical ROHF limits (Koga &
Thakkar tables) — the bath must land within a few mHa, and open-shell
UHF may dip a few mHa below.
"""

import numpy as np
import pytest

from deepsolid_tpu.scf.basis import build_shells
from deepsolid_tpu.scf.etdz import (
    MAX_Z,
    _atomic_eri_tensor,
    _atomic_uhf,
    _n_occ_radial,
    bath_exponents,
    dz_shells_for_atom,
)

# numerical ROHF limits (Koga/Thakkar); UHF may sit a few mHa below
ROHF_LIMIT = {
    1: -0.5, 2: -2.861680, 3: -7.432727, 6: -37.688619,
    11: -161.858911, 12: -199.614636, 13: -241.876707, 14: -288.854362,
    15: -340.718781, 16: -397.504896, 17: -459.482072, 18: -526.817513,
    19: -599.164786, 20: -676.758185,
}


class _Cell:
    def __init__(self, syms, coords):
        self.atom_symbols = syms
        self.atom_coords = np.asarray(coords, float)


def _committed_z():
    """Z values with committed cache tables: all of 1..20, plus any 3d-row
    element whose table has landed (generation is hours of single-core
    ERI time per element; tables are committed as they are produced)."""
    import os

    from deepsolid_tpu.scf.etdz import _cache_path

    zs = list(range(1, 21))
    zs += [z for z in range(21, MAX_Z + 1) if os.path.exists(_cache_path(z))]
    return zs


def test_cached_tables_all_elements():
    """Every committed Z has a cache entry with the expected contraction
    structure (no regeneration in the default suite)."""
    for z in _committed_z():
        tabs = dz_shells_for_atom(z)
        n_s, n_p, n_d = _n_occ_radial(z)
        s_shells = [t for t in tabs if t[0] == 0]
        p_shells = [t for t in tabs if t[0] == 1]
        d_shells = [t for t in tabs if t[0] == 2]
        # occupied contractions + 2 free diffuse s
        assert len(s_shells) == n_s + 2, (z, len(s_shells))
        if z >= 5:
            assert len(p_shells) == n_p + 2
        if z >= 21:
            # occupied 3d contraction + 2 free diffuse d, no f pol
            assert len(d_shells) == n_d + 2
        elif z >= 3:
            assert len(d_shells) == 1  # d polarization
        for l, e, c in tabs:
            assert np.all(np.isfinite(e)) and np.all(np.isfinite(c))
            assert np.all(np.asarray(e) > 0)


def test_out_of_range_hard_fails():
    with pytest.raises(NotImplementedError):
        dz_shells_for_atom(MAX_Z + 1)  # occupied-d element


def test_build_shells_etdz_wiring():
    shells = build_shells(_Cell(["Na"], [[0.0, 0.0, 0.0]]), "et-dz",
                          exp_to_discard=0.0)
    assert sum(s.nfunc for s in shells) > 10
    ls = {s.l for s in shells}
    assert ls == {0, 1, 2}


@pytest.mark.slow
def test_bath_uhf_hits_hf_limit_na():
    """Regenerate the Na bath from scratch: atomic UHF within
    [-1, +3] mHa of the numerical ROHF limit certifies the even-tempered
    bath AND the vectorized one-center ERI builder."""
    e, _, _ = _atomic_uhf(11, bath_exponents(11))
    diff = e - ROHF_LIMIT[11]
    assert -1e-3 < diff < 3e-3, e


@pytest.mark.slow
@pytest.mark.parametrize("z", [11, 12, 13, 14, 15, 16, 17, 18])
def test_bath_uhf_third_row_literature_pins(z):
    """Na..Ar free-space UHF pinned to the numerical Hartree-Fock limits
    (Koga/Thakkar) within [-3, +1.5] mHa — the round-2 verdict's
    done-criterion for third-row element coverage (the reference gets
    these atoms from PySCF's basis library, DeepSolid/hf.py:26). Upper
    bound = bath incompleteness budget. Lower bound: UHF sits BELOW the
    restricted limit for open shells by the spin-polarization energy
    (e.g. S(3P): measured -1.4 mHa here vs a ~2.4 mHa UHF-ROHF gap at
    the basis-set limit), so dips up to 3 mHa are physical, not a bath
    defect."""
    e, _, _ = _atomic_uhf(z, bath_exponents(z))
    diff = e - ROHF_LIMIT[z]
    assert -3e-3 < diff < 1.5e-3, (z, e, diff)


@pytest.mark.slow
def test_contracted_basis_preserves_atomic_energy_si():
    """The contracted ET-DZ basis spans the occupied atomic space by
    construction: projecting the bath integrals onto the contraction
    and re-running UHF must reproduce the bath energy to DZ-contraction
    quality. Measured with the ratio-2.1 bath: 0.41 mHa on Si (289 Ha
    total) — ordinary double-zeta truncation, and far inside what a
    pretrain seed needs; the gate guards against a broken contraction
    (errors of many mHa), not against DZ truncation itself."""
    from deepsolid_tpu.scf.basis import Shell, primitive_norm
    from deepsolid_tpu.scf.molecular import (
        one_electron_matrices,
        run_uhf_molecular,
    )
    from deepsolid_tpu.system import elements

    z = 14
    bath = bath_exponents(z)
    e_bath, c_occ, bath_shells = _atomic_uhf(z, bath)

    tabs = dz_shells_for_atom(z)
    center = np.zeros(3)
    # contraction matrix T: bath AO -> contracted AO, exploiting that
    # every contracted shell is a combination of bath primitives
    offs = np.cumsum([0] + [s.nfunc for s in bath_shells])
    nao_bath = offs[-1]
    cols = []
    for l, exps, coefs in tabs:
        if l == 2:
            continue  # polarization d is not in the bath
        nfunc = (l + 1) * (l + 2) // 2
        for comp in range(nfunc):
            col = np.zeros(nao_bath)
            for a, c in zip(exps, coefs):
                # find the bath shell with this exponent and l
                for i, s in enumerate(bath_shells):
                    if s.l == l and np.isclose(s.exponents[0], a):
                        # both sides are coefficients over NORMALIZED
                        # primitives, so the weight is just c
                        col[offs[i] + comp] += c
                        break
                else:
                    raise AssertionError("contraction exponent not in bath")
            cols.append(col)
    T = np.stack(cols, axis=1)  # (nao_bath, nao_contracted)

    S, Tk, V = one_electron_matrices(
        bath_shells, [(float(z), center)]
    )
    eri = _atomic_eri_tensor(bath_shells)
    S_c = T.T @ S @ T
    h_c = T.T @ (Tk + V) @ T
    eri_c = np.einsum("pqrs,pi,qj,rk,sl->ijkl", eri, T, T, T, T,
                      optimize=True)

    # run UHF directly in the contracted space
    el = elements.from_number(z)
    nao_c = T.shape[1]

    s_eig, s_vec = np.linalg.eigh(S_c)
    keep = s_eig > 1e-9 * s_eig.max()
    X = s_vec[:, keep] / np.sqrt(s_eig[keep])

    def solve(F):
        e_o, c_o = np.linalg.eigh(X.T @ F @ X)
        return e_o, X @ c_o

    nelec = (el.nalpha, el.nbeta)
    eps0, c0 = solve(h_c)
    dms = [c0[:, :n] @ c0[:, :n].T for n in nelec]
    e_prev = None
    for _ in range(200):
        d_tot = dms[0] + dms[1]
        J = np.einsum("ijkl,kl->ij", eri_c, d_tot)
        e_elec, new_dms = 0.0, []
        for s in range(2):
            K = np.einsum("ikjl,kl->ij", eri_c, dms[s])
            F = h_c + J - K
            e_elec += 0.5 * np.sum(dms[s] * (h_c + F))
            _, c = solve(F)
            new_dms.append(c[:, : nelec[s]] @ c[:, : nelec[s]].T)
        if e_prev is not None and abs(e_elec - e_prev) < 1e-10:
            break
        dms = [0.7 * n + 0.3 * o for n, o in zip(new_dms, dms)]
        e_prev = e_elec
    assert abs(e_elec - e_bath) < 6e-4, (e_elec, e_bath)


def test_sto3g_third_row_variational_and_ordering():
    """STO-3G Na..Ar: above the HF limit (variational; catches gross
    table typos) and within 2% of it (catches a wrong zeta digit)."""
    from deepsolid_tpu.scf.molecular import run_uhf_molecular
    from deepsolid_tpu.system import elements

    for z in (11, 14, 16, 17):
        shells = build_shells(
            _Cell([elements.number_to_symbol(z)], [[0.0, 0.0, 0.0]]),
            "sto-3g", exp_to_discard=0.0,
        )
        el = elements.from_number(z)
        e, _, _ = run_uhf_molecular(
            shells, [(float(z), np.zeros(3))], (el.nalpha, el.nbeta)
        )
        limit = ROHF_LIMIT[z]
        assert e > limit, (z, e)  # variational
        assert e < limit * (1.0 - 0.02), (z, e)  # within 2% of the limit


# ---------------------------------------------------------------------------
# 3d row (Z = 21..30): s/p/d occupancy through Zn
# ---------------------------------------------------------------------------

# Approximate numerical ROHF ground-term limits (Koga/Thakkar tables,
# quoted here to ~mHa recall accuracy — hence the loose bands below).
APPROX_NHF_3D = {
    21: -759.735718, 22: -848.405997, 23: -942.884338, 24: -1043.356376,
    25: -1149.866252, 26: -1262.443665, 27: -1381.414553, 28: -1506.870908,
    29: -1638.963742, 30: -1777.848116,
}


@pytest.mark.parametrize("z", sorted(APPROX_NHF_3D))
def test_3d_row_cached_bath_energy_bands(z):
    """Committed 3d-row tables carry their generating bath UHF energy
    (stored in the cache npz); certify against the approximate numerical
    HF limits within a loose band. Upper bound: bath incompleteness
    (even-tempered DZ-grade d bath). Lower bound: single-determinant
    UHF with cartesian Gaussians breaks the LS-term equivalence
    restrictions of the published limits — open d shells may dip tens of
    mHa below, which is physics, not a generator defect. Fast: reads the
    committed energy, regenerates nothing."""
    import os as _os

    from deepsolid_tpu.scf.etdz import _cache_path, bath_energy

    if not _os.path.exists(_cache_path(z)):
        pytest.skip(f"3d table Z={z} not committed yet (hours of "
                    "single-core ERI per element; runs/gen_etdz_3d.py)")
    e = bath_energy(z)
    assert e is not None, "committed 3d table must store e_bath"
    diff = e - APPROX_NHF_3D[z]
    assert -0.08 < diff < 0.03, (z, e, diff)


@pytest.mark.parametrize("z", sorted(APPROX_NHF_3D))
def test_3d_row_table_structure(z):
    """Committed 3d tables: 4 s contractions (1s..4s), 2 p (2p, 3p),
    1 d (3d), each with 2 free diffuse primitives, no f polarization."""
    import os as _os

    from deepsolid_tpu.scf.etdz import _cache_path

    if not _os.path.exists(_cache_path(z)):
        pytest.skip("not committed yet")
    tabs = dz_shells_for_atom(z)
    by_l = {l: [t for t in tabs if t[0] == l] for l in (0, 1, 2, 3)}
    assert len(by_l[0]) == 4 + 2
    assert len(by_l[1]) == 2 + 2
    assert len(by_l[2]) == 1 + 2
    assert len(by_l[3]) == 0
