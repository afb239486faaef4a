"""Free-space UHF validation: pins basis tables + integral engine to
literature Hartree-Fock energies, independent of the periodic machinery.

The reference gets this layer from PySCF (DeepSolid/hf.py:26,61-81);
here scf/molecular.py runs on our own McMurchie-Davidson integrals, so
these literature anchors certify the basis data in scf/basis.py AND the
bare-Coulomb ERI (scf/integrals.eri_prim) at once. Cartesian d shells
dip slightly below published spherical-harmonic values (see
scf/molecular.py docstring), hence the asymmetric tolerances.
"""

import numpy as np
import pytest

from deepsolid_tpu.scf.basis import build_shells
from deepsolid_tpu.scf.molecular import run_uhf_molecular


class _Cell:
    def __init__(self, syms, coords):
        self.atom_symbols = syms
        self.atom_coords = np.asarray(coords, float)


def _uhf(syms, coords, charges, nelec, basis):
    shells = build_shells(_Cell(syms, coords), basis, exp_to_discard=0.0)
    nuclei = [(float(z), np.asarray(c, float)) for z, c in zip(charges, coords)]
    e, eps, c = run_uhf_molecular(shells, nuclei, nelec)
    return e


def test_h2_sto3g_matches_szabo_ostlund():
    """H2 at R=1.4 a0, STO-3G (zeta=1.24): E = -1.11671 Ha (Szabo &
    Ostlund, Modern Quantum Chemistry, Table 3.11)."""
    e = _uhf(["H", "H"], [[0, 0, 0], [1.4, 0, 0]], [1, 1], (1, 1), "sto-3g")
    assert abs(e - (-1.11671)) < 2e-5, e


def test_h_atom_ccpvdz():
    """H atom HF/cc-pVDZ = -0.499278 Ha (exact: -0.5)."""
    e = _uhf(["H"], [[0, 0, 0]], [1], (1, 0), "ccpvdz")
    assert abs(e - (-0.499278)) < 2e-5, e


@pytest.mark.slow
@pytest.mark.parametrize(
    "sym,z,nelec,e_pub",
    [
        ("N", 7, (5, 2), -54.39112),  # 4S
        ("O", 8, (5, 3), -74.79227),  # 3P
    ],
)
def test_heavy_atom_ccpvdz_uhf(sym, z, nelec, e_pub):
    """N/O ground-state UHF/cc-pVDZ vs published (spherical-d) values;
    cartesian d allows up to ~3 mHa below, never above."""
    e = _uhf([sym], [[0, 0, 0]], [z], nelec, "ccpvdz")
    assert e_pub - 3e-3 < e < e_pub + 1e-3, (sym, e)
