"""cc-pVDZ basis validation against literature Hartree-Fock anchors.

The built-in tables (scf/basis.py:_CCPVDZ) are validated by free-atom UHF
in a large periodic box: the exchange Madelung correction removes the
leading finite-size error, the residual decays ~1/L^3. Measured box series
(this repo, run_uhf):

  H : L=12 -0.503057, L=16 -0.500803, L=20 -0.500058 -> extrap -0.49928
      (literature UHF/cc-pVDZ: -0.499278)
  C : L=12 -37.698722, L=16 -37.691873, L=20 -37.689360 -> extrap -37.687
      (literature UHF/cc-pVDZ approx -37.6866; cartesian d lowers slightly)
  Li: L=16 -7.447106, L=20 -7.438039, L=24 -7.435360 -> extrap -7.4342
      (literature UHF/cc-pVDZ: -7.43242; very diffuse basis converges slower)

A single wrong contraction coefficient shifts these by tens of mHa, so the
windows below are sharply discriminating while leaving room for the
finite-box residual. Reference parity: the reference obtains these bases
via PySCF (DeepSolid/hf.py:26,61-81).
"""

import numpy as np
import pytest

from deepsolid_tpu.scf import basis as basis_lib
from deepsolid_tpu.scf import hf as hf_lib
from deepsolid_tpu.system import Atom, Cell, make_supercell

_ATOM_SPIN = {"H": 1, "Li": 1, "C": 2}


def _atom_uhf(sym, box, basis="cc-pvdz"):
    cell = Cell.from_atoms(
        [Atom(sym, (box / 2,) * 3)], np.eye(3) * box, spin=_ATOM_SPIN[sym]
    )
    make_supercell(cell, np.eye(3))  # sanity: builds
    sc = make_supercell(cell, np.eye(3))
    shells = basis_lib.build_shells(cell, basis, exp_to_discard=0.0)
    mf = hf_lib.run_uhf(sc, shells, np.zeros((1, 3)))
    assert mf.converged, (sym, box)
    return mf.e_tot


def test_ccpvdz_h_atom():
    e = _atom_uhf("H", 16.0)
    assert abs(e - (-0.499278)) < 2.5e-3, e


@pytest.mark.slow
def test_ccpvdz_c_atom():
    e = _atom_uhf("C", 16.0)
    assert abs(e - (-37.6866)) < 8e-3, e


@pytest.mark.slow
def test_ccpvdz_li_atom():
    e = _atom_uhf("Li", 20.0)
    assert abs(e - (-7.43242)) < 1e-2, e


def test_ccpvdz_shell_structure():
    # H: [2s,1p] -> 2 + 3 = 5 cartesian AOs; Li/C: [3s,2p,1d] -> 3+6+6 = 15
    for sym, nao in (("H", 5), ("Li", 15), ("C", 15)):
        cell = Cell.from_atoms(
            [Atom(sym, (0, 0, 0))], np.eye(3) * 10.0, spin=_ATOM_SPIN[sym]
        )
        shells = basis_lib.build_shells(cell, "ccpvdz", exp_to_discard=0.0)
        assert basis_lib.num_ao(shells) == nao, sym


def test_unknown_basis_raises():
    cell = Cell.from_atoms([Atom("H", (0, 0, 0))], np.eye(3) * 10.0, spin=1)
    with pytest.raises(NotImplementedError):
        basis_lib.build_shells(cell, "cc-pvtz")
    with pytest.raises(NotImplementedError):
        basis_lib.ccpvdz_shells_for_atom(9)  # F not tabulated


def test_unknown_basis_is_hard_error_in_pretrain_source():
    """A requested-but-unsupported basis must raise, never silently fall
    back to plane waves (round-1 advisory)."""
    from deepsolid_tpu.configs import two_hydrogen_cell
    from deepsolid_tpu.train import pretrain as pretrain_lib

    cfg = two_hydrogen_cell.get_config("H,1,1,1,2.0,0,cc-pvqz")
    from deepsolid_tpu.train.process import _ensure_supercell

    sc = _ensure_supercell(cfg.system.cell)
    with pytest.raises(NotImplementedError):
        pretrain_lib.make_orbital_source(cfg, sc)


@pytest.mark.slow
def test_diamond_ccpvdz_native_scf_band_count():
    """configs/diamond.py with ccpvdz runs the native SCF orbital source
    end-to-end; band count per spin equals the electron count (VERDICT #3)."""
    from deepsolid_tpu.configs import diamond
    from deepsolid_tpu.train import pretrain as pretrain_lib
    from deepsolid_tpu.train.process import _ensure_supercell

    cfg = diamond.get_config("C,C,3.567,1,ccpvdz")
    sc = _ensure_supercell(cfg.system.cell)
    source = pretrain_lib.make_orbital_source(cfg, sc)
    # 2 C atoms x Z=6 = 12 electrons in the primitive cell, paired spins
    assert source.klist[0].shape == (sc.nelec[0], 3)
    assert source.klist[1].shape == (sc.nelec[1], 3)
    assert sc.nelec == (6, 6)
