"""Native (C++) SR-ERI quartet engine vs the pure-numpy reference path."""

import numpy as np
import pytest

from deepsolid_tpu import native
from deepsolid_tpu.scf import eri
from deepsolid_tpu.scf.basis import Shell, build_shells
from deepsolid_tpu.system import Atom, Cell, make_supercell

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native engine unavailable"
)


def test_native_matches_numpy_sp():
    L = 10.0
    cell = Cell.from_atoms(
        [Atom("H", (0.2, 0.1, 0.0)), Atom("H", (1.6, 0.0, 0.3))],
        np.eye(3) * L,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = build_shells(sc.prim, "sto-3g")
    kpts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, np.pi / L]])
    a = eri.sr_eri_tensors(shells, sc.lattice, kpts, 0.8, eps=1e-8,
                           engine="numpy")
    b = eri.sr_eri_tensors(shells, sc.lattice, kpts, 0.8, eps=1e-8,
                           engine="native")
    np.testing.assert_allclose(a[0], b[0], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_native_matches_numpy_d_shells():
    L = 9.0
    cell = Cell.from_atoms(
        [Atom("H", (0.3, 0.1, 0.0)), Atom("H", (2.0, 0.2, 0.4))],
        np.eye(3) * L,
        spin=0,
    )
    sc = make_supercell(cell, np.eye(3))
    shells = [
        Shell(l=1, exponents=np.array([0.8, 0.3]),
              coefficients=np.array([0.5, 0.6]), atom_index=0,
              center=np.array([0.3, 0.1, 0.0])),
        Shell(l=2, exponents=np.array([0.9, 0.35]),
              coefficients=np.array([0.7, 0.4]), atom_index=1,
              center=np.array([2.0, 0.2, 0.4])),
    ]
    kpts = np.zeros((1, 3))
    a = eri.sr_eri_tensors(shells, sc.lattice, kpts, 0.9, eps=1e-7,
                           engine="numpy")
    b = eri.sr_eri_tensors(shells, sc.lattice, kpts, 0.9, eps=1e-7,
                           engine="native")
    np.testing.assert_allclose(a[0], b[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-9, atol=1e-11)
