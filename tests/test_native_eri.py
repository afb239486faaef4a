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


def test_out_of_range_image_offsets_fail_loudly():
    """Integer lattice-image offsets beyond the packed-key ranges must
    return rc=2 (raised by the caller), never a silent per-term drop —
    a dropped exchange term with its Coulomb term kept would be a
    silently wrong UHF exchange energy."""
    import ctypes

    lib = native.load()
    # pairs from an ordinary cell (so _pair_entries stays cheap); the
    # native call then gets a pathological 0.001-Bohr lattice, making
    # physically-close images carry huge integer coordinates
    big = np.eye(3) * 10.0
    lattice = np.eye(3) * 0.001
    cell = Cell.from_atoms([Atom("He", (0.0, 0.0, 0.0))], big, spin=0)
    shells = build_shells(cell, "sto-3g", exp_to_discard=0.0)
    pairs, nao = eri._pair_entries(shells, big, 1e-8)
    bra = ket = pairs[0]
    kpts = np.zeros((1, 3))

    def dptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def iptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def call(ibs, i_a=None):
        bs = np.ascontiguousarray(ibs.astype(np.float64) @ lattice)
        wj = np.zeros((1, 1, 1, 1, 1, 1), np.complex128)
        wk = np.zeros_like(wj)
        i_a = bra["iA"] if i_a is None else i_a
        return lib.sr_eri_block2(
            bra["p"].shape[0], bra["la"], bra["lb"],
            dptr(bra["p"]), dptr(bra["coef"]), dptr(bra["w"]),
            dptr(bra["P"]), iptr(i_a), dptr(eri._dense_e(bra)),
            ket["p"].shape[0], ket["la"], ket["lb"],
            dptr(ket["p"]), dptr(ket["coef"]), dptr(ket["w"]),
            dptr(ket["P"]), iptr(ket["iA"]), dptr(eri._dense_e(ket)),
            bs.shape[0], dptr(bs), iptr(np.ascontiguousarray(ibs)),
            1, dptr(np.ascontiguousarray(kpts)),
            dptr(np.ascontiguousarray(lattice)), 1.0, 1e-8,
            dptr(wj.view(np.float64)), dptr(wk.view(np.float64)),
        )

    # in-range image: fine
    assert call(np.array([[1, 0, 0]], np.int32)) == 0
    # image at 0.6 Bohr physically (not screened) but 600 lattice units:
    # overflows the 10-bit pack6 K-scatter key -> rc=2
    assert call(np.array([[600, 0, 0]], np.int32)) == 2
    # internal pair offset beyond the 20-bit pack3 range -> rc=2
    bad_ia = np.ascontiguousarray(
        np.full_like(bra["iA"], 600000)
    )
    assert call(np.array([[0, 0, 0]], np.int32), i_a=bad_ia) == 2
