"""Tests for cells, supercells, k-point folding and symmetry vectors."""

import numpy as np
import pytest

from deepsolid_tpu.system import (
    Atom,
    Cell,
    Supercell,
    make_supercell,
    reciprocal_vectors,
    supercell_kpts,
)


def lih_cell():
    """LiH in an fcc-like lattice (reference test/test_cell.py:10-24)."""
    L = 2 / 0.529177
    lattice = (1 - np.eye(3)) * L / 2
    return Cell.from_atoms(
        [Atom("Li", (0, 0, 0)), Atom("H", (L / 2, L / 2, L / 2))],
        lattice,
        spin=0,
    )


def test_reciprocal_vectors_orthogonality():
    rng = np.random.RandomState(0)
    a = rng.randn(3, 3) + 3 * np.eye(3)
    b = reciprocal_vectors(a)
    np.testing.assert_allclose(a @ b.T, 2 * np.pi * np.eye(3), atol=1e-12)


def test_cell_electron_counts():
    cell = lih_cell()
    assert cell.nelectron == 4
    assert cell.nelec == (2, 2)
    assert cell.natom == 2


def test_supercell_tiling_counts():
    cell = lih_cell()
    for S, n in [(np.eye(3), 1), (2 * np.eye(3), 8),
                 (np.diag([2, 1, 1]), 2),
                 (np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]]), 2)]:
        sc = make_supercell(cell, S)
        assert sc.scale == n
        assert sc.natom == 2 * n
        assert sc.nelectron == 4 * n
        assert sc.kpts.shape == (n, 3)
        # supercell lattice = S @ prim lattice
        np.testing.assert_allclose(sc.lattice, np.asarray(S) @ cell.lattice)


def test_supercell_kpts_fold_to_primitive_bz():
    cell = lih_cell()
    S = np.diag([2, 2, 2])
    kpts = supercell_kpts(S, cell.lattice)
    # each k in fractional coords of prim recip must be in [0,1)
    frac = kpts @ np.linalg.inv(reciprocal_vectors(cell.lattice))
    assert np.all(frac >= -1e-9) and np.all(frac < 1 - 1e-9)
    # and distinct
    assert len(np.unique(np.round(frac, 8), axis=0)) == 8
    # k-points must be supercell reciprocal lattice vectors:
    sc = make_supercell(cell, S)
    frac_sc = kpts @ np.linalg.inv(reciprocal_vectors(sc.lattice))
    np.testing.assert_allclose(frac_sc, np.round(frac_sc), atol=1e-9)


def test_symmetry_vectors_minimal():
    cell = lih_cell()
    np.testing.assert_allclose(cell.AV, cell.lattice / (2 * np.pi), atol=1e-12)
    np.testing.assert_allclose(cell.BV, reciprocal_vectors(cell.lattice), atol=1e-12)


def test_symmetry_vectors_pinv_consistency():
    cell = dataclass_with_sym(lih_cell(), "fcc")
    av, bv = cell.AV, cell.BV
    assert bv.shape == (4, 3)
    # AV = pinv(BV)^T  =>  BV @ AV^T acts as identity on the row space
    np.testing.assert_allclose(av.T @ bv, np.eye(3), atol=1e-10)


def dataclass_with_sym(cell, sym):
    import dataclasses

    return dataclasses.replace(cell, sym_type=sym)


def test_serialization_roundtrip():
    sc = make_supercell(lih_cell(), 2 * np.eye(3))
    d = sc.to_dict()
    sc2 = Supercell.from_dict(d)
    np.testing.assert_allclose(sc.lattice, sc2.lattice)
    np.testing.assert_allclose(sc.atom_coords, sc2.atom_coords)
    assert sc2.scale == 8
    np.testing.assert_allclose(sc.kpts, sc2.kpts)


def test_parity_error():
    with pytest.raises(ValueError):
        Cell.from_atoms([Atom("H", (0, 0, 0))], np.eye(3), spin=0)


def test_occupied_klist_is_first_bz_wrapped():
    """Occupied k's handed to the network must be minimal-norm reps:
    unwrapped [0, 2pi/a) k's inflate the fixed Bloch-phase kinetic energy
    and stalled round-1 H10 training (see free_electron.wrap_kpoints)."""
    import numpy as np

    from deepsolid_tpu.scf.free_electron import free_electron_klist, wrap_kpoints
    from deepsolid_tpu.system import Atom, Cell, make_supercell
    from deepsolid_tpu.system.cell import reciprocal_vectors

    cell = Cell.from_atoms(
        [Atom("H", (0.9, 0.0, 0.0))], np.diag([1.8, 100.0, 100.0]), spin=1
    )
    sc = make_supercell(cell, np.diag([10, 1, 1]), spin=0)
    b = 2 * np.pi / 1.8
    prim_recip_chain = reciprocal_vectors(cell.lattice)
    # the raw folded kpts use the [0, 1) fractional convention and reach
    # k_x ~ 0.9 b; wrapped they form the symmetric set +-m b/10
    assert sc.kpts[:, 0].max() > b / 2
    wrapped_kpts = wrap_kpoints(sc.kpts, prim_recip_chain)
    np.testing.assert_allclose(
        np.sort(wrapped_kpts[:, 0]),
        b / 10 * np.array([-4, -3, -2, -1, 0, 1, 2, 3, 4, 5]),
        atol=1e-9,
    )
    for klist in free_electron_klist(sc):
        # whatever the filling policy picks, the k's handed to the
        # network must be first-BZ representatives
        assert np.all(np.abs(klist[:, 0]) <= b / 2 + 1e-9), klist
    # wrap_kpoints is idempotent and preserves k mod G
    prim_recip = reciprocal_vectors(cell.lattice)
    k = np.array([[3.14159265, 0.0, 0.0], [0.1, 0.0, 0.0]])
    w = wrap_kpoints(k, prim_recip)
    np.testing.assert_allclose(wrap_kpoints(w, prim_recip), w, atol=1e-12)
    frac = (k - w) @ np.linalg.inv(prim_recip)
    np.testing.assert_allclose(frac, np.round(frac), atol=1e-9)
