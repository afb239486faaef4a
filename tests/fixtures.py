"""Shared test fixtures: small periodic systems."""

import numpy as np

from deepsolid_tpu.system import Atom, Cell, make_supercell


def lih_cell(spin=0):
    """LiH fcc-like primitive cell (reference test/test_cell.py:10-24)."""
    L = 2 / 0.529177
    lattice = (1 - np.eye(3)) * L / 2
    return Cell.from_atoms(
        [Atom("Li", (0, 0, 0)), Atom("H", (L / 2, L / 2, L / 2))],
        lattice,
        spin=spin,
    )


def lih_supercell(S=None):
    return make_supercell(lih_cell(), np.eye(3) if S is None else S)


def h2_cell(L=2.0, Lbox=10.0):
    """Two H atoms in an elongated orthogonal cell (config/two_hydrogen_cell)."""
    lattice = np.diag([2 * L, Lbox, Lbox])
    return Cell.from_atoms(
        [Atom("H", (L, 0, 0)), Atom("H", (0, 0, 0))], lattice, spin=0
    )


def h2_supercell(S=None, L=2.0, Lbox=10.0):
    return make_supercell(h2_cell(L, Lbox), np.eye(3) if S is None else S)
