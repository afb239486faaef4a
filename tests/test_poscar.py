"""POSCAR reader tests (system/poscar.py).

Parity role: the reference's utils/poscar_to_cell.py (driven by
config/read_poscar.py). Anchored on the in-repo copy of the reference's
real bcc-Li conventional cell (deepsolid_tpu/configs/poscar/bcc_li.vasp).
"""

import os

import numpy as np

from deepsolid_tpu.system import make_supercell, read_poscar, units

POSCAR = os.path.join(
    os.path.dirname(__file__), "..", "deepsolid_tpu", "configs", "poscar",
    "bcc_li.vasp",
)


def test_bcc_li_cartesian():
    cell = read_poscar(POSCAR)
    a_bohr = units.angstrom2bohr(3.4268178940)
    np.testing.assert_allclose(cell.lattice, np.eye(3) * a_bohr, atol=1e-12)
    assert cell.atom_symbols == ("Li", "Li")
    np.testing.assert_allclose(cell.atom_charges, [3.0, 3.0])
    np.testing.assert_allclose(cell.atom_coords[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(
        cell.atom_coords[1], np.full(3, a_bohr / 2), rtol=1e-9
    )


def test_direct_coordinates_and_scale_factor(tmp_path):
    """Fractional ('Direct') coordinates multiply the (scaled) lattice."""
    text = """\
cubic He
2.0
 1.0 0.0 0.0
 0.0 1.0 0.0
 0.0 0.0 1.0
 He
 1
Direct
 0.25 0.5 0.75
"""
    p = tmp_path / "POSCAR"
    p.write_text(text)
    cell = read_poscar(str(p))
    a = units.angstrom2bohr(2.0)
    np.testing.assert_allclose(cell.lattice, np.eye(3) * a, atol=1e-12)
    np.testing.assert_allclose(
        cell.atom_coords[0], np.array([0.25, 0.5, 0.75]) * a, rtol=1e-12
    )


def test_read_poscar_config_builds_supercell():
    from deepsolid_tpu.configs import read_poscar as cfg_mod

    cfg = cfg_mod.get_config(f"{POSCAR},2,sto-3g")
    sc = cfg.system.cell
    assert sc.scale == 8  # 2x2x2 tiling of the 2-atom conventional cell
    assert sum(sc.nelec) == 8 * 2 * 3  # Z=3 per Li
    assert cfg.system.basis == "sto-3g"
