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


def test_bcc_config_matches_poscar_conventional_cell():
    """configs/bcc.py: the S=2 primitive-bcc supercell has the same
    density and electron count as the 1x1x1 conventional-cell POSCAR
    build (2 primitive cells per conventional cube)."""
    from deepsolid_tpu.configs import bcc, read_poscar as rp

    a_ang = 3.4268178940
    cfg = bcc.get_config(f"Li,{a_ang},2,0,sto-3g")
    sc = cfg.system.cell
    a = units.angstrom2bohr(a_ang)
    # primitive bcc volume = a^3 / 2
    np.testing.assert_allclose(
        abs(np.linalg.det(sc.prim.lattice)), a**3 / 2, rtol=1e-12
    )
    assert sc.scale == 8 and sum(sc.nelec) == 8 * 3
    cfg2 = rp.get_config(f"{POSCAR},1,sto-3g")
    sc2 = cfg2.system.cell
    np.testing.assert_allclose(
        abs(np.linalg.det(sc.prim.lattice)) * sc.scale / sum(sc.nelec),
        abs(np.linalg.det(sc2.prim.lattice)) * sc2.scale / sum(sc2.nelec),
        rtol=1e-12,
    )


def test_bcc_config_3d_metal_wiring():
    """A 3d metal (V, Z=23) builds with the et-dz basis: the supercell
    parity check and the l=2 basis tables both engage."""
    from deepsolid_tpu.configs import bcc
    from deepsolid_tpu.scf.basis import build_shells

    cfg = bcc.get_config("V,3.03,1,1,et-dz")
    sc = cfg.system.cell
    assert sum(sc.nelec) == 23 and sc.spin == 1
    shells = build_shells(sc.prim, cfg.system.basis, exp_to_discard=0.0)
    assert {s.l for s in shells} == {0, 1, 2}
