from deepsolid_tpu.system.atom import Atom
from deepsolid_tpu.system.cell import (
    Cell,
    Supercell,
    make_supercell,
    reciprocal_vectors,
    supercell_copies,
    supercell_kpts,
    symmetry_feature_vectors,
)
from deepsolid_tpu.system.poscar import read_poscar

__all__ = [
    "Atom",
    "Cell",
    "Supercell",
    "make_supercell",
    "reciprocal_vectors",
    "supercell_copies",
    "supercell_kpts",
    "symmetry_feature_vectors",
    "read_poscar",
]
