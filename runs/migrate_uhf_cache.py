"""Migrate UHF cache entries written under the old (basis-name-keyed)
cache path to the new shell-content-keyed path, for the systems whose
warms ran with the old code. Harmless if entries already migrated."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from deepsolid_tpu.configs import read_poscar, rock_salt
from deepsolid_tpu.scf import basis as basis_lib
from deepsolid_tpu.scf import hf as hf_lib
from deepsolid_tpu.scf.hf import _uhf_cache_path, twisted_kpts

for cfg in (
    rock_salt.get_config("Li,H,4.02,2,ccpvdz"),
    rock_salt.get_config("Li,H,4.02,2,sto-3g"),
    read_poscar.get_config(
        "/root/repo/deepsolid_tpu/configs/poscar/bcc_li.vasp,3,sto-3g"),
):
    sc = cfg.system.cell
    shells = basis_lib.build_shells(sc.prim, cfg.system.basis)
    kpts = twisted_kpts(sc, (0.0, 0.0, 0.0))
    old = _uhf_cache_path(sc, cfg.system.basis, kpts, None)
    new = _uhf_cache_path(sc, cfg.system.basis, kpts, shells)
    if os.path.exists(old) and not os.path.exists(new):
        os.rename(old, new)
        print(f"migrated {os.path.basename(old)} -> {os.path.basename(new)}")
    else:
        print(f"{cfg.system.basis}: old={os.path.exists(old)} "
              f"new={os.path.exists(new)}")
