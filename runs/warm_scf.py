"""Warm the content-addressed UHF caches (scf/hf.py:run_uhf_cached) for the
round-3 BASELINE runs, on CPU, before the TPU jobs need them:

  1. LiH rock-salt 2x2x2 cc-pVDZ  (runs/lih_ccpvdz_run.py)
  2. bcc-Li 3x3x3 POSCAR sto-3g   (runs/bcc_li_run.py)

Each entry is keyed on (lattice, coords, k-list, nelec, basis), so the
subsequent training runs hit the cache and skip the minutes-scale SR-ERI
builds.
"""
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")

from deepsolid_tpu.configs import read_poscar, rock_salt
from deepsolid_tpu.train.pretrain import make_orbital_source

JOBS = [
    ("LiH rock-salt 2x2x2 cc-pVDZ", lambda: rock_salt.get_config("Li,H,4.02,2,ccpvdz")),
    ("bcc-Li 3x3x3 sto-3g", lambda: read_poscar.get_config(
        "/root/repo/deepsolid_tpu/configs/poscar/bcc_li.vasp,3,sto-3g")),
]

for name, make_cfg in JOBS:
    cfg = make_cfg()
    cfg.pretrain.scf = "hf"
    t0 = time.time()
    logging.info("warming %s ...", name)
    src = make_orbital_source(cfg, cfg.system.cell)
    logging.info("warmed %s in %.1f s (bands: %s)", name, time.time() - t0,
                 [e.shape for e in src.band_energies[:2]])
