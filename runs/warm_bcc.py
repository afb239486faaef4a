"""Warm ONLY the bcc-Li 3x3x3 sto-3g UHF cache (BASELINE system #4).

Run with DEEPSOLID_TPU_SCF_CACHE pointed at a repo-committed directory
(runs/scf_cache) so the ~50-minute single-core build survives machine
re-images between rounds:

  DEEPSOLID_TPU_SCF_CACHE=/root/repo/runs/scf_cache python runs/warm_bcc.py
"""
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")

from deepsolid_tpu.configs import read_poscar
from deepsolid_tpu.train.pretrain import make_orbital_source

cfg = read_poscar.get_config(
    "/root/repo/deepsolid_tpu/configs/poscar/bcc_li.vasp,3,sto-3g")
cfg.pretrain.scf = "hf"
t0 = time.time()
logging.info("warming bcc-Li 3x3x3 sto-3g ...")
src = make_orbital_source(cfg, cfg.system.cell)
logging.info("warmed in %.1f s (bands: %s)", time.time() - t0,
             [e.shape for e in src.band_energies[:2]])
