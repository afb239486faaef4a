"""Warm the C-diamond 2x2x2 sto-3g UHF cache (BASELINE system #5).

Run with DEEPSOLID_TPU_SCF_CACHE pointed at the repo-committed directory
(runs/scf_cache) so the single-core build survives machine re-images and
the TPU training run (runs/diamond_run.py) skips straight to pretrain:

  DEEPSOLID_TPU_SCF_CACHE=/root/repo/runs/scf_cache python runs/warm_diamond.py
"""
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")

from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train.pretrain import make_orbital_source

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.pretrain.scf = "hf"
t0 = time.time()
logging.info("warming C-diamond 2x2x2 sto-3g ...")
src = make_orbital_source(cfg, cfg.system.cell)
logging.info("warmed in %.1f s (bands: %s)", time.time() - t0,
             [e.shape for e in src.band_energies[:2]])
