"""Warm the Si diamond 1x1x1 sto-3g UHF cache (the pretrain seed for the
third-row-solid end-to-end run; the minimal basis avoids the diffuse
et-dz near-degeneracy that oscillates the supercell SCF)."""
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train.pretrain import make_orbital_source

cfg = diamond.get_config("Si,Si,5.43,1,sto-3g")
cfg.pretrain.scf = "hf"
t0 = time.time()
logging.info("warming Si diamond 1x1x1 sto-3g ...")
src = make_orbital_source(cfg, cfg.system.cell)
logging.info("warmed Si diamond 1x1x1 sto-3g in %.1f s", time.time() - t0)
