"""Warm the Si diamond 1x1x1 et-dz UHF cache with the SCF rescue pass
(scf/hf.py run_uhf level_shift retry) active — the prior two warms
imported pre-rescue code and stopped oscillating-unconverged at cycle 60.
"""
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train.pretrain import make_orbital_source

cfg = diamond.get_config("Si,Si,5.43,1,et-dz")
cfg.pretrain.scf = "hf"
t0 = time.time()
logging.info("warming Si diamond 1x1x1 et-dz (rescue-enabled) ...")
src = make_orbital_source(cfg, cfg.system.cell)
logging.info("warmed Si diamond 1x1x1 et-dz in %.1f s", time.time() - t0)
