"""C-diamond 2x2x2 (96 e) wall-clock per VMC step at batch 4096
(BASELINE.md metric (b); reference production default batch_size=4096,
base_config.py:33).

Runs the real production driver (pretrain -> burn-in -> KFAC train loop)
with stats every step; per-step wall time is the timestamp delta between
consecutive log rows (first steps discarded: compile).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.batch_size = 4096
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 40
cfg.optim.el_chunk = 32
cfg.mcmc.burn_in = 50
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "core"
cfg.pretrain.iterations = 200
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/diamond4096_r3"
cfg.log.save_frequency = 30.0
cfg.log.stats_frequency = 1
process.process(cfg)
