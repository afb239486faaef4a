"""Si diamond 1x1x1 end-to-end: third-row solid through the element-general
native orbital source (VERDICT r2 missing #1 done-criterion).

2 Si atoms / 28 electrons, et-dz generated basis, self-consistent periodic
UHF pretraining, then KFAC + forward-Laplacian VMC. The reference covers
third-row solids only via PySCF (hf.py:26); this exercises the native
any-element path (scf/etdz.py) end to end.
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

cfg = diamond.get_config("Si,Si,5.43,1,et-dz")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 1500
cfg.optim.el_chunk = 128
cfg.mcmc.burn_in = 200
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 500
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/si_diamond_r3"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
