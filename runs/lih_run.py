"""LiH rock-salt 2x2x2 accuracy run (BASELINE.md system #3): 8 primitive
cells, 32 electrons, cc-pVDZ native-UHF pretraining, KFAC + forward
Laplacian. Reference trains the same system via config/rock_salt.py
(README.md:28 run shapes).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import rock_salt
from deepsolid_tpu.train import process

cfg = rock_salt.get_config("Li,H,4.02,2,sto-3g")
cfg.batch_size = 2048
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 200000
cfg.optim.el_chunk = 256
cfg.mcmc.burn_in = 200
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 1000
# round 3: LM adaptive damping (VERDICT item 7); ~10% step overhead
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/lih_r1"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
