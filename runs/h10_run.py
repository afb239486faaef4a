"""Long-horizon H10 accuracy-parity run (VERDICT #4): equilibrium hydrogen
chain, R=1.8 a0, cc-pVDZ native-UHF pretraining, KFAC + forward Laplacian.
Literature anchor: E/atom ~ -0.5665 Ha (H10 @ r=1.8, Motta et al. PRX 7,
031059 (2017); the reference trains the same system, config/hydrogen_chain.py).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import hydrogen_chain
from deepsolid_tpu.train import process

cfg = hydrogen_chain.get_config("H,10,1,1,1.8,0,ccpvdz")
cfg.batch_size = 2048
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 200000
cfg.optim.el_chunk = 0
cfg.mcmc.burn_in = 200
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 1000
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/h10_r18"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
