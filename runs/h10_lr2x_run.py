"""H10 at 2x the production learning rate under LM adaptive damping
(VERDICT r2 #7 done-criterion: "H10 trains stably at >=2x the current lr").

Same system as runs/h10_run.py (R=1.8, cc-pVDZ UHF pretrain) but
lr.rate = 0.1 instead of 0.05. Without adaptive damping this diverges /
oscillates; with the LM rho rule the damping self-adjusts. The damping
trajectory is logged in the stats CSV (column `damping`).
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
cfg.optim.lr.rate = 0.1  # 2x production
cfg.optim.iterations = 500
cfg.optim.el_chunk = 0
cfg.mcmc.burn_in = 200
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 1000
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/h10_lr2x_r3"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
