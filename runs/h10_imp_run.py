"""H10 with Langevin importance sampling at reduced mcmc.steps.

Follow-up to benchmarks/sampler_autocorr.py (importance sampling
decorrelates the slow polarization mode ~7x cheaper per |psi|^2 eval
than all-electron moves): if that transfers to training, the 20
all-electron sweeps between KFAC updates can drop to ~6 importance
sweeps at equal statistical quality — MCMC is ~half the step cost at
H10 scale, so this is a direct wall-clock win to A/B against
runs/h10_run.py (same system, same optimizer settings, same batch).

Compare: s/step, tail energy +- stderr, variance, pmove.
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
cfg.optim.iterations = 1200
cfg.mcmc.burn_in = 100
cfg.mcmc.steps = 6
cfg.mcmc.importance_sampling = True
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 500
cfg.optim.kfac.adaptive_damping = True
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/h10_imp_r3"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
