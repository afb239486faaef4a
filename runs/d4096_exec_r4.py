"""Executing retry of the single-chip batch-4096 KFAC diamond step.

BASELINE.md metric (b): wall-clock per VMC step, C-diamond 2x2x2, batch
4096 (reference production default, /root/reference/DeepSolid/base_config.py:33).
Round-3 saw a >20-min remote-compile hang; the round-4 chipless
TpuAotCompiler probe (runs/diamond4096_aot_probe.py) proved the same HLO
compiles in 341 s with an 8.45 GB temp plan, isolating the hang to the
remote execution-compile path. This script retries the EXECUTING run:
random-init params (step time is shape-dependent), pretrain/burn-in off,
stats every step so the log timestamps give per-step wall-clock.
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.el_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 32
cfg.optim.psi_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
cfg.batch_size = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
cfg.mcmc.steps = 20
cfg.mcmc.burn_in = 0
cfg.pretrain.method = "none"
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/d4096_exec_r4"
cfg.log.save_frequency = 60.0
cfg.log.stats_frequency = 1
cfg.optim.iterations = 8
process.process(cfg)
