"""C-diamond 2x2x2 (96e) wall-clock per VMC step at batch 4096 on ONE
chip (BASELINE.md metric (b); reference production default batch_size=4096,
base_config.py:33).

Round-3 `psi_chunk` makes the FULL KFAC train step fit a single 16G chip
at 4096 x 96e (the unchunked psi-gradient vjp + KFAC curvature capture
need 29.3G): the psi-side sweeps run under lax.map in walker chunks.
Elastic-restores the seed checkpoint from runs/diamond4096_timing.py
(batch 1024 -> 4096 tile), then times a stats_frequency=1 window; the
first post-restore steps are discarded as compile.
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

SAVE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/diamond4096_r3"

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.el_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 32
cfg.optim.psi_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
cfg.mcmc.steps = 20
cfg.mcmc.burn_in = 0
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = SAVE
cfg.log.save_frequency = 30.0
cfg.log.stats_frequency = 1
cfg.batch_size = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
cfg.optim.iterations = 85  # cumulative: restores at step 60 from stage 2
process.process(cfg)
