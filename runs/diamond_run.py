"""C-diamond 2x2x2 (BASELINE.md system #5, the north-star config).

16 C atoms / 96 electrons. Reference drives the same system via
config/diamond.py:15 ("C,C,3.567,2,ccpvdz"), production batch 4096
(base_config.py:33); on the one 16G chip the per-chip share is 1024
(global 4096 = 4 x 1024 on the dryrun-validated DP mesh). Pretrain uses
the native periodic UHF at sto-3g (the pretrain basis only seeds the
ansatz; VMC accuracy is set by the network + KFAC).

Launch with the committed SCF cache so pretrain skips the ERI build:
  DEEPSOLID_TPU_SCF_CACHE=/root/repo/runs/scf_cache \
    bash runs/watchdog.sh runs/diamond_run.py \
    /root/repo/runs/diamond_r4 /root/repo/runs/diamond_r4.log 900
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 200000
# el_chunk 64 fits again since the chunked-scan det head (fwdlap.
# _det_scan_traces) removed the ~8G of full-width block-transpose temps
# that pushed the one-shot form to 15.97G > 15.75G HBM
cfg.optim.el_chunk = 64
cfg.mcmc.burn_in = 100
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 500
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/diamond_r4"
# Committed seed: rounds hand off through runs/ckpt_diamond (the live
# save dir is gitignored; the newest ckpt is copied there and committed
# at round end so the next round resumes instead of re-pretraining).
cfg.log.restore_path = "/root/repo/runs/ckpt_diamond"
cfg.log.save_frequency = 6.0
cfg.log.stats_frequency = 10
process.process(cfg)
