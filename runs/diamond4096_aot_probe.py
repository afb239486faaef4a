"""Chipless AOT compile probe of the batch-4096 single-chip C-diamond
KFAC step (BASELINE.md metric (b); reference default batch,
/root/reference/DeepSolid/base_config.py:33).

Round 3 left this blocked: the remote *execution* compile helper hung
>20 min on the chunked batch-4096 program while the CPU-backend AOT
probe showed a sound 5.4 GB memory plan. This probe compiles the exact
TPU program through the chipless TpuAotCompiler helper (same path the
bcc-Li memory probes use) — it runs concurrently with chip jobs and, if
it completes, pins whether the hang is in the program or in the
execution-compile path, plus yields the real HBM plan at 4096.

Usage: python runs/diamond4096_aot_probe.py [psi_chunk] [el_chunk]
"""
import logging
import sys
import tempfile
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

psi_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
el_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32

cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.batch_size = 4096
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.el_chunk = el_chunk
cfg.optim.psi_chunk = psi_chunk
cfg.mcmc.steps = 20
cfg.mcmc.burn_in = 0
cfg.pretrain.method = "none"
cfg.pretrain.iterations = 0
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.debug.compile_only = True
t0 = time.time()
with tempfile.TemporaryDirectory() as td:
    cfg.log.save_path = td
    ma = process.process(cfg)
print(f"PSI_CHUNK={psi_chunk} EL_CHUNK={el_chunk} "
      f"compile_s={time.time() - t0:.1f} MEMORY_ANALYSIS:", ma)
