"""Chipless AOT memory probe for bcc-Li 3x3x3 (162e) at candidate
el_chunk values — picks the largest chunk that fits 15.75G HBM before
committing the chip to the run. Uses debug.compile_only (remote AOT
compile helper, no device execution)."""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import read_poscar
from deepsolid_tpu.train import process

POSCAR = "/root/repo/deepsolid_tpu/configs/poscar/bcc_li.vasp"
el_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16

cfg = read_poscar.get_config(f"{POSCAR},3,sto-3g")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.el_chunk = el_chunk
cfg.optim.psi_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
cfg.mcmc.steps = 20
cfg.mcmc.burn_in = 0
cfg.pretrain.method = "none"
cfg.pretrain.iterations = 0
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.debug.compile_only = True
import tempfile
with tempfile.TemporaryDirectory() as td:
    cfg.log.save_path = td
    ma = process.process(cfg)
print(f"EL_CHUNK={el_chunk} MEMORY_ANALYSIS:", ma)
