"""bcc-Li 3x3x3 from the in-repo POSCAR (identical to the reference file) (BASELINE.md system #4).

54 atoms / 162 electrons — the largest BASELINE system. Reference drives
the same file via config/read_poscar.py:13 ("bcc_li.vasp,3,ccpvdz").
Pretrain uses the native periodic UHF at sto-3g (the pretrain basis only
seeds the ansatz; VMC accuracy is set by the network + KFAC).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import read_poscar
from deepsolid_tpu.train import process

POSCAR = "/root/repo/deepsolid_tpu/configs/poscar/bcc_li.vasp"

cfg = read_poscar.get_config(f"{POSCAR},3,sto-3g")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 200000
# AOT memory probes (runs/bcc_li_memprobe.py, chipless TpuAotCompiler):
# el16/psi256 plans 20.5G and el16/psi128 16.1G (both over the 15.75G
# HBM); el8/psi128 AND el8/psi256 both plan 8.44G temp (the psi-side
# sweeps are not the peak at el8). el_chunk must divide the walker batch.
cfg.optim.el_chunk = 8
cfg.optim.psi_chunk = 256
cfg.mcmc.burn_in = 100
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 500
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/bcc_li_r3"
# Cross-round durability (same protocol as runs/diamond_run.py): the
# newest checkpoint is copied to runs/ckpt_bcc_li and committed, so a
# fresh round resumes from it instead of re-pretraining.
cfg.log.restore_path = "/root/repo/runs/ckpt_bcc_li"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
