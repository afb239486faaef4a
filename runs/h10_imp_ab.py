"""Paired production A/B of Langevin importance sampling (VERDICT r3 #6 / r4 #7).

benchmarks/sampler_autocorr.py measured that importance sampling
decorrelates H10's slow polarization mode ~7x cheaper per |psi|^2 eval
than all-electron moves (runs/sampler_autocorr.json); the open question
was whether that transfers to production training wall-clock at equal
statistical quality (reference counterpart qmc.py:83-150, marked
"untested" upstream).

Design (paired, single chip): one SEED run (default sampler) to step
300 from the cc-pVDZ-UHF pretrain, then two arms FORKED from the same
step-300 checkpoint state:
  arm A: default    — 20 all-electron MH sweeps / update (base_config.py:43)
  arm B: importance —  6 Langevin-drift sweeps / update (~the IAT-matched
         sweep count from the autocorr data)
Both arms train 300 more KFAC steps; compare s/step and tail
energy/variance over steps [450..600].

Usage: python runs/h10_imp_ab.py <stage: seed|a|b> <root_dir>
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import hydrogen_chain
from deepsolid_tpu.train import process

stage = sys.argv[1]
root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/h10ab"

cfg = hydrogen_chain.get_config("H,10,1,1,1.8,0,ccpvdz")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.mcmc.burn_in = 100
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 300
cfg.optim.kfac.adaptive_damping = True
cfg.log.save_frequency = 5.0
cfg.log.stats_frequency = 5

if stage == "seed":
    cfg.optim.iterations = 300
    cfg.mcmc.steps = 20
    cfg.log.save_path = f"{root}_seed"
else:
    cfg.optim.iterations = 600
    cfg.log.save_path = f"{root}_{stage}"
    cfg.log.restore_path = f"{root}_seed"
    if stage == "a":
        cfg.mcmc.steps = 20
    elif stage == "b":
        cfg.mcmc.steps = 6
        cfg.mcmc.importance_sampling = True
    else:
        raise SystemExit(f"unknown stage {stage!r}")

process.process(cfg)
