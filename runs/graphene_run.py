"""Graphene 1x1 short logged run (VERDICT r2 weak #6 done-criterion).

Drives configs/graphene.py — hexagonal AV/BV symmetry lattice, 2 C atoms
/ 12 electrons in a slab cell — through pretraining + KFAC VMC. Matches
the reference's first-class graphene example (config/graphene.py:15).
"""
import logging
import sys

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import graphene
from deepsolid_tpu.train import process

cfg = graphene.get_config("C,C,2.46,1,20,sto-3g")
cfg.batch_size = 1024
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.optim.iterations = 600
cfg.optim.el_chunk = 256
cfg.mcmc.burn_in = 200
cfg.mcmc.steps = 20
cfg.pretrain.method = "net"
cfg.pretrain.scf = "hf"
cfg.pretrain.iterations = 500
cfg.optim.kfac.adaptive_damping = True
cfg.optim.kfac.damping_adaptation_interval = 10
cfg.log.save_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/graphene_r3"
cfg.log.save_frequency = 15.0
cfg.log.stats_frequency = 10
process.process(cfg)
