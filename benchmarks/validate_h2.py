"""Physics validation: VMC ground-state energy of H2 in a large periodic box.

Trains the full stack (pretrain -> KFAC + forward-Laplacian) on H2 at the
equilibrium bond length (R = 1.4 Bohr) in an L^3 box. The isolated-molecule
ground state is -1.1744 Ha; the periodic value carries O(1/L)
image/background corrections, so for L = 20 expect agreement to a few
times 1e-2 Ha, tightening with box size.

Usage: python benchmarks/validate_h2.py [iterations] [batch]
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main(iterations=1500, batch=1024, L=20.0, optimizer="kfac", lr=0.05,
         precision="float32"):
    from deepsolid_tpu import config as config_lib
    from deepsolid_tpu.system import Atom, Cell, make_supercell
    from deepsolid_tpu.train import process

    cell = Cell.from_atoms(
        [Atom("H", (0.0, 0.0, 0.0)), Atom("H", (1.4, 0.0, 0.0))],
        np.eye(3) * L,
        spin=0,
    )
    cfg = config_lib.default()
    cfg.system.cell = make_supercell(cell, np.eye(3))
    cfg.system.basis = "sto-3g"
    cfg.precision = precision
    cfg.batch_size = batch
    cfg.optim.iterations = iterations
    cfg.optim.optimizer = optimizer
    cfg.optim.laplacian_mode = "forward"
    cfg.optim.lr.rate = lr
    cfg.mcmc.burn_in = 100
    cfg.mcmc.steps = 20
    cfg.mcmc.init_width = 1.0
    cfg.mcmc.move_width = 0.3
    cfg.mcmc.adapt_frequency = 25
    cfg.network.detnet.hidden_dims = ((64, 16), (64, 16), (64, 16))
    cfg.network.detnet.determinants = 4
    cfg.pretrain.method = "net"
    cfg.pretrain.iterations = 200
    # L in the path: a shared directory would make run N restore run N-1's
    # final checkpoint (different Hamiltonian) and skip training entirely
    cfg.log.save_path = (
        f"/tmp/h2_validation_{optimizer}_b{batch}_L{L:g}_{precision}"
    )
    cfg.log.stats_frequency = 10
    cfg.log.save_frequency = 1e9

    params, data, energy = process.process(cfg)

    import pandas as _unused  # noqa: F401  (keep optional)

    # average the last 20% of logged energies
    rows = open(cfg.log.save_path + "/train_stats.csv").read().strip().split("\n")[1:]
    energies = np.array([float(r.split(",")[1]) for r in rows])
    tail = energies[int(0.8 * len(energies)):]
    print(
        f"H2 in {L}^3 box: E = {tail.mean():.4f} +- "
        f"{tail.std() / np.sqrt(len(tail)):.4f} Ha "
        f"(isolated exact -1.1744; final step {energy})",
        flush=True,
    )
    return tail.mean()


if __name__ == "__main__":
    its = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    opt = sys.argv[3] if len(sys.argv) > 3 else "kfac"
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
    main(its, b, optimizer=opt, lr=lr)
