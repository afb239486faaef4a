"""Finite-size attribution for H2-in-a-box (VERDICT r2 #5).

Trains the production stack on H2 (R = 1.4 a0) in L^3 boxes for a ladder
of L values and compares the tail-averaged VMC energy against the exact
isolated-molecule value (-1.1744 Ha). The leading periodic-image error of
a neutral molecule with the Ewald background is O(1/L^3), so E(L) vs
1/L^3 isolates the finite-size component of the residual; what survives
the L -> inf extrapolation is ansatz + precision.

Usage: python benchmarks/h2_lsweep.py [iters] [batch]
Writes runs/h2_lsweep_r3/summary.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

E_EXACT = -1.1744  # isolated H2, near-exact (Kolos-Wolniewicz)


def run_one(L, iters, batch):
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
    cfg.batch_size = batch
    cfg.optim.iterations = iters
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian_mode = "forward"
    cfg.optim.kfac.adaptive_damping = True
    cfg.mcmc.burn_in = 100
    cfg.mcmc.steps = 20
    cfg.mcmc.init_width = 1.0
    cfg.mcmc.move_width = 0.3
    cfg.mcmc.adapt_frequency = 25
    cfg.network.detnet.hidden_dims = ((64, 16), (64, 16), (64, 16))
    cfg.network.detnet.determinants = 4
    cfg.pretrain.method = "net"
    cfg.pretrain.iterations = 200
    cfg.log.save_path = f"/root/repo/runs/h2_lsweep_r3/L{L:g}"
    cfg.log.stats_frequency = 10
    cfg.log.save_frequency = 1e9

    process.process(cfg)

    rows = open(
        cfg.log.save_path + "/train_stats.csv"
    ).read().strip().split("\n")[1:]
    energies = np.array([float(r.split(",")[1]) for r in rows])
    tail = energies[int(0.7 * len(energies)):]
    return float(tail.mean()), float(tail.std() / np.sqrt(len(tail)))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    out = {}
    for L in (12.0, 16.0, 20.0, 26.0):
        e, se = run_one(L, iters, batch)
        out[str(L)] = {"E": e, "stderr": se, "E_minus_exact_mHa":
                       round(1e3 * (e - E_EXACT), 2)}
        print(f"L={L:g}: E = {e:.4f} +- {se:.4f} Ha "
              f"(exact isolated {E_EXACT})", flush=True)

    # linear fit E = E_inf + a / L^3
    Ls = np.array([float(k) for k in out])
    Es = np.array([out[k]["E"] for k in out])
    ses = np.array([max(out[k]["stderr"], 1e-4) for k in out])
    A = np.stack([np.ones_like(Ls), Ls ** -3.0], axis=1)
    w = 1.0 / ses
    coef, *_ = np.linalg.lstsq(A * w[:, None], Es * w, rcond=None)
    out["extrapolated_E_inf"] = float(coef[0])
    out["E_inf_minus_exact_mHa"] = round(1e3 * (coef[0] - E_EXACT), 2)
    os.makedirs("/root/repo/runs/h2_lsweep_r3", exist_ok=True)
    with open("/root/repo/runs/h2_lsweep_r3/summary.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
