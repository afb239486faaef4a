"""H2-in-a-box L-sweep: isolate the finite-size component of the ~2.4 mHa
residual vs the exact isolated-molecule energy (VERDICT r2 weak #5 /
next-round item 5).

Trains the full stack at R = 1.4 Bohr in L^3 boxes, L = 12..26, batch 2048,
and tail-averages each run. The leading periodic corrections (image
interaction + uniform-background Madelung) scale as L^-1..L^-3 for a
neutral molecule with quadrupole corrections; we fit E(L) = E_inf + c/L^3
over the measured grid and compare E_inf against the exact -1.17447 Ha.

Each point re-trains from scratch (the Hamiltonian changes with L).
Results accumulate into runs/h2_lsweep.json so the sweep is resumable.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np

from validate_h2 import main

OUT = "/root/repo/runs/h2_lsweep.json"
LS = [12.0, 16.0, 20.0, 26.0]
ITERS = 1200
BATCH = 2048

results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))

for L in LS:
    key = f"{L:g}"
    if key in results:
        continue
    e = main(ITERS, BATCH, L=L)
    results[key] = float(e)
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(f"L-sweep progress: {results}", flush=True)

# Fit E(L) = E_inf + c * L^-3 over the completed grid.
ls = np.array(sorted(float(k) for k in results))
es = np.array([results[f"{L:g}"] for L in ls])
A = np.stack([np.ones_like(ls), ls ** -3.0], axis=1)
coef, *_ = np.linalg.lstsq(A, es, rcond=None)
print(json.dumps({
    "E_by_L": results,
    "E_inf_L3_fit": float(coef[0]),
    "c_L3": float(coef[1]),
    "exact_isolated": -1.17447,
    "residual_at_Linf_mHa": float((coef[0] + 1.17447) * 1e3),
    "residual_at_L20_mHa": float((results.get("20", np.nan) + 1.17447) * 1e3)
    if "20" in results else None,
}), flush=True)
