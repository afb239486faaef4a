"""H2-in-a-box trained entirely in FP64 on CPU (BASELINE.md row-1 spirit:
"correctness anchor ... FP64 CPU").

Exactly the L=20 point of the round-3 f32 L-sweep (runs/h2_lsweep.py via
benchmarks/validate_h2.main: same geometry, net, pretrain, KFAC, 1200
iters) but cfg.precision='float64' on the CPU backend. The L-sweep closed
the finite-size attribution by EVALUATING trained f32 states under f64;
this run closes the remaining gap by TRAINING under f64 — agreement with
the f32 point (-1.17526(20) Ha) bounds any f32-TRAINING bias on the
flagship accuracy anchor.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from validate_h2 import main

e = main(1200, 1024, L=20.0, precision="float64")
with open("/root/repo/runs/h2_f64_cpu.json", "w") as f:
    json.dump({"E_L20_f64_cpu": float(e), "f32_tpu_L20": -1.17526}, f)
print("f64 CPU L=20 tail mean:", e, flush=True)
