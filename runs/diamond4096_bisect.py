"""Bisect the batch-4096 single-chip remote-compile hang (VERDICT r3 #4).

Round-3 evidence: the SAME chunked KFAC train-step HLO lowers and
compiles on the CPU backend in ~150-180 s with 5.4 GB static memory at
batch 4096, but the remote TPU compile exceeds 20 minutes without
returning — so the suspect is a TPU-side pass, most plausibly Mosaic
(the Pallas kernels) inside the remote-compile helper. This sweep
compiles the full train step (debug.compile_only: AOT, no execution) at
batch 4096 under the 2x2 kernel on/off matrix, each arm in its own
subprocess with a hard timeout, shortest-suspicion-first:

  arm 1: fused=off det=off  -> pure-XLA program; hang here = XLA/helper
  arm 2: fused=off det=on   -> adds the GJ det Mosaic kernel
  arm 3: fused=on  det=off  -> adds the fused dense+tanh jet Mosaic kernel
  arm 4: fused=on  det=on   -> production default

Usage: python runs/diamond4096_bisect.py [timeout_s] [batch] [psi_chunk] [el_chunk]
"""
import json
import os
import subprocess
import sys
import time

TIMEOUT = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
PSI_CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 512
EL_CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 32

CHILD = r"""
import logging, sys, tempfile
logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")
from deepsolid_tpu.configs import diamond
from deepsolid_tpu.train import process

fused, det, batch, psi_chunk, el_chunk = sys.argv[1:6]
cfg = diamond.get_config("C,C,3.567,2,sto-3g")
cfg.precision = "float32"
cfg.optim.optimizer = "kfac"
cfg.optim.laplacian_mode = "forward"
cfg.batch_size = int(batch)
cfg.optim.psi_chunk = int(psi_chunk)
cfg.optim.el_chunk = int(el_chunk)
cfg.mcmc.steps = 20
cfg.mcmc.burn_in = 0
cfg.pretrain.method = "none"
cfg.pretrain.iterations = 0
cfg.debug.compile_only = True
cfg.debug.fused_kernels = fused
cfg.debug.det_kernel = det
with tempfile.TemporaryDirectory() as td:
    cfg.log.save_path = td
    ma = process.process(cfg)
print("MEMORY_ANALYSIS:", ma)
"""


def main():
    arms = [
        ("off", "off"),
        ("off", "on"),
        ("on", "off"),
        ("on", "on"),
    ]
    results = []
    for fused, det in arms:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, fused, det, str(BATCH),
                 str(PSI_CHUNK), str(EL_CHUNK)],
                timeout=TIMEOUT, capture_output=True, text=True,
                cwd="/root/repo", env=dict(os.environ),
            )
            dt = time.time() - t0
            mem = [l for l in proc.stdout.splitlines()
                   if l.startswith("MEMORY_ANALYSIS:")]
            results.append({
                "fused": fused, "det": det, "rc": proc.returncode,
                "compile_s": round(dt, 1),
                "memory": mem[0][16:200] if mem else None,
                "tail": (proc.stdout + proc.stderr)[-400:]
                        if proc.returncode else None,
            })
        except subprocess.TimeoutExpired:
            results.append({
                "fused": fused, "det": det, "rc": "TIMEOUT",
                "compile_s": TIMEOUT,
            })
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"batch": BATCH, "psi_chunk": PSI_CHUNK,
                      "el_chunk": EL_CHUNK, "arms": results}, indent=1))


if __name__ == "__main__":
    main()
