"""Sweep the fused jet kernel's tangent block size on the real chip.

The trunk forward-Laplacian jets carry ~60% of E_L wall time (round-4
component profile) and are NOT MXU-bound (tangent-precision A/B: 1.017x),
so the VMEM tiling is the remaining kernel knob: block_t rows per grid
step trade sequential grid iterations against VMEM residency
(DEEPSOLID_TPU_JET_BLOCK_T, ops/pallas/jet_kernels.py:_default_block_t).

Each block_t value runs in a fresh subprocess (the env var is read at
first kernel build) timing the kinetic-only path at production chunk.

Values are block_t integers, "bn:bt" pairs, or "bn:bt:bc" triples
(bn = row block, DEEPSOLID_TPU_JET_BLOCK_N; "auto" row blocking
minimizes electron-row padding — n=96 tiles exactly at bn=96 where the
legacy fixed 64 padded to 128; bc = output-column block,
DEEPSOLID_TPU_JET_BLOCK_C — the jac input block is re-read once per
column block, so bc=256 halves the dominant HBM read at d_out=256).

Usage: python benchmarks/jet_block_sweep.py [values ...]
       (default: 8 16 32 auto:8:256 auto:16:256 auto:24:256 auto:32:256)
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
from deepsolid_tpu.sampling.init import init_electrons
from __graft_entry__ import _diamond_network

batch, chunk = 256, 64
sc, net = _diamond_network(S=2)
key = jax.random.PRNGKey(0)
params = net.init(key)
data = init_electrons(key, sc, sc.nelec, batch_size=batch)
kin = make_kinetic_forward(net)
vm = jax.vmap(kin, in_axes=(None, 0))

@jax.jit
def run(params, data):
    def body(c, i):
        d = data + 1e-4 * (i + 2.0) + 1e-30 * c
        chunks = d.reshape(batch // chunk, chunk, d.shape[-1])
        ke = jax.lax.map(lambda x: vm(params, x), chunks)
        return jnp.real(ke).mean().astype(jnp.float32), 0.0
    c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                        jnp.arange(3, dtype=jnp.float32))
    return c

float(np.asarray(run(params, data)))
t0 = time.perf_counter()
float(np.asarray(run(params, data + 1e-5)))
dt = time.perf_counter() - t0
print("RATE", batch * 3 / dt)
"""


def main():
    values = sys.argv[1:] or ["8", "16", "32", "auto:8:256",
                              "auto:16:256", "auto:24:256", "auto:32:256"]
    out = {}
    for spec in values:
        parts = spec.split(":")
        bn = parts[0] if len(parts) > 1 else ""
        bt = parts[1] if len(parts) > 1 else parts[0]
        bc = parts[2] if len(parts) > 2 else ""
        env = dict(os.environ)
        env["DEEPSOLID_TPU_JET_BLOCK_T"] = bt
        if bn:
            env["DEEPSOLID_TPU_JET_BLOCK_N"] = bn
        else:
            env.pop("DEEPSOLID_TPU_JET_BLOCK_N", None)
        if bc:
            env["DEEPSOLID_TPU_JET_BLOCK_C"] = bc
        else:
            env.pop("DEEPSOLID_TPU_JET_BLOCK_C", None)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD], env=env, timeout=1500,
                capture_output=True, text=True, cwd="/root/repo",
            )
            rate = None
            for line in proc.stdout.splitlines():
                if line.startswith("RATE"):
                    rate = round(float(line.split()[1]), 2)
            out[spec] = rate if proc.returncode == 0 else (
                f"rc={proc.returncode}: " + proc.stderr[-200:]
            )
        except subprocess.TimeoutExpired:
            out[spec] = "TIMEOUT"
        print(json.dumps({spec: out[spec]}), flush=True)
    print(json.dumps({"block_kinetic_walkers_per_s": out}, indent=1))


if __name__ == "__main__":
    main()
