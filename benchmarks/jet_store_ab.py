"""A/B the bf16 trunk-jac storage (cfg.jet_storage) on the real chip.

Round-4 context: the tangent-precision A/B showed the forward-Laplacian
trunk is HBM-bandwidth-bound (compute tier: 1.017x), and the component
profile puts the trunk jets at ~60% of E_L wall time. bf16 STORAGE of the
(3N, n, 256) inter-layer jac stream halves those bytes while keeping all
arithmetic f32 (ops/fwdlap.set_jet_storage).

Each arm runs in a fresh subprocess (the env var is read at trace time):
  rate arm   — kinetic-only throughput at production chunk (walkers/s)
  value arm  — per-walker kinetic on FIXED walkers/params, dumped so the
               parent reports the bf16-vs-f32 per-walker error
               distribution and the batch-mean shift (the quantity the
               1e-4 Ha/atom budget constrains; compare against
               benchmarks/f64_reeval.py for the absolute anchor)

Usage: python benchmarks/jet_store_ab.py [batch] [chunk]
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
from deepsolid_tpu.sampling.init import init_electrons
from __graft_entry__ import _diamond_network

batch, chunk = int(sys.argv[1]), int(sys.argv[2])
sc, net = _diamond_network(S=2)
key = jax.random.PRNGKey(0)
params = net.init(key)
data = init_electrons(key, sc, sc.nelec, batch_size=batch)
kin = make_kinetic_forward(net)

from deepsolid_tpu.train.loss import chunk_batch_fn

def build(ch):
    vm = jax.vmap(kin, in_axes=(None, 0))
    chunked = chunk_batch_fn(vm, ch, what="el")

    @jax.jit
    def run(params, data):
        def body(c, i):
            ke = chunked(params, data + 1e-4 * (i + 2.0) + 1e-30 * c)
            return jnp.real(ke).mean().astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                            jnp.arange(4, dtype=jnp.float32))
        return c

    values = jax.jit(lambda p, d: jnp.real(chunked(p, d)))
    return run, values

while True:
    run, values = build(chunk)
    try:
        float(np.asarray(run(params, data)))  # compile + warmup
        break
    except Exception as e:
        if chunk <= 8:
            raise
        chunk //= 2
        print(f"chunk compile/run failed ({type(e).__name__}); "
              f"retrying at chunk={chunk}", file=sys.stderr)
t0 = time.perf_counter()
float(np.asarray(run(params, data + 1e-5)))
dt = time.perf_counter() - t0
ke = np.asarray(values(params, data))
print("RESULT", json.dumps({
    "rate": 4 * batch / dt,
    "chunk": chunk,
    "ke_mean": float(ke.mean()),
    "ke": ke[:64].tolist(),
}))
"""
import json  # noqa: E402


def run_arm(store, batch, chunk):
    env = dict(os.environ)
    env["DEEPSOLID_TPU_JET_STORE"] = store
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(batch), str(chunk)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-4000:], file=sys.stderr)
    raise SystemExit(f"arm {store!r} failed")


def main():
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    arms = {s: run_arm(s, batch, chunk) for s in ("f32", "bf16")}
    a, b = np.asarray(arms["f32"]["ke"]), np.asarray(arms["bf16"]["ke"])
    d = b - a
    report = {
        "batch": batch, "chunk": chunk,
        "rate_f32": round(arms["f32"]["rate"], 2),
        "rate_bf16": round(arms["bf16"]["rate"], 2),
        "speedup": round(arms["bf16"]["rate"] / arms["f32"]["rate"], 4),
        "ke_mean_f32": arms["f32"]["ke_mean"],
        "ke_mean_bf16": arms["bf16"]["ke_mean"],
        "ke_mean_shift": arms["bf16"]["ke_mean"] - arms["f32"]["ke_mean"],
        "per_walker_diff_mean": float(d.mean()),
        "per_walker_diff_std": float(d.std()),
        "per_walker_diff_max_abs": float(np.abs(d).max()),
        "per_walker_rel_mean": float((d / np.abs(a)).mean()),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
