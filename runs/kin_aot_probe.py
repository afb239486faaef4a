"""Chipless AOT probe of the kinetic-only forward-Laplacian path at the
bench shape (C-diamond 2x2x2, 96e): dumps the TPU memory analysis (top
HLO temps with source attribution) so layout-copy costs around the
det-head jac stream can be diagnosed without holding the chip.

Usage: python runs/kin_aot_probe.py [chunk] [n_top]
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
from deepsolid_tpu.sampling.init import init_electrons
from __graft_entry__ import _diamond_network

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 64

sc, net = _diamond_network(S=2)
key = jax.random.PRNGKey(0)
params = net.init(key)
data = init_electrons(key, sc, sc.nelec, batch_size=chunk)

kin = make_kinetic_forward(net)
vm = jax.jit(jax.vmap(kin, in_axes=(None, 0)))
lowered = vm.lower(params, data)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print("MEMORY_ANALYSIS:", ma)
try:
    txt = compiled.as_text()
    with open("/tmp/kin_aot_hlo.txt", "w") as f:
        f.write(txt)
    print("optimized HLO ->", "/tmp/kin_aot_hlo.txt", len(txt), "bytes")
except Exception as e:
    print("as_text unavailable:", e)
