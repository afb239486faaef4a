"""Benchmark: local-energy evaluations per second per chip.

Runs the hot path of VMC training — batched local energy (kinetic Laplacian
+ Ewald) of the full-size periodic FermiNet — on C-diamond 2x2x2
(96 electrons), the north-star throughput config from BASELINE.md.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against ROUND1_BASELINE below (the first recorded
round-1 number on a TPU v5 lite chip); >1.0 means faster than round 1.
"""

import json
import sys
import time

import numpy as np

# local-energy evals/sec/chip recorded in round 1 on TPU v5e with the
# reference-style 'partition' Laplacian engine (varied inputs, batch 16);
# the upstream repo publishes no numbers of its own.
ROUND1_BASELINE = 18.58  # measured 2026-08-16


def build(S=2, batch=48, mode="forward", partition_number=None):
    import jax

    from deepsolid_tpu.hamiltonian import make_local_energy
    from deepsolid_tpu.sampling.init import init_electrons

    sys.path.insert(0, ".")
    from __graft_entry__ import _diamond_network

    sc, net = _diamond_network(S=S)
    n3 = sc.nelectron * 3
    if partition_number is None:
        partition_number = max(1, n3 // 16)  # 16-wide tangent chunks
    while n3 % partition_number:
        partition_number += 1

    key = jax.random.PRNGKey(0)
    params = net.init(key)
    data = init_electrons(key, sc, sc.nelec, batch_size=batch)

    el = make_local_energy(
        net.logdet, sc, mode=mode, partition_number=partition_number,
        network=net,
    )
    raw = jax.vmap(el, in_axes=(None, 0))
    # fetch real/imag separately: complex host transfers are unimplemented
    # on the axon TPU backend
    batch_el = jax.jit(lambda p, d: (lambda ke, ew: (ke.real, ew))(*raw(p, d)))
    return params, data, batch_el, sc


def _rate(batch_el, params, data, batch, iters):
    """Strictly sequential per-chip rate.

    The shared-pool TPU runtime fans independent dispatches out across
    chips and its block_until_ready is unreliable, so the iterations run
    inside ONE jitted lax.scan whose carry feeds each iteration's input
    from the previous output — serialized on device by construction, and
    the varying shift defeats runtime-level result caching. Fetching the
    scalar result forces completion.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, data):
        def body(c, i):
            ke, _ = batch_el(params, data + 1e-4 * (i + 2.0) + 1e-30 * c)
            return ke.mean().real.astype(data.dtype), 0.0

        c, _ = jax.lax.scan(
            body, jnp.asarray(0.0, data.dtype),
            jnp.arange(iters, dtype=data.dtype),
        )
        return c

    float(np.asarray(run(params, data)))  # compile + warmup
    t0 = time.perf_counter()
    float(np.asarray(run(params, data + 1e-5)))
    return batch * iters / (time.perf_counter() - t0)


def main():
    # Measure BOTH engines back-to-back in the same window: the shared
    # TPU pool's throughput fluctuates by up to 10x on a minutes
    # timescale, so vs_baseline is the live forward/partition ratio (the
    # reference-style JVP-ladder engine measured under identical
    # conditions), not a ratio against a stale constant.
    fwd = build(S=2, batch=48, mode="forward")
    part = build(S=2, batch=16, mode="partition")
    evals_per_sec = _rate(fwd[2], fwd[0], fwd[1], 48, 8)
    base = _rate(part[2], part[0], part[1], 16, 4)
    print(
        json.dumps(
            {
                "metric": "local_energy_evals_per_sec_per_chip "
                          "(C-diamond 2x2x2, 96e, full-size net; "
                          "vs_baseline = live ratio over the "
                          "reference-style partition engine)",
                "value": round(evals_per_sec, 3),
                "unit": "walkers/s",
                "vs_baseline": round(evals_per_sec / base, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
