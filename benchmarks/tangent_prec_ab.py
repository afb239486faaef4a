"""A/B the tangent matmul precision tier on the real chip.

The forward-Laplacian tangent blocks (jac matmuls + det-head A^-1 J_t)
carry ~80% of the E_L FLOPs. cfg.tangent_matmul_precision='high'
(bf16_3x) doubles their MXU throughput; this script measures what that
does to (a) per-walker local energies of a TRAINED state and (b) the
serialized E_L evaluation rate, so the tier can be promoted per system
with evidence (same methodology as benchmarks/f64_reeval.py).

Usage: python benchmarks/tangent_prec_ab.py <ckpt_dir> <system> [n_walkers]
  system: 'lih' (rock-salt 2x2x2 sto-3g) | 'h2' | 'diamond-bench'
    'diamond-bench' skips the checkpoint and times the bench network on
    random-initialized params (rate A/B only).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rate(fn, params, data, iters=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, data):
        def body(c, i):
            ke = fn(params, data + 1e-4 * (i + 2.0) + 1e-30 * c)
            return jnp.real(ke).mean().astype(jnp.float32), 0.0

        c, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32),
            jnp.arange(iters, dtype=jnp.float32),
        )
        return c

    float(np.asarray(run(params, data)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(params, data + 1e-5)))
    return data.shape[0] * iters / (time.perf_counter() - t0)


def main():
    ckpt_dir, system = sys.argv[1], sys.argv[2]
    n_walkers = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from deepsolid_tpu.hamiltonian import make_local_energy
    from deepsolid_tpu.ops import fwdlap

    if system == "diamond-bench":
        import bench

        params, data, fn, sc = bench.build(S=2, batch=n_walkers,
                                           mode="forward", el_chunk=32)
        el_fn = lambda p, d: fn(p, d)[0]
        t = -1
    else:
        from benchmarks.f64_reeval import build_cfg
        from deepsolid_tpu.train import pretrain as pretrain_lib
        from deepsolid_tpu.train.process import (_ensure_supercell,
                                                 build_network)
        from deepsolid_tpu.utils import checkpoint as ckpt_lib

        cfg = build_cfg(system)
        sc = _ensure_supercell(cfg.system.cell)
        src = pretrain_lib.make_orbital_source(cfg, sc)
        net = build_network(cfg, sc, klist_override=src.klist)
        fname = ckpt_lib.find_last_checkpoint(ckpt_dir)
        assert fname, f"no checkpoint under {ckpt_dir}"
        t, data, params, _, _ = ckpt_lib.restore(fname)
        data = jnp.asarray(np.asarray(data)[:n_walkers], jnp.float32)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params)
        el = make_local_energy(net.logdet, sc, mode="forward", network=net)
        vm = jax.vmap(el, in_axes=(None, 0))
        el_fn = lambda p, d: vm(p, d)[0] + vm(p, d)[1]

        def el_full(p, d):
            ke, ew = vm(p, d)
            return ke + ew

        el_fn = el_full

    tiers = ("highest", "high", "default")
    out = {"system": system, "step": int(t), "n_walkers": int(n_walkers)}
    energies = {}
    for tier in tiers:
        fwdlap.set_tangent_precision(None if tier == "highest" else tier)
        if system != "diamond-bench":
            e = np.asarray(jax.jit(el_fn)(params, data))
            energies[tier] = e
        out[f"rate_{tier}_walkers_per_s"] = round(
            _rate(jax.jit(el_fn) if system != "diamond-bench" else el_fn,
                  params, data), 3)
    fwdlap.set_tangent_precision(None)

    for tier in tiers[1:]:
        if energies:
            err = energies[tier].real - energies["highest"].real
            out[f"{tier}_vs_highest"] = {
                "per_walker_abs_err_mean_Ha": float(np.abs(err).mean()),
                "per_walker_abs_err_max_Ha": float(np.abs(err).max()),
                "batch_mean_err_Ha": float(err.mean()),
                "batch_mean_err_stderr_Ha": float(
                    err.std() / np.sqrt(len(err))),
            }
        out[f"speedup_{tier}"] = round(
            out[f"rate_{tier}_walkers_per_s"]
            / out["rate_highest_walkers_per_s"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
