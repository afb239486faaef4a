"""Autocorrelation comparison of the three MCMC proposal kinds on a
TRAINED wavefunction (VERDICT r2 weak #7 / next-round item 10: "promote
the sampler alternatives or demote them" with data).

System: the trained H10 chain state (runs/h10_r3 checkpoint). For each
proposal kind — all-electron Gaussian (the default), one-electron, and
Langevin-drift importance sampling (reference: DeepSolid/qmc.py:83-287,
marked "untested" upstream) — the proposal width is first self-adapted
to the 0.5-0.55 acceptance band with the production controller
(update_mcmc_width), then a long chain records the complex-polarization
order parameter Re P = Re exp(i b.sum r) per outer move, and the
integrated autocorrelation time (Sokal windowed estimator) is converted
into the metric that actually matters for VMC throughput: **batched
|psi|^2 evaluations per effective (decorrelated) sample**.

Eval-cost accounting per outer move:
  all-electron: 1 batched logpsi eval
  one-electron: nelec evals (this implementation, like the reference,
    re-evaluates the full determinant per single-electron move — no
    low-rank Sherman-Morrison update on either side)
  importance:   1 value_and_grad eval (fwd+bwd, ~2-3x a plain eval in
    FLOPs; wall-clock is also reported)

Run on CPU (the comparison is sampler physics, not hardware):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/sampler_autocorr.py [ckpt_dir] [out_json]
"""

import json
import logging
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deepsolid_tpu.configs import hydrogen_chain
from deepsolid_tpu.observables import make_complex_polarization
from deepsolid_tpu.sampling.mcmc import make_mcmc_step, update_mcmc_width
from deepsolid_tpu.train import process as process_lib
from deepsolid_tpu.train import pretrain as pretrain_lib
from deepsolid_tpu.utils import checkpoint as checkpoint_lib

logging.basicConfig(level=logging.INFO)

BATCH = 256
ADAPT_MOVES = 400
MEASURE_MOVES = {  # one-electron moves cost nelec evals each — fewer needed
    "all_electron": 4000,
    "one_electron": 2000,
    "importance_sampling": 3000,
}


def sokal_iat(series: np.ndarray, c: float = 6.0) -> float:
    """Integrated autocorrelation time of a 1-D series (Sokal window:
    smallest W with W >= c * tau_int(W))."""
    x = series - series.mean()
    n = len(x)
    acf = np.correlate(x, x, mode="full")[n - 1:] / (np.arange(n, 0, -1))
    acf /= acf[0]
    tau = 1.0
    for w in range(1, n // 3):
        tau = 1.0 + 2.0 * np.sum(acf[1:w + 1])
        if w >= c * tau:
            return max(tau, 1.0)
    return max(tau, 1.0)


def main():
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/h10_r3"
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/sampler_autocorr.json"
    )

    cfg = hydrogen_chain.get_config("H,10,1,1,1.8,0,ccpvdz")
    cfg.batch_size = BATCH
    cfg.precision = "float32"
    sc = cfg.system.cell
    source = pretrain_lib.make_orbital_source(cfg, sc)
    net = process_lib.build_network(cfg, sc, klist_override=source.klist)

    last = checkpoint_lib.find_last_checkpoint(ckpt_dir)
    if not last:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    t0, data, params, _, width0 = checkpoint_lib.restore(last, BATCH)
    logging.info("restored %s (t=%d), walkers %s", last, t0, data.shape)
    data = jnp.asarray(np.asarray(data), jnp.float32)
    params = jax.tree.map(lambda a: jnp.asarray(a), params)

    latvec = np.asarray(sc.lattice)
    polar = make_complex_polarization(sc)
    nelec = data.shape[-1] // 3

    kinds = {
        "all_electron": dict(one_electron_moves=False, importance=False,
                             evals_per_move=1.0),
        "one_electron": dict(one_electron_moves=True, importance=False,
                             evals_per_move=float(nelec)),
        "importance_sampling": dict(one_electron_moves=False, importance=True,
                                    evals_per_move=1.0),
    }

    results = {}
    for name, kind in kinds.items():
        step = make_mcmc_step(
            net.batch_slogdet,
            latvec,
            steps=1,
            importance_network=net.slogdet if kind["importance"] else None,
            one_electron_moves=kind["one_electron_moves"],
        )
        n_measure = MEASURE_MOVES[name]

        # width self-adaptation with the production controller, then the
        # measurement chain — both as on-device scans (per-move host
        # round-trips dominate wall-clock otherwise)
        @jax.jit
        def adapt_chain(params, x, key, width):
            def body(state, t):
                x, key, width, pmoves = state
                key, sub = jax.random.split(key)
                x, pmove = step(params, x, sub, width)
                width, pmoves = update_mcmc_width(
                    t, width, pmoves, pmove, adapt_frequency=20
                )
                return (x, key, width, pmoves), None

            state = (x, key, width, jnp.zeros(20, jnp.float32))
            (x, key, width, _), _ = jax.lax.scan(
                body, state, jnp.arange(ADAPT_MOVES)
            )
            return x, key, width

        @jax.jit
        def measure_chain(params, x, key, width):
            def body(state, _):
                x, key = state
                key, sub = jax.random.split(key)
                x, pmove = step(params, x, sub, width)
                return (x, key), (jnp.mean(polar(x).real), pmove)

            (x, _), (series, acc) = jax.lax.scan(
                body, (x, key), None, length=n_measure
            )
            return series, acc

        key = jax.random.PRNGKey(7)
        x, key, width = adapt_chain(
            params, data, key, jnp.asarray(width0, jnp.float32)
        )
        width = float(width)
        t_start = time.perf_counter()
        series, acc = jax.block_until_ready(
            measure_chain(params, x, key, jnp.float32(width))
        )
        wall = time.perf_counter() - t_start
        series, acc = np.asarray(series), np.asarray(acc)

        tau_moves = sokal_iat(series)
        # one-electron inner loop does nelec sub-moves per outer move
        evals = kind["evals_per_move"]
        results[name] = {
            "width": width,
            "acceptance": float(acc.mean()),
            "iat_moves": float(tau_moves),
            "evals_per_move": evals,
            "iat_evals": float(tau_moves * evals),
            "wall_s_per_move": wall / n_measure,
            "iat_wall_s": wall / n_measure * tau_moves,
        }
        logging.info("%s: %s", name, results[name])

    base = results["all_electron"]["iat_evals"]
    for name, r in results.items():
        r["iat_evals_vs_all_electron"] = r["iat_evals"] / base

    meta = {
        "system": "H10 chain r=1.8 (trained state, %s)" % last,
        "batch": BATCH,
        "observable": "Re complex polarization (b_x)",
        "measure_moves": MEASURE_MOVES,
    }
    with open(out_json, "w") as f:
        json.dump({"meta": meta, "results": results}, f, indent=1)
    print(json.dumps({"meta": meta, "results": results}, indent=1))


if __name__ == "__main__":
    main()
