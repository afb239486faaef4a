"""Precision attribution: re-evaluate a trained TPU-f32 state in CPU-f64
(VERDICT r2 #5; ROADMAP item 4 methodology, extended from H2 to LiH).

Loads the latest checkpoint of a run, takes a walker subset, evaluates the
per-walker local energy with the production engine twice — (a) f32 on the
default backend (TPU if available) with 'highest' matmul precision, and
(b) float64 on CPU — and reports the per-walker error distribution and
the batch-mean energy error (the quantity that matters for the 1e-4
Ha/atom budget; errors are quasi-random so the mean error shrinks as
1/sqrt(batch)).

Usage: python benchmarks/f64_reeval.py <ckpt_dir> <system> [n_walkers]
  system: 'lih' (rock-salt 2x2x2 sto-3g) | 'h2'
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHILD = "_F64_REEVAL_CHILD" in os.environ


def build_cfg(system):
    if system == "lih":
        from deepsolid_tpu.configs import rock_salt

        cfg = rock_salt.get_config("Li,H,4.02,2,sto-3g")
        cfg.pretrain.scf = "hf"
    elif system == "diamond":
        from deepsolid_tpu.configs import diamond

        cfg = diamond.get_config("C,C,3.567,2,sto-3g")
        cfg.pretrain.scf = "hf"
    elif system == "h2":
        from deepsolid_tpu import config as config_lib
        from deepsolid_tpu.system import Atom, Cell, make_supercell

        cell = Cell.from_atoms(
            [Atom("H", (0.0, 0.0, 0.0)), Atom("H", (1.4, 0.0, 0.0))],
            np.eye(3) * 20.0,
            spin=0,
        )
        cfg = config_lib.default()
        cfg.system.cell = make_supercell(cell, np.eye(3))
        cfg.system.basis = "sto-3g"
        cfg.network.detnet.hidden_dims = ((64, 16), (64, 16), (64, 16))
        cfg.network.detnet.determinants = 4
    else:
        raise SystemExit(f"unknown system {system!r}")
    return cfg


def evaluate(ckpt_dir, system, n_walkers, x64, jet_store=None):
    import jax

    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from deepsolid_tpu.ops import fwdlap

    fwdlap.set_jet_storage(jet_store)

    from deepsolid_tpu.hamiltonian import make_local_energy
    from deepsolid_tpu.train import pretrain as pretrain_lib
    from deepsolid_tpu.train.process import _ensure_supercell, build_network
    from deepsolid_tpu.utils import checkpoint as ckpt_lib

    cfg = build_cfg(system)
    sc = _ensure_supercell(cfg.system.cell)
    src = pretrain_lib.make_orbital_source(cfg, sc)
    net = build_network(cfg, sc, klist_override=src.klist)

    fname = ckpt_lib.find_last_checkpoint(ckpt_dir)
    assert fname, f"no checkpoint under {ckpt_dir}"
    t, data, params, _, _ = ckpt_lib.restore(fname)
    data = np.asarray(data)[:n_walkers]

    dtype = jnp.float64 if x64 else jnp.float32
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    data = jnp.asarray(data, dtype)

    el = make_local_energy(
        net.logdet, sc, mode="forward", network=net,
    )
    vm = jax.jit(jax.vmap(el, in_axes=(None, 0)))
    ke, ew = vm(params, data)
    # fetch re/im separately: complex host transfers are unimplemented on
    # the axon TPU backend
    e_l = (np.asarray(jnp.real(ke)) + 1j * np.asarray(jnp.imag(ke))
           + np.asarray(ew))
    return t, e_l


def main():
    ckpt_dir, system = sys.argv[1], sys.argv[2]
    n_walkers = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    if CHILD:
        t, e_l = evaluate(ckpt_dir, system, n_walkers, x64=True)
        np.save("/tmp/f64_reeval_child.npy", e_l)
        print(f"child (f64 cpu): step {t}, {len(e_l)} walkers")
        return

    t, e_f32 = evaluate(ckpt_dir, system, n_walkers, x64=False,
                        jet_store="f32")
    print(f"f32 (default backend): step {t}, {len(e_f32)} walkers")
    _, e_bf16 = evaluate(ckpt_dir, system, n_walkers, x64=False,
                         jet_store="bf16")
    print(f"bf16 jet storage (default backend): {len(e_bf16)} walkers")

    env = dict(os.environ)
    env["_F64_REEVAL_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), ckpt_dir, system,
         str(n_walkers)],
        env=env, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    e_f64 = np.load("/tmp/f64_reeval_child.npy")

    err = (e_f32.real - e_f64.real)
    err_bf = (e_bf16.real - e_f64.real)
    scale = 1  # energies already per simulation cell; report raw Ha
    out = {
        "system": system,
        "step": int(t),
        "n_walkers": int(len(err)),
        "per_walker_abs_err_mean_Ha": float(np.abs(err).mean()) * scale,
        "per_walker_abs_err_max_Ha": float(np.abs(err).max()) * scale,
        "batch_mean_err_Ha": float(err.mean()) * scale,
        "batch_mean_err_stderr_Ha": float(err.std() / np.sqrt(len(err))),
        "e_f64_mean_Ha": float(e_f64.real.mean()),
        # bf16 trunk-jac storage arm (cfg.jet_storage='bf16'): same
        # walkers, same f64 anchor — the DELTA vs the f32 arm is the
        # storage-rounding bias the 1e-4 Ha/atom budget constrains
        "bf16_batch_mean_err_Ha": float(err_bf.mean()) * scale,
        "bf16_batch_mean_err_stderr_Ha": float(
            err_bf.std() / np.sqrt(len(err_bf))
        ),
        "bf16_per_walker_abs_err_mean_Ha": float(np.abs(err_bf).mean()),
        "bf16_minus_f32_mean_Ha": float((e_bf16.real - e_f32.real).mean()),
        "bf16_minus_f32_stderr_Ha": float(
            (e_bf16.real - e_f32.real).std() / np.sqrt(len(err))
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
