"""Component-level timing of the forward-Laplacian local-energy path on
the real chip: full E_L vs kinetic-only vs det-head-only vs Ewald-only.

Answers "where do the milliseconds go?" ahead of kernel work (VERDICT r2
weak #2: MFU 1.6%): if the det head (slogdet_jet's LU + batched
A^-1 J_t matmuls) dominates, a lane-batched Pallas LU is the next
kernel; if the one-stream jets dominate, block-sparsity is.

Usage: python benchmarks/engine_profile.py [batch] [chunk]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench


def _scan_time(fn, args, iters, perturb):
    """Serialized on-device timing (bench._rate pattern): iterations are
    chained through the carry so the shared pool cannot fan them out."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(c, i):
            out = fn(*perturb(args, i, c))
            return jnp.real(out).astype(jnp.float32), 0.0

        c, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32),
            jnp.arange(iters, dtype=jnp.float32),
        )
        return c

    float(np.asarray(run(*args)))  # compile + warmup
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # optional section filter, e.g. "det" to skip the expensive full/kinetic
    # traces while iterating on det-head kernels
    sections = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "full", "kinetic", "det"]

    from deepsolid_tpu.hamiltonian import make_local_energy
    from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
    from deepsolid_tpu.ops import fwdlap as fl
    from deepsolid_tpu.sampling.init import init_electrons

    from __graft_entry__ import _diamond_network

    sc, net = _diamond_network(S=2)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    data = init_electrons(key, sc, sc.nelec, batch_size=batch)

    def chunked(vm):
        def f(p, d):
            chunks = d.reshape(d.shape[0] // chunk, chunk, d.shape[-1])
            return jax.lax.map(lambda c: vm(p, c), chunks)
        return f

    out = {"batch": batch, "chunk": chunk, "n_elec": int(sc.nelectron)}

    # ---- full local energy ------------------------------------------------
    if "full" in sections:
        el = make_local_energy(net.logdet, sc, mode="forward", network=net)
        vm_el = jax.vmap(el, in_axes=(None, 0))

        def full_fn(p, d):
            ke, ew = chunked(vm_el)(p, d)
            return ke.real.mean() + ew.mean()

        dt = _scan_time(
            full_fn, (params, data), 3,
            lambda a, i, c: (a[0], a[1] + 1e-4 * (i + 2.0) + 1e-30 * c),
        )
        out["full_el_walkers_per_s"] = batch / dt

    # ---- kinetic only -----------------------------------------------------
    if "kinetic" in sections:
        kin = make_kinetic_forward(net)
        vm_kin = jax.vmap(kin, in_axes=(None, 0))

        def kin_fn(p, d):
            return chunked(vm_kin)(p, d).real.mean()

        dt = _scan_time(
            kin_fn, (params, data), 3,
            lambda a, i, c: (a[0], a[1] + 1e-4 * (i + 2.0) + 1e-30 * c),
        )
        out["kinetic_walkers_per_s"] = batch / dt

    # (ewald is cheap and fused with E_L; estimate = full - kinetic)

    # ---- det head only ----------------------------------------------------
    # jets of the two spin-block orbital matrices at production shape:
    # (ndet, ns, ns) complex, T = 3N tangents
    if "det" not in sections:
        print(json.dumps(out, indent=1))
        return
    # partial results first: a det-section failure must not discard the
    # full/kinetic numbers (the axon backend rejects EAGER complex ops,
    # so the jets are constructed inside a jit and stay on device)
    print(json.dumps(out, indent=1), flush=True)
    n3 = sc.nelectron * 3
    ndet = 8
    blocks = [s for s in (sc.nelec[0], sc.nelec[1]) if s > 0]
    keys = jax.random.split(key, 6)
    det_chunk = min(chunk, 16)

    def make_jet_arrays(ns_idx):
        ns = blocks[ns_idx]
        shape = (det_chunk, ndet, ns, ns)
        val = (jax.random.normal(keys[0], shape) +
               1j * jax.random.normal(keys[1], shape)).astype(jnp.complex64)
        val = val + 3.0 * jnp.eye(ns, dtype=jnp.complex64)
        jac = (jax.random.normal(keys[2], (n3,) + shape, jnp.float32) +
               1j * jax.random.normal(keys[3], (n3,) + shape, jnp.float32)
               ).astype(jnp.complex64) * 0.05
        lap = (jax.random.normal(keys[4], shape) +
               1j * jax.random.normal(keys[5], shape)
               ).astype(jnp.complex64) * 0.05
        return val, jac, lap

    make_jet_jit = jax.jit(make_jet_arrays, static_argnums=0)
    jets = [fl.Jet(*make_jet_jit(k)) for k in range(len(blocks))]

    def det_fn(*flat):
        total = 0.0
        i = 0
        for _ in blocks:
            j = fl.Jet(flat[i], flat[i + 1], flat[i + 2])
            i += 3
            vm = jax.vmap(
                lambda v, ja, la: fl.slogdet_jet(fl.Jet(v, ja, la)),
                in_axes=(0, 1, 0),
            )
            sign, ld = vm(j.val, j.jac, j.lap)
            total = total + ld.lap.real.mean() + ld.val.real.mean()
        return total

    flat = [x for j in jets for x in (j.val, j.jac, j.lap)]
    dt = _scan_time(
        det_fn, tuple(flat), 3,
        lambda a, i, c: tuple(x + (1e-6 * (i + 1.0) + 1e-30 * c
                                   if x.ndim == 4 else 0.0)
                              for x in a),
    )
    out["det_head_walkers_per_s"] = det_chunk / dt
    out["det_head_chunk"] = det_chunk

    if "full" in sections:
        out["det_head_share_est"] = (
            out["full_el_walkers_per_s"] / out["det_head_walkers_per_s"]
        )
        if "kinetic" in sections:
            out["kinetic_share"] = (
                out["full_el_walkers_per_s"] / out["kinetic_walkers_per_s"]
            )

    # ---- det head split: factorization vs tangent matmuls -----------------
    # (a) LU + explicit inverse + slogdet only — the sequential/lane-hostile
    # part a Pallas lane-batched Gauss-Jordan would replace;
    # (b) the T tangent Gauss-split matmuls + trace reductions only — the
    # MXU part the tangent precision tier accelerates. Together they bound
    # which kernel investment pays.
    def lu_fn(v):
        lu, piv = jax.scipy.linalg.lu_factor(v)
        sign, logdet = jnp.linalg.slogdet(v)
        n = v.shape[-1]
        a_inv = jax.scipy.linalg.lu_solve(
            (lu, piv), jnp.broadcast_to(jnp.eye(n, dtype=v.dtype), v.shape)
        )
        return a_inv.real.mean() + logdet.real.mean()

    def lu_all(*vals):
        return sum(lu_fn(v) for v in vals)

    vals = tuple(j.val for j in jets)
    dt = _scan_time(
        lu_all, vals, 3,
        lambda a, i, c: tuple(x + (1e-6 * (i + 1.0) + 1e-30 * c) for x in a),
    )
    out["det_lu_inverse_walkers_per_s"] = det_chunk / dt

    # (a') same factorization+inverse via the Pallas lane-batched
    # Gauss-Jordan kernel (ops/pallas/det_kernels.py) — the A/B that
    # decides whether debug.det_kernel flips to auto-on
    from deepsolid_tpu.ops.pallas.det_kernels import gj_inverse_slogdet

    def gj_all(*vals):
        total = 0.0
        for v in vals:
            a_inv, sign, logabs = gj_inverse_slogdet(v)
            total = total + a_inv.real.mean() + logabs.mean()
        return total

    dt = _scan_time(
        gj_all, vals, 3,
        lambda a, i, c: tuple(x + (1e-6 * (i + 1.0) + 1e-30 * c) for x in a),
    )
    out["det_gj_kernel_walkers_per_s"] = det_chunk / dt

    # full det head with the kernel forced on (trace-time dispatch)
    fl.set_det_kernel(True)
    try:
        dt = _scan_time(
            det_fn, tuple(flat), 3,
            lambda a, i, c: tuple(x + (1e-6 * (i + 1.0) + 1e-30 * c
                                       if x.ndim == 4 else 0.0)
                                  for x in a),
        )
        out["det_head_kernel_walkers_per_s"] = det_chunk / dt
    finally:
        fl.set_det_kernel(None)

    def tang_fn(*flat):
        import functools

        total = 0.0
        for k in range(len(blocks)):
            a_inv, jac = flat[2 * k], flat[2 * k + 1]
            ar, ai = a_inv.real[:, None], a_inv.imag[:, None]
            jr, ji = jac.real, jac.imag
            mm = functools.partial(jnp.matmul, precision=fl._TANGENT_PRECISION)
            p1 = mm(ar, jr)
            p2 = mm(ai, ji)
            p3 = mm(ar + ai, jr + ji)
            br, bi = p1 - p2, p3 - p1 - p2
            jac_tr = jnp.trace(br, axis1=-2, axis2=-1)
            lap2 = jnp.sum(br * jnp.swapaxes(br, -1, -2)
                           - bi * jnp.swapaxes(bi, -1, -2), axis=(-1, -2))
            total = total + jac_tr.sum() + lap2.sum()
        return total

    # jac laid out (b, T, ndet, ns, ns) so the per-walker batch leads
    flat_tang = []
    for j in jets:
        flat_tang += [j.val, jnp.moveaxis(j.jac, 0, 1)]
    dt = _scan_time(
        tang_fn, tuple(flat_tang), 3,
        lambda a, i, c: tuple(x + (1e-6 * (i + 1.0) + 1e-30 * c) for x in a),
    )
    out["det_tangent_matmuls_walkers_per_s"] = det_chunk / dt

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
