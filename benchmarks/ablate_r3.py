"""Component ablation timing of the forward local-energy pass (round 3).

Times the C-diamond 2x2x2 forward-Laplacian local energy with individual
stages stubbed to locate the dominant cost before kernel work:
  * full        — production path
  * no_lu       — det head LU/inverse replaced by transpose fakes (keeps
                  every matmul; isolates the LU/solve cost)
  * no_det      — whole slogdet_jet replaced by cheap reductions
  * no_ewald    — Ewald term dropped
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def rate(fn, params, data, iters=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, data):
        def body(c, i):
            ke, _ = fn(params, data + 1e-4 * (i + 2.0) + 1e-30 * c)
            return ke.mean().real.astype(data.dtype), 0.0

        c, _ = jax.lax.scan(
            body, jnp.asarray(0.0, data.dtype),
            jnp.arange(iters, dtype=data.dtype),
        )
        return c

    float(np.asarray(run(params, data)))
    t0 = time.perf_counter()
    float(np.asarray(run(params, data + 1e-5)))
    return data.shape[0] * iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    import bench
    from deepsolid_tpu.ops import fwdlap

    batch = 256
    p, d, f, sc = bench.build(S=2, batch=batch, mode="forward", el_chunk=32)
    print("full:", round(rate(f, p, d), 2), "walkers/s", flush=True)

    orig = fwdlap.slogdet_jet

    def slogdet_jet_no_lu(mat, axis_name=None):
        a = mat.val
        n = a.shape[-1]
        # fake inverse: transpose (same shapes/cost minus the LU+solves)
        a_inv = jnp.swapaxes(a, -1, -2)
        sign = jnp.ones(a.shape[:-2], a.dtype)
        logdet = jnp.sum(jnp.log(jnp.abs(a) + 1.0), axis=(-1, -2))
        b = a_inv[None] @ mat.jac
        jac = jnp.trace(b, axis1=-2, axis2=-1)
        lap1 = jnp.trace(a_inv @ mat.lap, axis1=-2, axis2=-1)
        lap2 = fwdlap._tsum(
            jnp.sum(b * jnp.swapaxes(b, -1, -2), axis=(-1, -2)), axis_name
        )
        return sign, fwdlap.Jet(logdet, jac, lap1 - lap2)

    def slogdet_jet_no_det(mat, axis_name=None):
        sign = jnp.ones(mat.val.shape[:-2], mat.val.dtype)
        logdet = jnp.sum(jnp.log(jnp.abs(mat.val) + 1.0), axis=(-1, -2))
        jac = jnp.sum(mat.jac, axis=(-1, -2))
        lap = jnp.sum(mat.lap, axis=(-1, -2)) + fwdlap._tsum(
            jnp.sum(jnp.abs(mat.jac) ** 2, axis=(-1, -2)), axis_name
        )
        return sign, fwdlap.Jet(logdet, jac, lap)

    for name, stub in (("no_lu", slogdet_jet_no_lu),
                       ("no_det", slogdet_jet_no_det)):
        fwdlap.slogdet_jet = stub
        import importlib

        from deepsolid_tpu.models import fwdlap_forward
        importlib.reload(fwdlap_forward)
        p2, d2, f2, _ = bench.build(S=2, batch=batch, mode="forward",
                                    el_chunk=32)
        print(f"{name}:", round(rate(f2, p2, d2), 2), "walkers/s",
              flush=True)
        fwdlap.slogdet_jet = orig

    importlib = __import__("importlib")
    from deepsolid_tpu.models import fwdlap_forward
    importlib.reload(fwdlap_forward)


if __name__ == "__main__":
    main()
