"""Sign/log-determinant ops for complex orbital matrices.

Reference semantics: DeepSolid/network.py:375-427 (slogdet_op,
logdet_matmul). The log-sum-exp combination over determinants is kept in
the log domain for stability.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _make_gj_slogdet(interpret: bool):
    """slogdet via the Pallas lane-batched Gauss-Jordan kernel, with an
    exact custom VJP: the kernel already materializes A^-1, so the
    backward pass is the linear-transpose of jnp.linalg.slogdet's JVP
    rule (t = tr(A^-1 dA); dlog|det| = Re t, dsign = i sign Im t)
    evaluated with the saved inverse — no LU anywhere, forward or
    backward. Semantics match jnp.linalg.slogdet's autodiff because the
    same linearization is transposed by jax.linear_transpose."""
    from deepsolid_tpu.ops.pallas import det_kernels

    kernel = (det_kernels.gj_inverse_slogdet_interpret if interpret
              else det_kernels.gj_inverse_slogdet)

    @jax.custom_vjp
    def gj_slogdet(a):
        _, sign, logabs = kernel(a)
        return sign, logabs

    def fwd(a):
        a_inv, sign, logabs = kernel(a)
        return (sign, logabs), (a_inv, sign)

    def bwd(res, cts):
        a_inv, sign = res

        def lin(g):
            t = jnp.sum(jnp.swapaxes(a_inv, -1, -2) * g, axis=(-1, -2))
            return 1j * sign * jnp.imag(t), jnp.real(t)

        return jax.linear_transpose(lin, jnp.zeros_like(a_inv))(cts)

    gj_slogdet.defvjp(fwd, bwd)
    return gj_slogdet


_gj_slogdet = None
_gj_slogdet_interpret = None


def _kernel_slogdet(x, mode):
    global _gj_slogdet, _gj_slogdet_interpret
    if mode == "interpret":
        if _gj_slogdet_interpret is None:
            _gj_slogdet_interpret = _make_gj_slogdet(True)
        return _gj_slogdet_interpret(x)
    if _gj_slogdet is None:
        _gj_slogdet = _make_gj_slogdet(False)
    return _gj_slogdet(x)


def slogdet_op(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(phase, log|det|) of batched square complex matrices.

    Fast path for 1x1 matrices; jnp.linalg.slogdet by default; the
    Pallas Gauss-Jordan kernel when enabled (ops/fwdlap.set_det_kernel /
    debug.det_kernel) — the value path runs 20 MCMC forwards per
    training iteration, so the sampler dominates its call count.
    """
    if x.shape[-1] == 1:
        elem = x[..., 0, 0]
        mag = jnp.abs(elem)
        sign = elem / mag
        return sign, jnp.log(mag)
    from deepsolid_tpu.ops import fwdlap

    use = fwdlap._use_det_kernel(x)
    if use:
        return _kernel_slogdet(x, "interpret" if use == "interpret" else "on")
    return jnp.linalg.slogdet(x)


def logdet_matmul(
    xs: Sequence[jnp.ndarray], w: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted sum of determinant products in the log domain.

    Args:
      xs: orbital matrices per spin channel; each (ndet, n_s, n_s)
        (one entry of (ndet, n, n) when full_det).
      w: optional (ndet,) determinant weights (uniform if None).

    Returns:
      (phase, log|sum_i w_i prod_s det_i^s|) with |phase| = 1.
    """
    slogdets = [slogdet_op(x) for x in xs]
    sign, logdet = functools.reduce(
        lambda a, b: (a[0] * b[0], a[1] + b[1]), slogdets
    )
    logmax = jax.lax.stop_gradient(jnp.max(logdet))
    det = sign * jnp.exp(logdet - logmax)
    result = jnp.sum(det) if w is None else jnp.dot(det, w)
    mag = jnp.abs(result)
    phase = result / mag
    return phase, jnp.log(mag) + logmax
