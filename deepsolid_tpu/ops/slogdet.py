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
    """slogdet via the Pallas lane-batched Gauss-Jordan kernel,
    differentiable to arbitrary order in BOTH autodiff modes.

    The kernel materializes A^-1 alongside (sign, log|det|), so every
    derivative has a closed form in kernel outputs:
      d(A^-1)    = -A^-1 dA A^-1
      t          = tr(A^-1 dA)
      dlog|det|  = Re t,   dsign = i sign Im t
    The custom JVP rule expresses those tangents in terms of the
    custom-JVP'd primal itself (a recursive rule), so JAX can
    re-differentiate the rule for higher orders (the reference-style
    partition engine takes jvp-of-grad through log psi) and transpose it
    for reverse mode — the raw pallas_call is never differentiated.
    Semantics match jnp.linalg.slogdet's autodiff rules.

    Cost note (ADVICE r3): the recursive rule re-invokes gj_all(a) — a
    pallas_call XLA typically does not CSE — once per differentiation
    level, so NESTED grad/jvp consumers run the Gauss-Jordan kernel
    multiple times on the same matrix. The production paths are immune
    (the MCMC value path and slogdet_jet need no nesting); if the
    partition engine is ever run kernel-on in production, thread the
    primal a_inv through as an auxiliary output instead."""
    from deepsolid_tpu.ops.pallas import det_kernels

    kernel = (det_kernels.gj_inverse_slogdet_interpret if interpret
              else det_kernels.gj_inverse_slogdet)

    @jax.custom_jvp
    def gj_all(a):
        return kernel(a)

    @gj_all.defjvp
    def _gj_all_jvp(primals, tangents):
        (a,), (da,) = primals, tangents
        a_inv, sign, logabs = gj_all(a)
        # tr(A^-1 dA) as an n^2 contraction; the n^3 d(A^-1) matmuls are
        # dead-code-eliminated in slogdet-only consumers.
        t = jnp.sum(jnp.swapaxes(a_inv, -1, -2) * da, axis=(-1, -2))
        d_inv = -(a_inv @ da @ a_inv)
        return ((a_inv, sign, logabs),
                (d_inv, 1j * sign * jnp.imag(t), jnp.real(t)))

    def gj_slogdet(a):
        _, sign, logabs = gj_all(a)
        return sign, logabs

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
