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


def slogdet_op(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(phase, log|det|) of batched square complex matrices.

    Fast path for 1x1 matrices; otherwise jnp.linalg.slogdet.
    """
    if x.shape[-1] == 1:
        elem = x[..., 0, 0]
        mag = jnp.abs(elem)
        sign = elem / mag
        return sign, jnp.log(mag)
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
