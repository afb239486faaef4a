"""Kinetic-energy engines: Laplacian of complex log psi.

The local kinetic energy is
  K = -1/2 [ Delta log psi + (grad log psi)^2 ]
with log psi = u + i v (R -> C), split into real/imag parts:
  Re K = -1/2 [ Delta u + |grad u|^2 - |grad v|^2 ]
  Im K = -1/2 [ Delta v + 2 grad u . grad v ]

Engines (reference mode ladder: DeepSolid/hamiltonian.py:45-159):
  'partition' — lax.scan over chunks of vmapped Hessian-vector products;
                memory ~ (3N / partition_number) forward widths. Default.
  'vmap'      — all 3N tangents vmapped at once ('dim_batch' upstream).
  'for'       — fori_loop, one tangent at a time (lowest memory).
  'hessian'   — jax.hessian trace (fast compile, large memory).
  'forward'   — forward-Laplacian propagation (see ops/fwdlap.py); one
                network pass carrying (value, Jacobian, Laplacian) jets.
                TPU-preferred: the 3N tangent axis rides the MXU as a
                batched matmul dimension instead of 3N re-traversals.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _grad_parts(f):
    grad_u = jax.grad(lambda p, y: f(p, y).real, argnums=1)
    grad_v = jax.grad(lambda p, y: f(p, y).imag, argnums=1)
    return grad_u, grad_v


def _combine(primal_u, primal_v, lap_u, lap_v):
    re = lap_u + jnp.sum(primal_u**2) - jnp.sum(primal_v**2)
    im = lap_v + 2.0 * jnp.sum(primal_u * primal_v)
    return -0.5 * (re + 1j * im)


def kinetic_for(f) -> Callable:
    """fori_loop over the 3N unit tangents (hamiltonian.py:45-70 semantics)."""

    def _kinetic(params, x):
        n = x.shape[-1]
        eye = jnp.eye(n, dtype=x.dtype)
        grad_u, grad_v = _grad_parts(f)
        gu = lambda y: grad_u(params, y)
        gv = lambda y: grad_v(params, y)

        def body(i, val):
            pu, tu = jax.jvp(gu, (x,), (eye[i],))
            pv, tv = jax.jvp(gv, (x,), (eye[i],))
            return (
                val[0] + tu[i] + pu[i] ** 2 - pv[i] ** 2,
                val[1] + tv[i] + 2 * pu[i] * pv[i],
            )

        re, im = jax.lax.fori_loop(0, n, body, (jnp.zeros((), x.dtype),) * 2)
        return -0.5 * (re + 1j * im)

    return _kinetic


def kinetic_vmap(f) -> Callable:
    """All 3N tangents in one vmap (hamiltonian.py:73-101 semantics)."""

    def _kinetic(params, x):
        n = x.shape[-1]
        eye = jnp.eye(n, dtype=x.dtype)
        grad_u, grad_v = _grad_parts(f)
        gu = lambda y: grad_u(params, y)
        gv = lambda y: grad_v(params, y)

        def one(e):
            pu, tu = jax.jvp(gu, (x,), (e,))
            pv, tv = jax.jvp(gv, (x,), (e,))
            return jnp.sum(tu * e), jnp.sum(tv * e), jnp.sum(pu * e), jnp.sum(pv * e)

        tu, tv, pu, pv = jax.vmap(one)(eye)
        return _combine(pu, pv, jnp.sum(tu), jnp.sum(tv))

    return _kinetic


def kinetic_partition(f, partition_number: int = 3) -> Callable:
    """scan over `partition_number` chunks of vmapped HVPs
    (hamiltonian.py:127-159 semantics). partition_number must divide 3N."""

    def _kinetic(params, x):
        n = x.shape[-1]
        if n % partition_number != 0:
            raise ValueError(
                f"partition_number={partition_number} must divide 3N={n}"
            )
        eye = jnp.eye(n, dtype=x.dtype).reshape(
            partition_number, n // partition_number, n
        )
        grad_u, grad_v = _grad_parts(f)
        gu = lambda y: grad_u(params, y)
        gv = lambda y: grad_v(params, y)
        vjvp_u = jax.vmap(lambda e: jax.jvp(gu, (x,), (e,)))
        vjvp_v = jax.vmap(lambda e: jax.jvp(gv, (x,), (e,)))

        def body(carry, e):
            pu, tu = vjvp_u(e)
            pv, tv = vjvp_v(e)
            lap_u = jnp.sum(tu * e)
            lap_v = jnp.sum(tv * e)
            # pu rows are identical (same primal); keep one row's contribution
            return carry, (lap_u, lap_v, pu[0], pv[0])

        _, (lap_u, lap_v, pu, pv) = jax.lax.scan(body, None, eye)
        return _combine(pu[0], pv[0], jnp.sum(lap_u), jnp.sum(lap_v))

    return _kinetic


def kinetic_hessian(f) -> Callable:
    """jax.hessian trace (hamiltonian.py:104-124 semantics)."""

    def _kinetic(params, x):
        u = lambda p, y: f(p, y).real
        v = lambda p, y: f(p, y).imag
        gu = jax.grad(u, argnums=1)(params, x)
        gv = jax.grad(v, argnums=1)(params, x)
        hu = jnp.trace(jax.hessian(u, argnums=1)(params, x))
        hv = jnp.trace(jax.hessian(v, argnums=1)(params, x))
        return _combine(gu, gv, hu, hv)

    return _kinetic


def make_kinetic(f, mode: str = "partition", partition_number: int = 3) -> Callable:
    """Kinetic-energy function (params, x) -> complex local kinetic energy.

    `f(params, x)` must return complex log psi for one walker x (3N,).
    """
    if mode == "for":
        return kinetic_for(f)
    if mode in ("vmap", "dim_batch"):
        return kinetic_vmap(f)
    if mode == "partition":
        return kinetic_partition(f, partition_number)
    if mode == "hessian":
        return kinetic_hessian(f)
    if mode == "forward":
        raise ValueError(
            "mode='forward' needs the Network object; use "
            "hamiltonian.make_local_energy(..., mode='forward', network=net) "
            "or models.fwdlap_forward.make_kinetic_forward(net) directly"
        )
    raise ValueError(f"Unknown laplacian mode: {mode}")
