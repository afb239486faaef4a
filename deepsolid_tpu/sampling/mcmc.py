"""Metropolis-Hastings sampling of |psi|^2 over periodic walkers.

Proposal kinds (reference semantics: DeepSolid/qmc.py:83-364):
  * all-electron Gaussian moves (optionally atom-centred asymmetric
    proposals scaled by the harmonic mean of nuclear distances)
  * one-electron moves
  * Langevin-drift importance sampling with drift clipping

The step function is pure (caller jits / shard_maps it); acceptance is
averaged with pmean over the data axis when bound.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from deepsolid_tpu.ops.distance import enforce_pbc
from deepsolid_tpu.parallel import DATA_AXIS, pmean_if_axis


def _log_prob_gaussian(x, mu, sigma):
    """Per-walker log density of an isotropic per-electron Gaussian.

    x, mu: (batch, nelec, 1, ndim); sigma broadcasts as (batch, nelec, 1, 1)
    — one width per electron, covering all ndim coordinates. Returns
    (batch,), dropping the x-independent (2 pi)^{-k/2} constant (it cancels
    in Metropolis ratios). Proposal density of qmc.py:26-41.
    """
    z2 = jnp.square((x - mu) / sigma)
    quad = jnp.sum(z2, axis=(1, 2, 3))
    log_det = x.shape[-1] * jnp.sum(jnp.log(sigma), axis=(1, 2, 3))
    return -0.5 * quad - log_det


def _harmonic_mean(x, atoms):
    """Per-electron harmonic-mean distance to the nuclei.

    x: (batch, nelec, 1, ndim); atoms: (natom, ndim).
    Returns (batch, nelec, 1, 1) — the proposal length scale that shrinks
    near nuclei (qmc.py:43-60 semantics).
    """
    dists = jnp.linalg.norm(x - atoms[None], axis=-1, keepdims=True)
    return 1.0 / jnp.mean(1.0 / dists, axis=-2, keepdims=True)


def limit_drift(g: jnp.ndarray, cutoff: float = 1.0) -> jnp.ndarray:
    """Clip per-electron drift magnitudes, preserving direction
    (qmc.py:63-81 semantics)."""
    shape = g.shape
    g = g.reshape(-1, 3)
    norm = jnp.linalg.norm(g, axis=-1)
    scale = cutoff / jnp.maximum(norm, cutoff)
    return (g * scale[:, None]).reshape(shape)


def mh_update(params, f, x1, key, lp_1, num_accepts, latvec, stddev,
              atoms=None, i=0):
    """One all-electron Metropolis-Hastings move (qmc.py:153-224)."""
    del i
    key, sub = jax.random.split(key)
    if atoms is None:
        x2 = x1 + stddev * jax.random.normal(sub, x1.shape, dtype=x1.dtype)
        x2, _ = enforce_pbc(latvec, x2)
        lp_2 = 2.0 * f(params, x2)
        ratio = lp_2 - lp_1
    else:
        n = x1.shape[0]
        x1r = x1.reshape(n, -1, 1, 3)
        h1 = _harmonic_mean(x1r, atoms)
        x2_raw = x1r + stddev * h1 * jax.random.normal(
            sub, x1r.shape, dtype=x1.dtype
        )
        x2, _ = enforce_pbc(latvec, x2_raw.reshape(n, -1))
        lp_2 = 2.0 * f(params, x2)
        h2 = _harmonic_mean(x2.reshape(n, -1, 1, 3), atoms)
        # Both proposal densities are evaluated on the ACTUAL pre-wrap
        # displacement. Using the wrapped x2 (as the reference does,
        # qmc.py:197-212) breaks detailed balance on boundary-crossing
        # moves: the |x2_wrapped - x1|^2 ~ L^2 exponent does not cancel
        # between the h1- and h2-width densities, biasing the sampled
        # distribution at ANY proposal width (caught by
        # tests/test_mcmc_stationarity.py on an anisotropic target).
        lq_1 = _log_prob_gaussian(x2_raw, x1r, stddev * h1)  # forward
        lq_2 = _log_prob_gaussian(x2_raw, x1r, stddev * h2)  # reverse
        ratio = lp_2 + lq_2 - lp_1 - lq_1

    key, sub = jax.random.split(key)
    rnd = jnp.log(jax.random.uniform(sub, lp_1.shape, dtype=x1.dtype))
    cond = ratio > rnd
    x_new = jnp.where(cond[..., None], x2, x1)
    lp_new = jnp.where(cond, lp_2, lp_1)
    num_accepts = num_accepts + jnp.sum(cond)
    return x_new, key, lp_new, num_accepts


def mh_one_electron_update(params, f, x1, key, lp_1, num_accepts, latvec,
                           stddev, atoms=None, i=0):
    """One single-electron Metropolis-Hastings move (qmc.py:227-287)."""
    if atoms is not None:
        raise NotImplementedError(
            "Asymmetric proposals are not implemented for one-electron moves."
        )
    key, sub = jax.random.split(key)
    n = x1.shape[0]
    x1r = x1.reshape(n, -1, 1, 3)
    nelec = x1r.shape[1]
    ii = i % nelec
    x2 = x1r.at[:, ii].add(
        stddev * jax.random.normal(sub, x1r[:, ii].shape, dtype=x1.dtype)
    )
    x2 = x2.reshape(n, -1)
    x2, _ = enforce_pbc(latvec, x2)
    lp_2 = 2.0 * f(params, x2)
    ratio = lp_2 - lp_1

    key, sub = jax.random.split(key)
    rnd = jnp.log(jax.random.uniform(sub, lp_1.shape, dtype=x1.dtype))
    cond = ratio > rnd
    x_new = jnp.where(cond[..., None], x2, x1)
    lp_new = jnp.where(cond, lp_2, lp_1)
    return x_new, key, lp_new, num_accepts + jnp.sum(cond)


def importance_update(params, f_val_grad, x1, key, lp_1, num_accepts, latvec,
                      stddev, atoms=None, i=0):
    """Langevin-drift importance-sampled move (qmc.py:83-150)."""
    del atoms, i
    key, sub = jax.random.split(key)
    _, grad = f_val_grad(params, x1)
    grad = limit_drift(grad)
    gauss = stddev * jax.random.normal(sub, x1.shape, dtype=x1.dtype)
    x2 = x1 + gauss + stddev**2 * grad
    x2, _ = enforce_pbc(latvec, x2)

    lpsi_2, new_grad = f_val_grad(params, x2)
    new_grad = limit_drift(new_grad)
    lp_2 = 2.0 * lpsi_2
    forward = jnp.sum(gauss**2, axis=-1)
    backward = jnp.sum((gauss + stddev**2 * (grad + new_grad)) ** 2, axis=-1)
    lp_2 = lp_2 + (forward - backward) / (2 * stddev**2)
    ratio = lp_2 - lp_1

    key, sub = jax.random.split(key)
    rnd = jnp.log(jax.random.uniform(sub, lp_1.shape, dtype=x1.dtype))
    cond = ratio > rnd
    x_new = jnp.where(cond[..., None], x2, x1)
    lp_new = jnp.where(cond, lp_2, lp_1)
    return x_new, key, lp_new, num_accepts + jnp.sum(cond)


def make_mcmc_step(
    batch_slog_network: Callable,
    latvec,
    steps: int = 10,
    atoms=None,
    importance_network: Optional[Callable] = None,
    one_electron_moves: bool = False,
    psi_chunk: int = 0,
) -> Callable:
    """Creates mcmc_step(params, data, key, width) -> (data, pmove).

    Pure function: jit / shard_map at the call site. pmove is pmean'd over
    the data axis when bound (reference: qmc.py:290-364).

    `psi_chunk` bounds the importance sampler's memory: its per-move
    value_and_grad otherwise materializes full-batch activations + the
    backward pass (the other samplers receive an already-chunked
    `batch_slog_network` from the driver).
    """
    latvec = jnp.asarray(latvec)
    if importance_network is not None:
        if one_electron_moves:
            raise ValueError(
                "Importance sampling with one-electron moves is not supported."
            )
        f = jax.vmap(
            jax.value_and_grad(importance_network, argnums=1), in_axes=(None, 0)
        )
        if psi_chunk and psi_chunk > 0:
            from deepsolid_tpu.train.loss import chunk_batch_fn

            f = chunk_batch_fn(f, psi_chunk, "psi")
        inner = importance_update
        logging.info("MCMC: Langevin importance sampling")
    elif one_electron_moves:
        f = batch_slog_network
        inner = mh_one_electron_update
        logging.info("MCMC: one-electron Metropolis")
    else:
        f = batch_slog_network
        inner = mh_update
        logging.info("MCMC: all-electron Metropolis")

    def mcmc_step(params, data, key, width):
        nelec = data.shape[-1] // 3
        nsteps = nelec * steps if one_electron_moves else steps

        def step_fn(i, state):
            return inner(
                params, f, *state, latvec=latvec, stddev=width, atoms=atoms, i=i
            )

        logprob = 2.0 * batch_slog_network(params, data)
        zero = jnp.zeros((), data.dtype)
        data, key, _, num_accepts = jax.lax.fori_loop(
            0, nsteps, step_fn, (data, key, logprob, zero)
        )
        pmove = jnp.sum(num_accepts) / (nsteps * data.shape[0])
        pmove = pmean_if_axis(pmove, DATA_AXIS)
        return data, pmove

    return mcmc_step


def update_mcmc_width(t, width, pmoves, pmove, adapt_frequency: int = 100):
    """Jit-safe adaptive proposal width.

    The reference adapts on host with a numpy ring buffer
    (process.py:367-374); here the buffer is part of the carried state so
    the whole training step stays on device.

    Returns (width, pmoves) updated.
    """
    t_mod = t % adapt_frequency
    should_update = jnp.logical_and(t > 0, t_mod == 0)
    mean_p = jnp.mean(pmoves)
    width = jnp.where(
        should_update,
        jnp.where(
            mean_p > 0.55, width * 1.1, jnp.where(mean_p < 0.5, width / 1.1, width)
        ),
        width,
    )
    pmoves = jnp.where(should_update, jnp.zeros_like(pmoves), pmoves)
    pmoves = pmoves.at[t_mod].set(pmove)
    return width, pmoves
