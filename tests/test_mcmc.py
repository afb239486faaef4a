"""MCMC sampler correctness: samples a known Gaussian target in PBC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.sampling.mcmc import (
    limit_drift,
    make_mcmc_step,
    update_mcmc_width,
)


def gaussian_target(latvec_size=20.0, sigma=0.6, nelec=2):
    """log|psi| for psi = prod exp(-(x-c)^2 / (4 sigma^2)): |psi|^2 has std sigma."""
    center = latvec_size / 2.0

    def slog(params, x):
        del params
        return -jnp.sum((x - center) ** 2) / (4 * sigma**2)

    return slog, center, sigma


@pytest.mark.parametrize("kind", ["all", "one", "importance"])
def test_samples_gaussian_moments(kind):
    L = 20.0
    sigma = 0.6
    slog, center, _ = gaussian_target(L, sigma)
    batch_slog = jax.vmap(slog, in_axes=(None, 0))
    latvec = np.eye(3) * L

    step = make_mcmc_step(
        batch_slog,
        latvec,
        steps=10,
        importance_network=slog if kind == "importance" else None,
        one_electron_moves=(kind == "one"),
    )
    step = jax.jit(step)

    key = jax.random.PRNGKey(0)
    batch = 256
    data = center + 0.5 * jax.random.normal(key, (batch, 6))
    width = jnp.asarray(0.4)
    for _ in range(60):
        key, sub = jax.random.split(key)
        data, pmove = step(None, data, sub, width)
    assert 0.05 < float(pmove) <= 1.0

    samples = np.asarray(data) - center
    # mean ~ 0, std ~ sigma
    np.testing.assert_allclose(samples.mean(), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(), sigma, rtol=0.12)


def test_walkers_stay_in_cell():
    L = 5.0
    slog, center, sigma = gaussian_target(L, 2.0)
    batch_slog = jax.vmap(slog, in_axes=(None, 0))
    step = jax.jit(make_mcmc_step(batch_slog, np.eye(3) * L, steps=5))
    key = jax.random.PRNGKey(1)
    data = jax.random.uniform(key, (64, 6)) * L
    for _ in range(10):
        key, sub = jax.random.split(key)
        data, _ = step(None, data, sub, jnp.asarray(1.0))
    arr = np.asarray(data)
    assert np.all(arr >= -1e-9) and np.all(arr <= L + 1e-9)


def test_limit_drift():
    g = jnp.asarray([[10.0, 0.0, 0.0, 0.0, 0.1, 0.0]])
    clipped = np.asarray(limit_drift(g, cutoff=1.0)).reshape(2, 3)
    np.testing.assert_allclose(np.linalg.norm(clipped[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(clipped[1], [0.0, 0.1, 0.0], atol=1e-8)


def test_width_adaptation():
    width = jnp.asarray(0.1)
    pmoves = jnp.zeros(10)
    # fill with high acceptance -> width goes up at t multiple of 10
    for t in range(1, 11):
        width, pmoves = update_mcmc_width(t, width, pmoves, 0.9, 10)
    assert float(width) > 0.1
    width2 = width
    for t in range(11, 21):
        width2, pmoves = update_mcmc_width(t, width2, pmoves, 0.1, 10)
    assert float(width2) < float(width)
