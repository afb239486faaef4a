"""Analytic feature jets vs autodiff on random displacements."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.models import features as fl_feat


@pytest.mark.parametrize("kind", ["nu", "tri"])
def test_distance_jets_match_autodiff(kind):
    rng = np.random.RandomState(0)
    lattice = rng.randn(3, 3) + 3 * np.eye(3)
    av = lattice / (2 * np.pi)
    bv = 2 * np.pi * np.linalg.inv(lattice).T
    dist = fl_feat._DISTANCE_FNS[kind]
    jet = fl_feat.DISTANCE_JET_FNS[kind]

    dx = jnp.asarray(rng.randn(7, 3) * 2.0)
    sd, dsd, lap_sd, rel, drel, lap_rel = jet(dx, av, bv)

    def f_sd(u):
        return dist(u, av, bv)[0]

    def f_rel(u):
        return dist(u, av, bv)[1]

    for i in range(7):
        u = dx[i]
        np.testing.assert_allclose(float(sd[i]), float(f_sd(u)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(rel[i]), np.asarray(f_rel(u)), rtol=1e-12
        )
        g = jax.jacfwd(f_sd)(u)
        np.testing.assert_allclose(np.asarray(dsd[i]), np.asarray(g),
                                   rtol=1e-9, atol=1e-12)
        h = jnp.trace(jax.hessian(f_sd)(u))
        np.testing.assert_allclose(float(lap_sd[i]), float(h),
                                   rtol=1e-8, atol=1e-10)
        jr = jax.jacfwd(f_rel)(u)  # (rel, 3)
        np.testing.assert_allclose(
            np.asarray(drel[i]), np.asarray(jr).T, rtol=1e-9, atol=1e-12
        )
        hr = jax.hessian(f_rel)(u)  # (rel, 3, 3)
        np.testing.assert_allclose(
            np.asarray(lap_rel[i]),
            np.trace(np.asarray(hr), axis1=1, axis2=2),
            rtol=1e-8, atol=1e-10,
        )
