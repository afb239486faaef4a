"""Observables: complex polarization and structure factor."""

import jax
import numpy as np

from deepsolid_tpu import observables

from fixtures import h2_supercell


def test_complex_polarization_bounds_and_phase():
    sc = h2_supercell()
    pol_fn = jax.jit(observables.make_complex_polarization(sc, direction=0))
    rng = np.random.RandomState(0)
    data = rng.rand(16, sc.nelectron * 3) * 4.0
    pol = complex(pol_fn(data))
    assert abs(pol) <= 1.0 + 1e-9
    # translating every electron by a lattice vector leaves it invariant
    shift = np.tile(sc.lattice[0], sc.nelectron)
    pol2 = complex(pol_fn(data + shift))
    np.testing.assert_allclose(pol, pol2, rtol=1e-8)


def test_structure_factor_properties():
    sc = h2_supercell()
    sk_fn = jax.jit(observables.make_structure_factor(sc, nq=2))
    rng = np.random.RandomState(1)
    data = rng.rand(64, sc.nelectron * 3) * 4.0
    sk = np.asarray(sk_fn(data))
    assert sk.shape == (8,)  # nq^3 points
    # S(0) = N <..>-fluctuation of total electron count = 0 exactly
    np.testing.assert_allclose(sk[0], 0.0, atol=1e-9)
    # real and non-negative up to sampling noise
    assert np.all(sk.real > -1e-9)
