"""Tests for minimal-image displacements and PBC wrapping."""

import itertools

import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.ops.distance import MinimalImage, enforce_pbc


def brute_force_min_image(dx, lattice, n=2):
    """Reference: direct search over (2n+1)^3 images."""
    best = None
    for m in itertools.product(range(-n, n + 1), repeat=3):
        cand = dx + np.asarray(m, np.float64) @ lattice
        if best is None or np.linalg.norm(cand) < np.linalg.norm(best):
            best = cand
    return best


def test_min_image_orthogonal():
    lattice = np.diag([3.0, 4.0, 5.0])
    mi = MinimalImage(lattice)
    rng = np.random.RandomState(1)
    for _ in range(20):
        dx = rng.randn(3) * 6
        got = np.asarray(mi.displacement(jnp.asarray(dx)))
        want = brute_force_min_image(dx, lattice, n=8)
        np.testing.assert_allclose(np.linalg.norm(got), np.linalg.norm(want),
                                   atol=1e-10)


def test_min_image_skewed():
    L = 3.7
    lattice = (1 - np.eye(3)) * L / 2  # fcc primitive vectors: skewed
    mi = MinimalImage(lattice)
    assert mi.general
    rng = np.random.RandomState(2)
    for _ in range(30):
        dx = rng.randn(3) * 5
        got = np.asarray(mi.displacement(jnp.asarray(dx)))
        want = brute_force_min_image(dx, lattice, n=8)
        np.testing.assert_allclose(np.linalg.norm(got), np.linalg.norm(want),
                                   atol=1e-10)


def test_dist_matrix_zero_diag():
    lattice = np.diag([3.0, 3.0, 3.0])
    mi = MinimalImage(lattice)
    x = jnp.asarray(np.random.RandomState(3).randn(12))  # 4 electrons
    v = mi.dist_matrix(x)
    assert v.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(v)[np.arange(4), np.arange(4)], 0.0)
    # antisymmetric off-diagonal
    np.testing.assert_allclose(np.asarray(v), -np.asarray(v).transpose(1, 0, 2),
                               atol=1e-10)


def test_enforce_pbc_in_cell_and_invariance():
    rng = np.random.RandomState(4)
    lattice = rng.randn(3, 3) + 3 * np.eye(3)
    x = jnp.asarray(rng.randn(5, 12) * 10)
    wrapped, wrap = enforce_pbc(lattice, x)
    assert wrapped.shape == x.shape
    frac = np.asarray(wrapped).reshape(5, 4, 3) @ np.linalg.inv(lattice)
    assert np.all(frac >= -1e-9) and np.all(frac < 1 + 1e-9)
    # wrap counts restore the original positions
    restored = np.asarray(wrapped).reshape(5, 4, 3) + np.asarray(wrap) @ lattice
    np.testing.assert_allclose(restored.reshape(5, 12), np.asarray(x), atol=1e-8)
    # already-wrapped points are fixed points
    wrapped2, wrap2 = enforce_pbc(lattice, wrapped)
    np.testing.assert_allclose(np.asarray(wrapped2), np.asarray(wrapped), atol=1e-8)


def test_elements_spins():
    from deepsolid_tpu.system import elements

    assert elements.from_symbol("H").spin_config == (1, 0)
    assert elements.from_symbol("Li").spin_config == (2, 1)
    assert elements.from_symbol("C").spin_config == (4, 2)
    assert elements.from_symbol("N").spin_config == (5, 2)
    assert elements.from_symbol("O").spin_config == (5, 3)
    assert elements.from_symbol("Cr").spin_config == (15, 9)
    assert elements.from_symbol("Cu").spin_config == (15, 14)
    assert elements.from_symbol("Ne").spin_config == (5, 5)
