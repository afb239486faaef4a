"""Ewald summation correctness tests.

The reference validates its Madelung energy against PySCF's energy_nuc()
(hamiltonian.py:170-173); without PySCF we validate against exact Madelung
constants and internal consistency (alpha independence, e-e vs i-i
formulation, lattice-translation invariance).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.ops.ewald import EwaldSum
from deepsolid_tpu.system import Atom, Cell

NACL_MADELUNG = 1.747564594633182  # per ion pair at unit nearest distance


def nacl_cell(a=2.0):
    """Conventional rock-salt cube of +-1 point charges, nearest distance a/2."""
    plus = [(0, 0, 0), (1, 1, 0), (1, 0, 1), (0, 1, 1)]
    minus = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
    coords = np.array(plus + minus, np.float64) * (a / 2)
    charges = np.array([1.0] * 4 + [-1.0] * 4)
    return Cell(
        lattice=np.eye(3) * a,
        atom_coords=coords,
        atom_charges=charges,
        atom_symbols=("H",) * 8,
        spin=0,
    )


def cscl_cell(a=1.0):
    """CsCl structure: simple cubic with a body-centered counter-ion."""
    return Cell(
        lattice=np.eye(3) * a,
        atom_coords=np.array([[0, 0, 0], [a / 2, a / 2, a / 2]]),
        atom_charges=np.array([1.0, -1.0]),
        atom_symbols=("H", "H"),
        spin=0,
    )


def test_nacl_madelung():
    a = 2.0
    ew = EwaldSum.build(nacl_cell(a))
    # 4 ion pairs, nearest-neighbor distance a/2
    expect = -4 * NACL_MADELUNG / (a / 2)
    np.testing.assert_allclose(ew.madelung, expect, rtol=1e-9)


def test_cscl_madelung():
    CSCL_MADELUNG = 1.76267477307099  # per pair at unit nearest distance
    a = 3.0
    ew = EwaldSum.build(cscl_cell(a))
    d = a * np.sqrt(3) / 2
    np.testing.assert_allclose(ew.madelung, -CSCL_MADELUNG / d, rtol=1e-9)


def test_alpha_independence():
    # G-vectors are cut at weight 1e-12, so agreement is ~1e-8 relative
    cell = nacl_cell(2.0)
    e1 = EwaldSum.build(cell, alpha=3.0).madelung
    e2 = EwaldSum.build(cell, alpha=5.0).madelung
    np.testing.assert_allclose(e1, e2, rtol=2e-8)


def h2_cell():
    L = 3.1
    return Cell.from_atoms(
        [Atom("H", (0, 0, 0)), Atom("H", (L / 2, L / 2, L / 2))],
        np.eye(3) * L,
        spin=0,
    )


def test_electron_ion_formulation_agree():
    """Electrons frozen at the ion sites reproduce the ion Madelung energy."""
    cell = h2_cell()
    ew = EwaldSum.build(cell)
    x = jnp.asarray(cell.atom_coords.reshape(-1))
    ee, ei, ii = ew.energy(x)
    np.testing.assert_allclose(float(ee), float(ii), rtol=1e-9)


def test_translation_invariance():
    cell = h2_cell()
    ew = EwaldSum.build(cell)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(6) * 3.1)
    e1 = float(ew.total_energy(x))
    # translate one electron by a lattice vector
    shift = jnp.asarray(np.concatenate([cell.lattice[0], np.zeros(3)]))
    e2 = float(ew.total_energy(x + shift))
    np.testing.assert_allclose(e1, e2, rtol=1e-8)


def test_alpha_independence_with_electrons():
    cell = h2_cell()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(6) * 3.1)
    e1 = float(EwaldSum.build(cell, alpha=3.0).total_energy(x))
    e2 = float(EwaldSum.build(cell, alpha=6.0).total_energy(x))
    np.testing.assert_allclose(e1, e2, rtol=1e-8)


def test_isolated_limit():
    """In a huge box the H2 ion-ion energy approaches 1/r + background terms.

    Background/self corrections scale as 1/L so use a loose tolerance.
    """
    L = 60.0
    d = 1.4
    cell = Cell.from_atoms(
        [Atom("H", (0, 0, 0)), Atom("H", (d, 0, 0))], np.eye(3) * L, spin=0
    )
    ew = EwaldSum.build(cell)
    # remove the leading background terms: for 2 unit charges,
    # madelung = 1/d + 2*xi_cube/L + O(1/L^3), xi_cube ~ -1.41865
    assert abs(ew.madelung - 1.0 / d) < 0.1


def test_pair_madelung_exact():
    """Generic (off-symmetry) pair vs a brute-force Ewald sum.

    Regression: the build-time ion-ion real-space distances must be
    computed host-side in float64 — routing them through the JAX
    MinimalImage runs a bf16 matmul on TPU backends and biases the
    nuclear-repulsion CONSTANT of every run by O(1e-3) Ha.
    """
    import itertools

    from scipy.special import erfc

    R, L, a = 1.4, 15.0, 0.7
    coords = np.array([[0.0, 0.0, 0.0], [R, 0.0, 0.0]])
    ts = np.array(
        list(itertools.product(range(-6, 7), repeat=3)), np.float64
    ) * L
    exact = 0.0
    for i in range(2):
        for j in range(2):
            r = np.linalg.norm(coords[i] - coords[j] + ts, axis=1)
            if i == j:
                r = r[r > 1e-9]
                exact += 0.5 * np.sum(erfc(a * r) / r)
            elif i < j:
                exact += np.sum(erfc(a * r) / r)
    gn = np.array(
        [m for m in itertools.product(range(-12, 13), repeat=3)
         if m != (0, 0, 0)],
        np.float64,
    )
    g = gn * 2 * np.pi / L
    g2 = np.sum(g * g, -1)
    sf = np.abs(np.exp(1j * g @ coords.T) @ np.ones(2)) ** 2
    exact += 0.5 * np.sum(4 * np.pi * np.exp(-g2 / (4 * a * a))
                          / (L**3 * g2) * sf)
    exact += -a / np.sqrt(np.pi) * 2 - np.pi / (2 * L**3 * a * a) * 4

    cell = Cell(
        lattice=np.eye(3) * L,
        atom_coords=coords,
        atom_charges=np.array([1.0, 1.0]),
        atom_symbols=("H", "H"),
        spin=0,
    )
    got = EwaldSum.build(cell).madelung
    np.testing.assert_allclose(got, exact, atol=1e-7)
