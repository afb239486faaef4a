"""Physics invariance tests of the periodic ansatz.

These are the canonical correctness oracles (reference
test/test_network.py:65-122): primitive-lattice translation phase,
supercell twist phase, and antisymmetry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.scf.free_electron import free_electron_klist, twisted_kpts

from fixtures import lih_supercell


def build(full_det=False, distance_type="nu", twist=(0.0, 0.0, 0.0), S=None,
          determinants=4):
    sc = lih_supercell(S)
    klist = free_electron_klist(sc, twist=twist)
    net = make_network(
        sc,
        klist,
        NetworkConfig(
            hidden_dims=((32, 8), (32, 8)),
            determinants=determinants,
            envelope_type="isotropic",
            full_det=full_det,
            distance_type=distance_type,
        ),
    )
    key = jax.random.PRNGKey(42)
    params = net.init(key)
    x = init_electrons(key, sc, sc.nelec, batch_size=1)[0]
    return sc, net, params, x, klist


@pytest.mark.parametrize("full_det", [False, True])
@pytest.mark.parametrize("distance_type", ["nu", "tri"])
def test_periodic_bc(full_det, distance_type):
    sc, net, params, x, klist = build(full_det, distance_type)
    kp = sum(np.sum(k, axis=0) for k in klist)
    trans = sc.prim.lattice[2]
    x2 = x + jnp.tile(jnp.asarray(trans), sc.nelectron)
    p1, s1 = net.phase_and_slogdet(params, x)
    p2, s2 = net.phase_and_slogdet(params, x2)
    assert jnp.allclose(s1, s2), (s1, s2)
    assert jnp.allclose(p1 * jnp.exp(1j * jnp.dot(jnp.asarray(kp), trans)), p2)


@pytest.mark.parametrize("scaled_twist", [0.0, 0.25])
def test_twisted_bc(scaled_twist):
    twist = (scaled_twist,) * 3
    sc, net, params, x, klist = build(twist=twist)
    # translate ONE electron by a supercell lattice vector
    trans = jnp.concatenate(
        [jnp.asarray(sc.lattice[1])[None], jnp.zeros((sc.nelectron - 1, 3))]
    ).ravel()
    p1, s1 = net.phase_and_slogdet(params, x)
    p2, s2 = net.phase_and_slogdet(params, x + trans)
    assert jnp.allclose(s1, s2)
    assert jnp.allclose(p2 / p1, jnp.exp(1j * scaled_twist * 2 * jnp.pi))


@pytest.mark.parametrize("full_det", [False, True])
def test_anti_symmetry(full_det):
    sc, net, params, x, _ = build(full_det)
    # swap two same-spin (up) electrons
    x2 = jnp.concatenate([x[3:6], x[:3], x[6:]])
    p1, s1 = net.phase_and_slogdet(params, x)
    p2, s2 = net.phase_and_slogdet(params, x2)
    assert jnp.allclose(s1, s2)
    assert jnp.allclose(p1, -p2)


def test_supercell_periodic_bc_2x1x1():
    """Translating all electrons by a *supercell* vector is also a symmetry."""
    S = np.diag([2, 1, 1])
    sc, net, params, x, klist = build(S=S)
    kp = sum(np.sum(k, axis=0) for k in klist)
    trans = sc.lattice[0]
    x2 = x + jnp.tile(jnp.asarray(trans), sc.nelectron)
    p1, s1 = net.phase_and_slogdet(params, x)
    p2, s2 = net.phase_and_slogdet(params, x2)
    assert jnp.allclose(s1, s2)
    assert jnp.allclose(p1 * jnp.exp(1j * jnp.dot(jnp.asarray(kp), trans)), p2)


def test_heads_consistent():
    sc, net, params, x, _ = build()
    logpsi = net.logdet(params, x)
    slog = net.slogdet(params, x)
    phase, slog2 = net.phase_and_slogdet(params, x)
    assert jnp.allclose(logpsi.real, slog)
    assert jnp.allclose(slog, slog2)
    assert jnp.allclose(jnp.abs(phase), 1.0)
    mats = net.orbitals(params, x)
    assert mats[0].shape == (4, 2, 2)  # (ndet, n_up, n_up), LiH has (2,2)


def test_batching_consistency():
    sc, net, params, x, _ = build()
    key = jax.random.PRNGKey(7)
    xb = init_electrons(key, sc, sc.nelec, batch_size=3)
    batched = net.batch_slogdet(params, xb)
    single = jnp.stack([net.slogdet(params, xb[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-10)


def test_taps_and_eps_hooks():
    sc, net, params, x, _ = build()
    out, taps = net.logdet_with_taps(params, x)
    reg = net.layer_registry(params)
    assert set(taps) == set(reg)
    # zero eps is a no-op
    eps = {name: jnp.zeros(taps[name].shape[:-1] + (params[reg[name]["path"][0]][reg[name]["path"][1]]["w"].shape[-1],)) for name in reg}
    out2, _ = net.logdet_with_taps(params, x, eps=eps)
    assert jnp.allclose(out, out2)


def test_free_electron_klist_counts():
    sc = lih_supercell(np.diag([2, 1, 1]))
    kup, kdn = free_electron_klist(sc)
    assert kup.shape == (sc.nelec[0], 3)
    assert kdn.shape == (sc.nelec[1], 3)
    # uniform filling for the insulator: each k-point hosts nelec/scale bands
    kpts = twisted_kpts(sc)
    for k in kpts:
        assert np.sum(np.all(np.isclose(kup, k), axis=1)) == sc.nelec[0] // sc.scale
