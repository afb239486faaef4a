"""Kinetic-energy engine tests: analytic oracle + cross-mode agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.ops.laplacian import make_kinetic

from fixtures import lih_supercell

MODES = ["for", "vmap", "partition", "hessian"]


def analytic_case():
    """f(params, x) = x A x + i x B x + c sum(sin x): known grad/laplacian."""
    n = 6
    rng = np.random.RandomState(0)
    A = rng.randn(n, n)
    A = (A + A.T) / 2
    B = rng.randn(n, n)
    B = (B + B.T) / 2
    c = 0.7

    def f(params, x):
        del params
        return (
            x @ jnp.asarray(A) @ x
            + c * jnp.sum(jnp.sin(x))
            + 1j * (x @ jnp.asarray(B) @ x)
        )

    def exact_kinetic(x):
        gu = 2 * A @ x + c * np.cos(x)
        gv = 2 * B @ x
        lap_u = 2 * np.trace(A) - c * np.sum(np.sin(x))
        lap_v = 2 * np.trace(B)
        re = lap_u + gu @ gu - gv @ gv
        im = lap_v + 2 * gu @ gv
        return -0.5 * (re + 1j * im)

    return f, exact_kinetic, n


@pytest.mark.parametrize("mode", MODES)
def test_analytic_laplacian(mode):
    f, exact, n = analytic_case()
    kin = make_kinetic(f, mode=mode, partition_number=3)
    x = jnp.asarray(np.random.RandomState(1).randn(n))
    got = kin(None, x)
    want = exact(np.asarray(x))
    np.testing.assert_allclose(complex(got), want, rtol=1e-10)


@pytest.mark.slow
def test_modes_agree_on_network():
    from deepsolid_tpu.models.network import NetworkConfig, make_network
    from deepsolid_tpu.sampling.init import init_electrons
    from deepsolid_tpu.scf.free_electron import free_electron_klist

    sc = lih_supercell()
    klist = free_electron_klist(sc)
    net = make_network(
        sc, klist, NetworkConfig(hidden_dims=((16, 4), (16, 4)), determinants=2)
    )
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    x = init_electrons(key, sc, sc.nelec, batch_size=1)[0]

    results = {}
    for mode in MODES:
        kin = make_kinetic(net.logdet, mode=mode, partition_number=4)
        results[mode] = complex(kin(params, x))
    base = results["hessian"]
    for mode, val in results.items():
        np.testing.assert_allclose(val, base, rtol=1e-8, err_msg=mode)


def test_local_energy_finite():
    from deepsolid_tpu.hamiltonian import make_local_energy
    from deepsolid_tpu.models.network import NetworkConfig, make_network
    from deepsolid_tpu.sampling.init import init_electrons
    from deepsolid_tpu.scf.free_electron import free_electron_klist

    from fixtures import h2_supercell

    sc = h2_supercell()
    klist = free_electron_klist(sc)
    net = make_network(
        sc, klist, NetworkConfig(hidden_dims=((16, 4), (16, 4)), determinants=2)
    )
    key = jax.random.PRNGKey(3)
    params = net.init(key)
    xb = init_electrons(key, sc, sc.nelec, batch_size=4)
    el = make_local_energy(net.logdet, sc, mode="partition", partition_number=2)
    ke, ew = jax.vmap(el, in_axes=(None, 0))(params, xb)
    assert ke.shape == (4,) and ew.shape == (4,)
    assert np.all(np.isfinite(np.asarray(ke)))
    assert np.all(np.isfinite(np.asarray(ew)))
