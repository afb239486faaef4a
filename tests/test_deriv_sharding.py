"""Tangent-axis (Laplacian-column) mesh sharding of the forward engine.

The TPU analog of sequence/context parallelism for VMC (SURVEY.md §5):
the 3N jet tangent columns shard over a 'deriv' mesh axis, with psum'd
cross-tangent contractions. The sharded kinetic energy must equal the
single-device value exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.scf.free_electron import free_electron_klist

from fixtures import lih_supercell


def test_deriv_sharded_kinetic_matches():
    sc = lih_supercell()  # 4 electrons -> 12 tangents
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((16, 4), (16, 4)), determinants=2),
    )
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    x = init_electrons(key, sc, sc.nelec, batch_size=1)[0]

    want = complex(make_kinetic_forward(net)(params, x))

    # one mesh size: the 4-device split already exercises uneven
    # slab/shard interactions (12 tangents / 4 devices); a second mesh
    # costs a full extra XLA compile on the 1-core suite box for no new
    # contract coverage
    for n_dev in (4,):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("deriv",))
        kin = make_kinetic_forward(net, deriv_axis="deriv")

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(), P()),
            out_specs=P(), check_vma=False,
        )
        def sharded(params, x):
            ke = kin(params, x)
            return jnp.stack([ke.real, ke.imag])

        got = np.asarray(sharded(params, x))
        np.testing.assert_allclose(
            complex(got[0] + 1j * got[1]), want, rtol=1e-9,
            err_msg=f"n_dev={n_dev}",
        )


@pytest.mark.slow  # heavyweight oracle; the e2e 2-D-mesh driver test and the 1-D deriv equality stay in the default suite
def test_deriv_and_data_axes_compose():
    """2-D mesh ('data', 'deriv'): batched kinetic over both axes."""
    sc = lih_supercell()
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((8, 4),), determinants=1),
    )
    key = jax.random.PRNGKey(1)
    params = net.init(key)
    data = init_electrons(key, sc, sc.nelec, batch_size=4)

    want = np.asarray(
        jax.vmap(
            lambda x: make_kinetic_forward(net)(params, x).real,
            in_axes=0,
        )(data)
    )

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "deriv")
    )
    kin = make_kinetic_forward(net, deriv_axis="deriv")

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    def sharded(params, d):
        return jax.vmap(lambda x: kin(params, x).real)(d)

    got = np.asarray(sharded(params, data))
    np.testing.assert_allclose(got, want, rtol=1e-9)
