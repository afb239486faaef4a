"""Checkpoint elasticity and metric writers."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.utils import checkpoint as ckpt_lib
from deepsolid_tpu.utils.writers import Writer


def test_checkpoint_roundtrip_and_discovery():
    with tempfile.TemporaryDirectory() as tmpdir:
        params = {"single": [{"w": np.ones((3, 2)), "b": np.zeros(2)}]}
        data = np.random.RandomState(0).rand(16, 6)
        path = ckpt_lib.save(tmpdir, 7, data, params, {"step": 3}, 0.05)
        assert "qmcjax_ckpt_000007" in path
        # corrupt file is skipped during discovery
        with open(os.path.join(tmpdir, "qmcjax_ckpt_000009.npz"), "wb") as f:
            f.write(b"not a checkpoint")
        found = ckpt_lib.find_last_checkpoint(tmpdir)
        assert found.endswith("qmcjax_ckpt_000007.npz")
        t, data2, params2, opt2, width2 = ckpt_lib.restore(found, 16)
        assert t == 8
        np.testing.assert_allclose(data2, data)
        np.testing.assert_allclose(params2["single"][0]["w"], 1.0)
        assert opt2 == {"step": 3}
        assert width2 == 0.05


def test_checkpoint_elastic_restore_device_count():
    """A checkpoint written on one mesh restores onto a different one.

    (The reference errors on device-count change, checkpoint.py:157-160.)
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    with tempfile.TemporaryDirectory() as tmpdir:
        devices = np.asarray(jax.devices())
        mesh8 = Mesh(devices, ("data",))
        data = jax.device_put(
            jnp.arange(16 * 6, dtype=jnp.float64).reshape(16, 6),
            NamedSharding(mesh8, P("data")),
        )
        path = ckpt_lib.save(tmpdir, 0, np.asarray(data), {}, None, 0.02)
        t, data2, *_ = ckpt_lib.restore(path, 16)
        mesh4 = Mesh(devices[:4], ("data",))
        resharded = jax.device_put(
            jnp.asarray(data2), NamedSharding(mesh4, P("data"))
        )
        np.testing.assert_allclose(np.asarray(resharded), np.asarray(data))

        # elastic batch resize: growing tiles the walker axis with JITTERED
        # copies (no exactly-duplicated walkers, sigma=0.3*mcmc_width here),
        # shrinking truncates
        t, grown, *_ = ckpt_lib.restore(path, 32)
        assert grown.shape == (32, 6)
        dev = np.abs(np.asarray(grown[16:]) - np.asarray(grown[:16]))
        assert dev.max() > 0.0, "tiled copies must be jittered, not exact"
        assert dev.max() < 0.1, "jitter should stay at proposal-width scale"
        t, shrunk, *_ = ckpt_lib.restore(path, 8)
        assert shrunk.shape == (8, 6)
        np.testing.assert_allclose(shrunk, np.asarray(data)[:8])


def test_kfac_opt_state_checkpoint_roundtrip():
    """The KFAC opt_state (nested dict of curvature factors) survives a
    save/restore cycle bit-for-bit and remains usable afterwards."""
    from test_kfac import small_setup

    sc, net, params, data, opt = small_setup(batch=4)
    state = opt.init(params, data)
    state = opt.update_curvature(state, params, data)  # nonzero factors
    state = opt.refresh_inverses(state, 1e-3)

    with tempfile.TemporaryDirectory() as tmpdir:
        path = ckpt_lib.save(
            tmpdir, 3, np.asarray(data), jax.device_get(params),
            jax.device_get(state), 0.05,
        )
        t, _, _, state2, width2 = ckpt_lib.restore(path, 4)
    assert t == 4 and width2 == 0.05

    flat, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
    flat2, treedef2 = jax.tree_util.tree_flatten(state2)
    assert treedef == treedef2
    for a, b in zip(flat, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state is usable: inverses refresh to finite factors
    state3 = opt.refresh_inverses(
        jax.tree_util.tree_map(jnp.asarray, state2), 1e-3
    )
    for leaf in jax.tree_util.tree_leaves(state3):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_csv_writer_append_semantics():
    with tempfile.TemporaryDirectory() as tmpdir:
        with Writer("stats", ["a", "b"], directory=tmpdir) as w:
            w.write(0, a=1.0, b=2.0)
        with Writer("stats", ["a", "b"], directory=tmpdir) as w:
            w.write(1, a=3.0, b=4.0)
        lines = open(os.path.join(tmpdir, "stats.csv")).read().strip().split("\n")
        assert lines[0] == "step,a,b" or lines[0].startswith("t,") or "a,b" in lines[0]
        assert len(lines) == 3  # one header, two rows


def test_h5writer_optional():
    h5py = pytest.importorskip("h5py")
    from deepsolid_tpu.utils.writers import H5Writer

    with tempfile.TemporaryDirectory() as tmpdir:
        with H5Writer("x.h5", {"e": (3,)}, directory=tmpdir) as w:
            w.write(0, {"e": np.ones(3)})
            w.write(1, {"e": 2 * np.ones(3)})
        with h5py.File(os.path.join(tmpdir, "x.h5")) as f:
            np.testing.assert_allclose(f["e"][1], 2.0)


@pytest.mark.slow  # heavyweight oracle; lighter default-suite coverage exists
def test_use_last_layer_network_and_fwdlap():
    from deepsolid_tpu.models.fwdlap_forward import make_kinetic_forward
    from deepsolid_tpu.models.network import NetworkConfig, make_network
    from deepsolid_tpu.ops.laplacian import make_kinetic
    from deepsolid_tpu.sampling.init import init_electrons
    from deepsolid_tpu.scf.free_electron import free_electron_klist

    from fixtures import lih_supercell

    sc = lih_supercell()
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((8, 4), (8, 4)), determinants=2,
                      use_last_layer=True),
    )
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    assert len(params["double"]) == len(params["single"])
    x = init_electrons(key, sc, sc.nelec, batch_size=1)[0]
    got = complex(make_kinetic_forward(net)(params, x))
    want = complex(make_kinetic(net.logdet, mode="hessian")(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-7)
