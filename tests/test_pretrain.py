"""Pretraining tests with the native plane-wave orbital source."""

import tempfile

import jax
import numpy as np
import pytest

from deepsolid_tpu.scf.interface import PlaneWaveOrbitals

from fixtures import h2_supercell, lih_supercell


def test_plane_wave_orbitals_shapes_and_bloch():
    sc = lih_supercell()
    src = PlaneWaveOrbitals(sc)
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(3, sc.nelectron * 3))
    mats = src.orbital_mats(x)
    assert len(mats) == 2
    assert mats[0].shape == (3, 2, 2)
    # Bloch property: translating all electrons by a supercell lattice
    # vector multiplies each column by e^{i q . L} with |factor| = 1
    L = jnp.tile(jnp.asarray(sc.lattice[0]), sc.nelectron)
    mats2 = src.orbital_mats(x + L)
    ratio = np.asarray(mats2[0] / mats[0])
    np.testing.assert_allclose(np.abs(ratio), 1.0, rtol=1e-9)
    # slogdet finite
    sl = src.slogdet(x)
    assert np.all(np.isfinite(np.asarray(sl)))


@pytest.mark.parametrize("method", ["net", "hf"])
def test_pretrain_reduces_loss(method):
    from deepsolid_tpu.train import pretrain as pretrain_lib
    from deepsolid_tpu.train.process import build_network
    from deepsolid_tpu.parallel import local_mesh
    from deepsolid_tpu.sampling.init import init_electrons
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir)
        cfg.pretrain.method = method
        cfg.pretrain.iterations = 40
        cfg.pretrain.lr = 3e-3
        sc = cfg.system.cell
        net = build_network(cfg, sc)
        mesh = local_mesh()
        key = jax.random.PRNGKey(0)
        params = net.init(key)
        from deepsolid_tpu.parallel import replicate, shard_leading

        params = replicate(mesh, params)
        data = shard_leading(
            mesh, init_electrons(key, sc, sc.nelec, cfg.batch_size)
        )

        src = pretrain_lib.make_orbital_source(cfg, sc)

        def loss_of(p, x):
            import jax.numpy as jnp

            predict = net.batch_orbitals(p, x)
            target = src.orbital_mats(x)
            return float(
                sum(
                    jnp.mean(jnp.abs(t[:, None] - pr) ** 2)
                    for t, pr in zip(target, predict)
                )
            )

        before = loss_of(params, data)
        params2, data2 = pretrain_lib.pretrain(
            cfg, sc, net, params, data, key, mesh
        )
        after = loss_of(params2, data2)
        assert after < before, (before, after)


def test_driver_with_pretrain():
    from deepsolid_tpu.train import process
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir, "adam", iterations=2)
        cfg.pretrain.method = "net"
        cfg.pretrain.iterations = 5
        cfg.system.basis = ""  # force the plane-wave source
        params, data, energy = process.process(cfg)
        assert np.isfinite(energy)


@pytest.mark.parametrize("bad", [False, True])
def test_pretrain_psi_chunk_matches_unchunked(bad):
    """psi_chunk'd pretraining follows the same chunk_batch_fn contract as
    the train step: equal chunks reproduce the unchunked update (mean of
    per-walker losses is chunking-invariant), and a non-dividing chunk
    fails loudly instead of silently falling back to whole-batch."""
    from deepsolid_tpu.parallel import local_mesh, replicate, shard_leading
    from deepsolid_tpu.sampling.init import init_electrons
    from deepsolid_tpu.train import pretrain as pretrain_lib
    from deepsolid_tpu.train.process import build_network
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir)
        cfg.pretrain.method = "net"
        cfg.pretrain.iterations = 5
        sc = cfg.system.cell
        net = build_network(cfg, sc)
        mesh = local_mesh()
        key = jax.random.PRNGKey(0)

        def fresh():
            # pretrain_step donates params/data: rebuild per call
            params = replicate(mesh, net.init(key))
            data = shard_leading(
                mesh, init_electrons(key, sc, sc.nelec, cfg.batch_size)
            )
            return params, data

        if bad:
            cfg.optim.psi_chunk = 7  # does not divide the per-device batch
            params, data = fresh()
            with pytest.raises(ValueError, match="must divide"):
                pretrain_lib.pretrain(cfg, sc, net, params, data, key, mesh)
            return
        params, data = fresh()
        p_ref, _ = pretrain_lib.pretrain(cfg, sc, net, params, data, key, mesh)
        cfg.optim.psi_chunk = 4
        params, data = fresh()
        p_chunk, _ = pretrain_lib.pretrain(
            cfg, sc, net, params, data, key, mesh
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref),
            jax.tree_util.tree_leaves(p_chunk),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-10)
