"""Multi-device DP equivalence oracle: N-device shard_map == 1 device.

With MCMC replaced by a no-op (fixed walkers), the full KFAC training
step is a deterministic function of (params, data): the loss, the
gradient, the curvature-factor update and the preconditioned parameter
update must all agree between a single device and any mesh shape, up to
floating-point summation order. This is the DP contract the reference
implements with pmap + pmean (DeepSolid/train.py:78-80,
DeepSolid/utils/kfac_ferminet_alpha/optimizer.py:423) and the one
property a finiteness-only dryrun cannot certify: a wrong psum/pmean
would produce perfectly finite — and wrong — physics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.optim import kfac as kfac_lib
from deepsolid_tpu.parallel import DATA_AXIS, DERIV_AXIS, all_mean
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.scf.free_electron import free_electron_klist
from deepsolid_tpu.train.loss import make_loss

from fixtures import lih_supercell

BATCH = 16


def _setup():
    sc = lih_supercell()  # 4 electrons -> 12 tangent columns
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((16, 4), (16, 4)), determinants=2),
    )
    key = jax.random.PRNGKey(3)
    params = net.init(key)
    # host copy: the KFAC train step donates its data buffer, and
    # device_put on the 1-device mesh would alias (then delete) a
    # device-resident original
    data = np.asarray(init_electrons(key, sc, sc.nelec, batch_size=BATCH))
    return sc, net, params, data


def _meshes():
    devs = np.asarray(jax.devices())
    return [
        (Mesh(devs[:1], (DATA_AXIS,)), None),
        (Mesh(devs[:8], (DATA_AXIS,)), None),
        (Mesh(devs[:8].reshape(4, 2), (DATA_AXIS, DERIV_AXIS)), DERIV_AXIS),
    ]


def _loss_fn(net, sc, deriv_axis):
    return make_loss(
        net.logdet, net.batch_logdet, sc, mode="forward",
        network_obj=net, deriv_axis=deriv_axis,
    )


def test_loss_and_grad_match_across_meshes():
    """pmean'd loss/grad on a (4x2) mesh == single device.

    The pure-DP (8,) mesh is covered by the full-KFAC-step oracle below
    (which subsumes loss+grad); compiling a third loss-only program for
    it bought no extra contract coverage on the 1-core suite box."""
    sc, net, params, data = _setup()

    results = []
    for mesh, deriv_axis in (_meshes()[0], _meshes()[2]):
        total_energy = _loss_fn(net, sc, deriv_axis)
        val_and_grad = jax.value_and_grad(
            total_energy, argnums=0, has_aux=True
        )

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)), out_specs=(P(), P()),
            check_vma=False,
        )
        def run(params, data):
            (loss, _), grad = val_and_grad(params, data)
            return loss, all_mean(grad)

        p = jax.device_put(params, NamedSharding(mesh, P()))
        d = jax.device_put(data, NamedSharding(mesh, P(DATA_AXIS)))
        loss, grad = jax.device_get(run(p, d))
        results.append((float(loss), grad))

    loss_1, grad_1 = results[0]
    for (loss_n, grad_n), label in zip(results[1:], ("4x2",)):
        np.testing.assert_allclose(
            loss_n, loss_1, rtol=1e-12, err_msg=f"loss mismatch on {label}"
        )
        flat_1 = jax.tree_util.tree_leaves(grad_1)
        flat_n = jax.tree_util.tree_leaves(grad_n)
        for a, b in zip(flat_1, flat_n):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-12,
                err_msg=f"grad mismatch on {label}",
            )


def test_full_kfac_step_matches_across_meshes():
    """One complete KFAC train step (curvature EMA + inverses + update +
    norm constraint) yields identical parameters on every mesh shape."""
    sc, net, params, data = _setup()

    outs = []
    for mesh, deriv_axis in _meshes():
        total_energy = _loss_fn(net, sc, deriv_axis)
        val_and_grad = jax.value_and_grad(
            total_energy, argnums=0, has_aux=True
        )
        opt = kfac_lib.KfacOptimizer(
            network=net,
            learning_rate_schedule=lambda t: 1e-2,
            damping=1e-3,
        )
        p = jax.device_put(params, NamedSharding(mesh, P()))
        d = jax.device_put(data, NamedSharding(mesh, P(DATA_AXIS)))
        state = opt.init(p, d, mesh)
        noop_mcmc = lambda p_, d_, k_, w_: (d_, jnp.zeros(()))
        step = opt.make_train_step(
            mesh, noop_mcmc, val_and_grad, loss_fn=total_energy
        )
        new_params, _, new_state, _, stats = step(
            p, d, state, jax.random.PRNGKey(7), jnp.asarray(0.1)
        )
        outs.append(
            (
                jax.device_get(new_params),
                float(stats[0]),
                float(jax.device_get(new_state["damping"])),
            )
        )

    params_1, loss_1, damping_1 = outs[0]
    for (params_n, loss_n, damping_n), label in zip(
        outs[1:], ("8x1", "4x2")
    ):
        np.testing.assert_allclose(loss_n, loss_1, rtol=1e-12)
        np.testing.assert_allclose(damping_n, damping_1, rtol=1e-12)
        flat_1, treedef_1 = jax.tree_util.tree_flatten(params_1)
        flat_n, treedef_n = jax.tree_util.tree_flatten(params_n)
        assert treedef_1 == treedef_n
        for a, b in zip(flat_1, flat_n):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-11,
                err_msg=f"updated params mismatch on {label}",
            )
