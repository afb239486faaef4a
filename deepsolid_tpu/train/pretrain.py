"""Pretraining the ansatz orbitals against an orbital source.

Reference semantics: DeepSolid/pretrain.py:43-302 — match the network's
orbital matrices to target orbitals with Adam, interleaved with MCMC.

TPU-native differences:
  * Targets evaluate ON DEVICE inside the jitted step (the orbital source
    is JAX-pure), eliminating the reference's per-iteration host->PySCF
    round-trip (pretrain.py:152-154).
  * The step runs under shard_map over the data mesh axis.
  * method 'net' samples from the network, 'hf' from the target
    determinant — both fully jitted.
"""

from __future__ import annotations

import functools
import logging
from typing import List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from deepsolid_tpu.parallel import DATA_AXIS, all_mean, pmean_if_axis
from deepsolid_tpu.sampling import mcmc as mcmc_lib
from deepsolid_tpu.scf.interface import PlaneWaveOrbitals


def make_orbital_source(cfg, sc):
    """Pick the pretraining orbital source.

    Native GTO Hartree-Fock (scf/hf.py) when a basis is configured;
    plane waves when basis is empty or explicitly 'planewave'. An
    unsupported basis/element combination is a HARD error — a requested
    basis must never silently degrade pretraining quality (round-1
    advisory). Genuine SCF bugs propagate unmasked.
    """
    basis = cfg.system.get("basis")
    if basis and basis.lower() not in ("planewave", "plane-wave", "pw"):
        from deepsolid_tpu.scf import hf as hf_lib

        try:
            return hf_lib.ScfOrbitals.build(
                sc, basis=basis, twist=tuple(cfg.network.twist),
                level=cfg.pretrain.get("scf", "core"),
            )
        except NotImplementedError as e:
            raise NotImplementedError(
                f"Requested basis {basis!r} is not supported by the native "
                f"SCF ({e}). Set cfg.system.basis='planewave' to opt into "
                "plane-wave pretraining targets instead."
            ) from e
    return PlaneWaveOrbitals(
        sc, twist=tuple(cfg.network.twist), policy=cfg.system.klist_policy
    )


def _block_diag_targets(target: List[jnp.ndarray]) -> jnp.ndarray:
    """Embed per-spin target matrices block-diagonally (full_det case),
    reference: pretrain.py:79-89."""
    batch = target[0].shape[0]
    na, nb = target[0].shape[1], target[1].shape[1]
    dtype = target[0].dtype
    top = jnp.concatenate(
        [target[0], jnp.zeros((batch, na, nb), dtype)], axis=-1
    )
    bot = jnp.concatenate(
        [jnp.zeros((batch, nb, na), dtype), target[1]], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def pretrain(cfg, sc, net, params, data, key, mesh, source=None):
    """Runs cfg.pretrain.iterations of orbital matching. Returns params, data."""
    source = source if source is not None else make_orbital_source(cfg, sc)
    full_det = cfg.network.detnet.full_det
    optimizer = optax.adam(cfg.pretrain.lr)
    opt_state = optimizer.init(jax.device_get(params))

    method = cfg.pretrain.method
    latvec = jnp.asarray(sc.lattice)

    from deepsolid_tpu.train.loss import chunk_batch_fn

    psi_chunk = int(cfg.optim.get("psi_chunk", 0))

    if method == "net":
        sample_network = chunk_batch_fn(net.batch_slogdet, psi_chunk)
    elif method == "hf":
        sample_network = chunk_batch_fn(
            lambda p, x: source.slogdet(x), psi_chunk  # noqa: E731
        )
    else:
        raise ValueError(f"Unknown pretrain method: {method}")

    def loss_per_walker(p, x):
        predict = net.batch_orbitals(p, x)
        target = source.orbital_mats(x)
        if full_det and len(target) == 2:
            target = [_block_diag_targets(target)]
        losses = [
            jnp.mean(
                jnp.abs(t[:, None, ...] - pr) ** 2,
                axis=tuple(range(1, pr.ndim)),
            )
            for t, pr in zip(target, predict)
        ]
        return sum(losses) / len(losses)

    # same chunked-remat transform (and same must-divide contract) as the
    # train step's psi-paths; bounds the orbital-matching grad memory
    # (unchunked it needs 21.8G at batch 4096 x 96e)
    chunked_loss = chunk_batch_fn(loss_per_walker, psi_chunk)

    def loss_fn(p, x):
        return pmean_if_axis(jnp.mean(chunked_loss(p, x)), DATA_AXIS)

    nsteps = max(1, int(cfg.pretrain.steps))

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P(DATA_AXIS), P(), P(), P()),
        check_vma=False,
    )
    def pretrain_step(params, data, opt_state, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        loss_val, grad = jax.value_and_grad(loss_fn)(params, data)
        grad = all_mean(grad)
        updates, opt_state = optimizer.update(grad, opt_state, params)
        params = optax.apply_updates(params, updates)

        logprob = 2.0 * sample_network(params, data)
        num_accepts = jnp.zeros((), data.dtype)
        for _ in range(nsteps):
            key, sub = jax.random.split(key)
            data, _, logprob, num_accepts = mcmc_lib.mh_update(
                params,
                sample_network,
                data,
                sub,
                logprob,
                num_accepts,
                latvec,
                stddev=jnp.asarray(0.02, data.dtype),
            )
        pmove = pmean_if_axis(
            num_accepts / (nsteps * data.shape[0]), DATA_AXIS
        )
        return params, data, opt_state, loss_val, pmove

    for t in range(cfg.pretrain.iterations):
        key, subkey = jax.random.split(key)
        params, data, opt_state, loss_val, pmove = pretrain_step(
            params, data, opt_state, subkey
        )
        if t % 100 == 0 or t == cfg.pretrain.iterations - 1:
            logging.info(
                "Pretrain iter %05d: loss=%.6f pmove=%.2f",
                t, float(loss_val), float(pmove),
            )
    return params, data
