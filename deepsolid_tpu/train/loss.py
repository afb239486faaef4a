"""VMC energy loss with the custom-JVP gradient estimator.

E[psi] = <Re E_L>; the gradient is the covariance estimator
  dE = 2 Re < (E_L - E)* d log psi >
implemented as a custom JVP with complex local-energy clipping
(reference semantics: DeepSolid/train.py:28-144). Statistics are pmean'd
over the data mesh axis so the same code runs single-chip or sharded.
"""

from __future__ import annotations

from typing import Any, Callable

import chex
import jax
import jax.numpy as jnp

from deepsolid_tpu.hamiltonian import make_local_energy
from deepsolid_tpu.parallel import DATA_AXIS, pmean_if_axis


def chunk_batch_fn(fn: Callable, chunk: int, what: str = "psi") -> Callable:
    """Wrap a batched `(params, data) -> pytree-with-leading-batch-axis`
    function in a lax.map over walker chunks, bounding its peak activation
    memory to one chunk. The inner chunk call is jax.checkpoint'ed:
    without remat, reverse-mode through the scan stacks every chunk's
    forward residuals and peak memory is full-batch again (measured:
    36.8G at batch 4096 x 96e — the scan transpose saves (n_chunks,
    chunk, ...) activation stacks). With remat the backward recomputes
    each chunk's forward from its (small) walker inputs, so the FULL
    train step (psi-gradient vjp, KFAC curvature capture, MCMC log-psi
    sweeps) runs at the reference's production batch 4096 x 96e on a
    single 16G chip."""
    if not chunk or chunk <= 0:
        return fn

    inner = jax.checkpoint(fn)

    def wrapped(params, data):
        n = data.shape[0]
        if n <= chunk:
            return fn(params, data)
        if n % chunk != 0:
            raise ValueError(
                f"{what}_chunk={chunk} must divide the per-device walker "
                f"batch ({n}); a silent whole-batch fallback would OOM "
                "exactly the runs that need chunking"
            )
        chunks = data.reshape(n // chunk, chunk, data.shape[-1])
        out = jax.lax.map(lambda d: inner(params, d), chunks)
        return jax.tree_util.tree_map(
            lambda o: o.reshape((n,) + o.shape[2:]), out
        )

    return wrapped


@chex.dataclass
class AuxiliaryLossData:
    variance: Any
    local_energy: Any
    imaginary: Any
    kinetic: Any
    ewald: Any
    finite: Any  # per-walker mask: local energy was finite


def clip_local_energy_diff(diff, clip_width: float, clip_type: str):
    """Clip (E_L - E) either in Cartesian re/im or polar style
    (train.py:102-127 semantics)."""
    if clip_width <= 0.0:
        return diff
    if clip_type == "real":
        tv_re = pmean_if_axis(jnp.mean(jnp.abs(diff.real)), DATA_AXIS)
        tv_im = pmean_if_axis(jnp.mean(jnp.abs(diff.imag)), DATA_AXIS)
        re = jnp.clip(diff.real, -clip_width * tv_re, clip_width * tv_re)
        im = jnp.clip(diff.imag, -clip_width * tv_im, clip_width * tv_im)
        return re + 1j * im
    if clip_type == "complex":
        radius, phase = jnp.abs(diff), jnp.angle(diff)
        radius_tv = pmean_if_axis(radius.std(), DATA_AXIS)
        radius_mean = pmean_if_axis(jnp.median(radius), DATA_AXIS)
        clip_radius = jnp.clip(
            radius,
            radius_mean - radius_tv * clip_width,
            radius_mean + radius_tv * clip_width,
        )
        return clip_radius * jnp.exp(1j * phase)
    raise ValueError(f"Unknown clip type: {clip_type}")


def make_loss(
    network: Callable,
    batch_network: Callable,
    supercell,
    clip_local_energy: float = 5.0,
    clip_type: str = "real",
    mode: str = "partition",
    partition_number: int = 3,
    network_obj=None,
    el_chunk: int = 0,
    psi_chunk: int = 0,
    deriv_axis=None,
) -> Callable:
    """total_energy(params, data) -> (loss, AuxiliaryLossData), custom JVP.

    `network(params, x)` returns complex log psi for a single walker;
    `batch_network` its batched version. `network_obj` enables the
    forward-Laplacian kinetic engine (mode='forward'). The reference's
    KFAC loss registration (train.py:133) has no analog here: the native
    optimizer captures curvature through explicit layer taps instead.
    """
    el_fun = make_local_energy(
        network, supercell, mode=mode, partition_number=partition_number,
        network=network_obj, deriv_axis=deriv_axis,
    )
    # bound the psi-gradient path's memory: the JVP below (and its KFAC
    # transpose) otherwise materializes full-batch activations
    batch_network = chunk_batch_fn(batch_network, psi_chunk, "psi")
    vmapped_el = jax.vmap(el_fun, in_axes=(None, 0), out_axes=0)

    if el_chunk and el_chunk > 0:
        # bound peak memory (forward-Laplacian jets scale with batch):
        # lax.map over chunks of the walker batch
        def batch_local_energy(params, data):
            n = data.shape[0]
            if n % el_chunk != 0:
                raise ValueError(
                    f"optim.el_chunk={el_chunk} must divide the per-device "
                    f"walker batch ({n}); a silent whole-batch fallback "
                    "would OOM exactly the runs that need chunking"
                )
            chunks = data.reshape(n // el_chunk, el_chunk, data.shape[-1])
            ke, ew = jax.lax.map(lambda d: vmapped_el(params, d), chunks)
            return ke.reshape(n), ew.reshape(n)
    else:
        batch_local_energy = vmapped_el

    @jax.custom_jvp
    def total_energy(params, data):
        ke, ew = batch_local_energy(params, data)
        e_l = ke + ew
        # failure containment: a walker at a node/coalescence point yields
        # inf/nan local energy, which would poison the mean AND the clip
        # statistics (the reference's only guard is the optional host-side
        # check_nan retry, process.py:303-318). Replace non-finite samples
        # by the finite-sample mean so one bad walker costs nothing.
        finite = jnp.isfinite(e_l.real) & jnp.isfinite(e_l.imag)
        n_finite = pmean_if_axis(jnp.mean(finite.astype(e_l.real.dtype)),
                                 DATA_AXIS)
        safe_mean = pmean_if_axis(
            jnp.mean(jnp.where(finite, e_l, 0.0)), DATA_AXIS
        ) / jnp.maximum(n_finite, 1e-12)
        e_l = jnp.where(finite, e_l, safe_mean)
        # sanitize the per-part stats the same way (logging fidelity)
        ke_mean = pmean_if_axis(
            jnp.mean(jnp.where(finite, ke, 0.0)), DATA_AXIS
        ) / jnp.maximum(n_finite, 1e-12)
        ew_mean = pmean_if_axis(
            jnp.mean(jnp.where(finite, ew, 0.0)), DATA_AXIS
        ) / jnp.maximum(n_finite, 1e-12)
        ke = jnp.where(finite, ke, ke_mean)
        ew = jnp.where(finite, ew, ew_mean.real)
        mean_e_l = jnp.mean(e_l)
        pmean_loss = pmean_if_axis(mean_e_l, DATA_AXIS)
        variance = pmean_if_axis(
            jnp.mean(jnp.abs(e_l) ** 2) - jnp.abs(mean_e_l.real) ** 2, DATA_AXIS
        )
        return pmean_loss.real, AuxiliaryLossData(
            variance=variance,
            local_energy=e_l,
            imaginary=pmean_loss.imag,
            kinetic=ke,
            ewald=ew,
            # stored as float: bool aux fields break custom-JVP tangents
            finite=finite.astype(e_l.real.dtype),
        )

    @total_energy.defjvp
    def total_energy_jvp(primals, tangents):
        params, data = primals
        loss, aux = total_energy(params, data)
        diff = aux.local_energy - loss
        clip_diff = clip_local_energy_diff(diff, clip_local_energy, clip_type)

        psi_primal, psi_tangent = jax.jvp(batch_network, primals, tangents)
        # a walker with a non-finite local energy may also have a
        # non-finite log-derivative; zero its tangent contribution
        ok = aux.finite != 0
        psi_tangent = jnp.where(ok, psi_tangent, 0.0)
        clip_diff = jnp.where(ok, clip_diff, 0.0)
        del psi_primal  # only the tangent enters the gradient estimator
        # mean (not dot): keeps the gradient batch-size independent, which
        # the KFAC norm constraint relies on (train.py:136-138). The cross-
        # device pmean of the resulting gradient happens in the training
        # step, not here, so the tangent map stays transpose-clean.
        tangents_dot = jnp.mean((clip_diff * jnp.conjugate(psi_tangent)).real)
        return (loss, aux), (tangents_dot, aux)

    total_energy.local_energy_fn = el_fun
    return total_energy
