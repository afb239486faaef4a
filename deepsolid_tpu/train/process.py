"""Training driver: builds everything and runs the VMC optimization loop.

Reference semantics: DeepSolid/process.py:66-383. TPU-native re-design:
  * One jitted `shard_map` training step over a Mesh data axis replaces
    pmap; walker batches are global arrays sharded on the 'data' axis,
    parameters replicated, gradients pmean'd over ICI.
  * Checkpoints store global arrays -> elastic restore across device
    counts.
  * The optimizer is optax (adam), the native KFAC (optim/kfac.py), or
    'none' (inference).
"""

from __future__ import annotations

import datetime
import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from deepsolid_tpu import observables as observables_lib
from deepsolid_tpu.ops import fwdlap
from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.parallel import (
    DATA_AXIS,
    DERIV_AXIS,
    all_mean,
    make_mesh,
    pmean_if_axis,
)
from deepsolid_tpu.sampling import mcmc as mcmc_lib
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.sampling.mcmc import make_mcmc_step
from deepsolid_tpu.scf.free_electron import free_electron_klist
from deepsolid_tpu.system.cell import Supercell
from deepsolid_tpu.train.loss import make_loss
from deepsolid_tpu.utils import checkpoint as checkpoint_lib
from deepsolid_tpu.utils import profiling
from deepsolid_tpu.utils.writers import Writer


def _ensure_supercell(cell) -> Supercell:
    if isinstance(cell, Supercell):
        return cell
    if isinstance(cell, dict):
        return Supercell.from_dict(cell)
    raise ValueError("cfg.system.cell must be a Supercell or its dict form")


def resolve_klist(cfg, sc: Supercell):
    if cfg.system.klist_policy == "explicit":
        klist = cfg.system.klist
        if klist is None:
            raise ValueError("klist_policy='explicit' requires system.klist")
        return tuple(np.asarray(k) for k in klist)
    return free_electron_klist(
        sc, twist=tuple(cfg.network.twist), policy=cfg.system.klist_policy
    )


def build_network(cfg, sc: Supercell, klist_override=None):
    detnet = dict(cfg.network.detnet)
    detnet["hidden_dims"] = tuple(tuple(h) for h in detnet["hidden_dims"])
    klist = (
        klist_override if klist_override is not None else resolve_klist(cfg, sc)
    )
    return make_network(sc, klist, NetworkConfig(**detnet))


def learning_rate_schedule(cfg):
    rate, delay, decay = cfg.optim.lr.rate, cfg.optim.lr.delay, cfg.optim.lr.decay

    def schedule(t):
        return rate * jnp.power(1.0 / (1.0 + t / delay), decay)

    return schedule


def process(cfg, max_iterations: Optional[int] = None):
    """Run pretraining + VMC training per `cfg`. Returns final (params, data).

    `max_iterations` optionally overrides cfg.optim.iterations (handy for
    smoke tests and benchmarks).
    """
    if cfg.precision == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_default_matmul_precision",
        cfg.get("matmul_precision", "highest"),
    )
    fwdlap.set_tangent_precision(
        cfg.get("tangent_matmul_precision", None) or None
    )
    fwdlap.set_jet_storage(cfg.get("jet_storage", None) or None)
    fused = cfg.debug.get("fused_kernels", "")
    if fused:
        fwdlap.set_fused_kernels(fused == "on")
    det_kernel = cfg.debug.get("det_kernel", "")
    if det_kernel:
        fwdlap.set_det_kernel(
            det_kernel if det_kernel == "interpret" else det_kernel == "on"
        )

    deriv_devices = int(cfg.get("parallel", {}).get("deriv_devices", 1))
    deriv_axis = DERIV_AXIS if deriv_devices > 1 else None
    if deriv_axis is not None and cfg.optim.laplacian_mode != "forward":
        raise ValueError(
            "parallel.deriv_devices > 1 requires "
            "optim.laplacian_mode='forward'"
        )
    mesh = make_mesh(deriv_devices)
    num_data = mesh.shape[DATA_AXIS]
    batch_size = cfg.batch_size
    logging.info(
        "Starting QMC on mesh %s (%d data x %d deriv devices)",
        dict(mesh.shape), num_data, deriv_devices,
    )
    if batch_size % num_data != 0:
        raise ValueError(
            f"Batch size {batch_size} not divisible by the {num_data}-way "
            "data axis"
        )

    sc = _ensure_supercell(cfg.system.cell)
    if deriv_axis is not None:
        n_tangents = 3 * sum(sc.nelec)
        if n_tangents % deriv_devices != 0:
            raise ValueError(
                f"parallel.deriv_devices={deriv_devices} must divide the "
                f"3N={n_tangents} Laplacian tangent columns"
            )

    # When an orbital source provides pretraining targets, the network's
    # Bloch phases must use the SAME occupied k-list (the reference gets
    # both from HF, process.py:87,107-113).
    orbital_source = None
    wants_pretrain = (
        cfg.pretrain.iterations > 0 and cfg.pretrain.method != "none"
    )
    if wants_pretrain or (cfg.system.basis and cfg.system.klist_policy == "auto"):
        from deepsolid_tpu.train import pretrain as pretrain_lib

        orbital_source = pretrain_lib.make_orbital_source(cfg, sc)

    net = build_network(
        cfg, sc,
        klist_override=orbital_source.klist if orbital_source else None,
    )

    ckpt_save_path = checkpoint_lib.create_save_path(cfg.log.save_path)
    ckpt_restore_filename = checkpoint_lib.find_last_checkpoint(
        ckpt_save_path
    ) or checkpoint_lib.find_last_checkpoint(
        checkpoint_lib.get_restore_path(cfg.log.restore_path)
    )
    if cfg.log.restore_path and not ckpt_restore_filename:
        # a configured restore_path with nothing restorable silently
        # re-pretrains from scratch — loud enough to catch a lost
        # cross-round checkpoint handoff (runs/diamond_run.py protocol)
        logging.warning(
            "log.restore_path=%s is set but no usable checkpoint was "
            "found there (or in save_path); starting from scratch.",
            cfg.log.restore_path,
        )

    seed = 666 if cfg.debug.deterministic else int(1e6 * time.time()) % (2**31)
    if jax.process_count() > 1 and not cfg.debug.deterministic:
        # all hosts must agree on the parameter-init key (reference
        # averages seeds across hosts, process.py:44-63)
        from jax.experimental import multihost_utils

        seed = int(
            multihost_utils.broadcast_one_to_all(jnp.asarray(seed))
        )
    key = jax.random.PRNGKey(seed)
    key = jax.random.fold_in(key, 0)  # room for per-host streams if needed

    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    repl_sharding = NamedSharding(mesh, P())

    opt_state_ckpt = mcmc_width_ckpt = None
    if ckpt_restore_filename:
        t_init, data, params, opt_state_ckpt, mcmc_width_ckpt = (
            checkpoint_lib.restore(ckpt_restore_filename, batch_size)
        )
        data = jax.device_put(jnp.asarray(data), data_sharding)
        # fail fast on a checkpoint from a different network architecture —
        # otherwise the mismatch surfaces later as an obscure reshape error
        # deep inside the first jitted step
        want = jax.eval_shape(net.init, jax.random.PRNGKey(0))
        got_shapes = jax.tree_util.tree_map(lambda a: jnp.shape(a), params)
        want_shapes = jax.tree_util.tree_map(lambda a: a.shape, want)
        if got_shapes != want_shapes:
            raise ValueError(
                f"Checkpoint {ckpt_restore_filename} holds parameters for a "
                "different network architecture than this config builds "
                "(shape mismatch). Point log.save_path/restore_path at a "
                "fresh directory or use the original config."
            )
        params = jax.device_put(params, repl_sharding)
        logging.info("Restored checkpoint %s", ckpt_restore_filename)
    else:
        t_init = 0
        key, init_key, param_key = jax.random.split(key, 3)
        if cfg.debug.deterministic:
            param_key = jax.random.PRNGKey(888)
        data = init_electrons(
            init_key, sc, sc.nelec, batch_size, init_width=cfg.mcmc.init_width
        )
        data = jax.device_put(data, data_sharding)
        params = jax.device_put(net.init(param_key), repl_sharding)

    # ---------------- pretraining ------------------------------------------
    if t_init == 0 and wants_pretrain:
        from deepsolid_tpu.train import pretrain as pretrain_lib

        key, subkey = jax.random.split(key)
        params, data = pretrain_lib.pretrain(
            cfg, sc, net, params, data, subkey, mesh, source=orbital_source
        )
        checkpoint_lib.save(ckpt_save_path, 0, data, params, None, None)

    # ---------------- samplers / loss ---------------------------------------
    from deepsolid_tpu.train.loss import chunk_batch_fn

    mcmc_step = make_mcmc_step(
        chunk_batch_fn(net.batch_slogdet, cfg.optim.get("psi_chunk", 0)),
        sc.lattice,
        steps=cfg.mcmc.steps,
        one_electron_moves=cfg.mcmc.one_electron,
        importance_network=net.slogdet if cfg.mcmc.importance_sampling else None,
        psi_chunk=cfg.optim.get("psi_chunk", 0),
    )

    optimizer_name = cfg.optim.optimizer
    kfac_optimizer = None
    if optimizer_name == "kfac":
        from deepsolid_tpu.optim import kfac as kfac_lib

        kfac_optimizer = kfac_lib.KfacOptimizer(
            network=net,
            learning_rate_schedule=learning_rate_schedule(cfg),
            damping=cfg.optim.kfac.damping,
            norm_constraint=cfg.optim.kfac.norm_constraint,
            cov_ema_decay=cfg.optim.kfac.cov_ema_decay,
            invert_every=cfg.optim.kfac.invert_every,
            cov_update_every=cfg.optim.kfac.cov_update_every,
            min_damping=cfg.optim.kfac.min_damping,
            momentum=cfg.optim.kfac.momentum,
            l2_reg=cfg.optim.kfac.l2_reg,
            adaptive_damping=cfg.optim.kfac.get("adaptive_damping", False),
            damping_adaptation_interval=cfg.optim.kfac.get(
                "damping_adaptation_interval", 5
            ),
            damping_adaptation_decay=cfg.optim.kfac.get(
                "damping_adaptation_decay", 0.9
            ),
            max_damping=cfg.optim.kfac.get("max_damping", 1.0),
            capture_chunk=cfg.optim.get("psi_chunk", 0),
            estimation_mode=cfg.optim.kfac.get(
                "estimation_mode", "fisher_exact"
            ),
        )

    total_energy = make_loss(
        net.logdet,
        net.batch_logdet,
        sc,
        clip_local_energy=cfg.optim.clip_el,
        clip_type=cfg.optim.clip_type,
        mode=cfg.optim.laplacian_mode,
        partition_number=cfg.optim.partition_number,
        network_obj=net,
        el_chunk=cfg.optim.get("el_chunk", 0),
        psi_chunk=cfg.optim.get("psi_chunk", 0),
        deriv_axis=deriv_axis,
    )
    val_and_grad = jax.value_and_grad(total_energy, argnums=0, has_aux=True)

    # ---------------- jitted steps ------------------------------------------
    def _fold_data_axis(key):
        return jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

    @functools.partial(
        jax.jit,
        donate_argnums=(1,),
    )
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=(P(DATA_AXIS), P()),
        check_vma=False,
    )
    def burn_in_step(params, data, key, width):
        data, pmove = mcmc_step(params, data, _fold_data_axis(key), width)
        return data, pmove

    def adam_optimizer():
        chain = []
        if cfg.optim.gradient_clip > 0:
            chain.append(optax.clip_by_global_norm(cfg.optim.gradient_clip))
        chain += [
            optax.scale_by_adam(**dict(cfg.optim.adam)),
            optax.scale_by_schedule(learning_rate_schedule(cfg)),
            optax.scale(-1.0),
        ]
        opt = optax.chain(*chain)
        if cfg.optim.ministeps > 1:
            opt = optax.MultiSteps(opt, every_k_schedule=cfg.optim.ministeps)
        return opt

    # stats = (loss, local_energy, variance, imaginary, kinetic, finite)
    aux_out_specs = (P(), P(DATA_AXIS), P(), P(), P(), P())

    if optimizer_name == "adam":
        optimizer = adam_optimizer()
        opt_state = optimizer.init(jax.device_get(params))
        if opt_state_ckpt is not None:
            opt_state = opt_state_ckpt
        opt_state = jax.device_put(opt_state, repl_sharding)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(), P()),
            out_specs=(P(), P(DATA_AXIS), P(), P(), aux_out_specs),
            check_vma=False,
        )
        def train_step(params, data, opt_state, key, width):
            key = _fold_data_axis(key)
            k1, _ = jax.random.split(key)
            data, pmove = mcmc_step(params, data, k1, width)
            (loss, aux), grad = val_and_grad(params, data)
            grad = all_mean(grad)
            updates, opt_state = optimizer.update(grad, opt_state, params)
            params = optax.apply_updates(params, updates)
            stats = (
                loss,
                aux.local_energy,
                aux.variance,
                aux.imaginary,
                pmean_if_axis(jnp.mean(aux.kinetic.real)),
                pmean_if_axis(jnp.mean(aux.finite)),
            )
            return params, data, opt_state, pmove, stats

    elif optimizer_name == "kfac":
        opt_state = kfac_optimizer.init(params, data, mesh)
        if opt_state_ckpt is not None:
            # top-level merge so checkpoints written before a state-schema
            # extension (e.g. the adaptive-damping fields) stay restorable
            opt_state = jax.device_put(
                {**opt_state, **dict(opt_state_ckpt)}, repl_sharding
            )
        train_step = kfac_optimizer.make_train_step(
            mesh, mcmc_step, val_and_grad, loss_fn=total_energy
        )

    elif optimizer_name == "none":
        opt_state = None

        @jax.jit
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(), P()),
            out_specs=(P(), P(DATA_AXIS), P(), P(), aux_out_specs),
            check_vma=False,
        )
        def train_step(params, data, opt_state, key, width):
            key = _fold_data_axis(key)
            k1, _ = jax.random.split(key)
            data, pmove = mcmc_step(params, data, k1, width)
            loss, aux = total_energy(params, data)
            stats = (
                loss,
                aux.local_energy,
                aux.variance,
                aux.imaginary,
                pmean_if_axis(jnp.mean(aux.kinetic.real)),
                pmean_if_axis(jnp.mean(aux.finite)),
            )
            return params, data, opt_state, pmove, stats

    else:
        raise ValueError(f"Unknown optimizer: {optimizer_name}")

    # ---------------- burn-in ------------------------------------------------
    mcmc_width = (
        jnp.asarray(mcmc_width_ckpt)
        if mcmc_width_ckpt is not None
        else jnp.asarray(cfg.mcmc.move_width)
    )
    if cfg.debug.get("compile_only", False):
        # AOT-compile the train step and report XLA's static memory
        # analysis without executing anything on the device — the tool for
        # diagnosing HBM ceilings at production batch sizes.
        key, subkey = jax.random.split(key)
        lowered = train_step.lower(params, data, opt_state, subkey,
                                   mcmc_width)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        logging.info("compile_only memory analysis: %s", ma)
        return ma
    if t_init == 0 and cfg.mcmc.burn_in > 0:
        logging.info("Burning in MCMC chain for %d steps", cfg.mcmc.burn_in)
        for _ in range(cfg.mcmc.burn_in):
            key, subkey = jax.random.split(key)
            data, _ = burn_in_step(params, data, subkey, mcmc_width)
        logging.info("Completed burn-in")

    if optimizer_name == "none" and opt_state_ckpt is not None:
        t_init = 0  # restored inference run restarts its own clock

    # ---------------- observables / logging ---------------------------------
    train_schema = [
        "energy", "variance", "pmove", "imaginary", "kinetic", "ewald",
        "nonfinite",
    ]
    log_damping = (
        optimizer_name == "kfac"
        and cfg.optim.kfac.get("adaptive_damping", False)
    )
    if log_damping:
        train_schema.append("damping")
    polarization_fn = structure_factor_fn = None
    if cfg.log.complex_polarization:
        train_schema.append("complex_polarization")
        polarization_fn = jax.jit(observables_lib.make_complex_polarization(sc))
    if cfg.log.structure_factor:
        structure_factor_fn = jax.jit(observables_lib.make_structure_factor(sc))

    iterations = (
        min(cfg.optim.iterations, max_iterations)
        if max_iterations is not None
        else cfg.optim.iterations
    )
    scale = sc.scale
    # adaptive proposal width runs on device (sampling/mcmc.py:update_mcmc_width)
    pmoves = jnp.zeros(cfg.mcmc.adapt_frequency)
    width_update = jax.jit(
        functools.partial(
            mcmc_lib.update_mcmc_width,
            adapt_frequency=cfg.mcmc.adapt_frequency,
        )
    )
    time_of_last_ckpt = time.time()
    loss = None
    # first-class profiling (absent upstream, SURVEY §5): windowed XProf
    # trace of the steady-state training step, opt-in via log.trace_path
    tracer = profiling.StepTracer(
        cfg.log.get("trace_path", ""),
        start=cfg.log.get("trace_start", 10),
        steps=cfg.log.get("trace_steps", 5),
    )

    with Writer(
        name=cfg.log.stats_file_name,
        schema=train_schema,
        directory=ckpt_save_path,
        iteration_key="step",
    ) as writer:
        for t in range(t_init, iterations):
            tracer.step(t - t_init)
            key, subkey = jax.random.split(key)
            if cfg.debug.check_nan:
                prev = (params, data, opt_state)
            params, data, opt_state, pmove, stats = train_step(
                params, data, opt_state, subkey, mcmc_width
            )
            loss, e_l, variance, imaginary, kinetic, finite_frac, *extra = stats

            if cfg.debug.check_nan:
                flat = jax.tree_util.tree_leaves((params, loss))
                if not all(bool(jnp.all(jnp.isfinite(v))) for v in flat):
                    # retry semantics: discard this step and keep going
                    # (reference: process.py:303-318)
                    logging.warning("Non-finite update at step %d; retrying", t)
                    params, data, opt_state = prev
                    continue

            # the only unconditional per-step device sync: the containment
            # warning must fire the step it happens, not at the next log
            nonfinite = 1.0 - float(finite_frac)
            if nonfinite > 0.01:
                # failure containment engaged on >1% of walkers — the
                # masked loss keeps training, but the user should know
                logging.warning(
                    "Step %d: %.1f%% of walkers had non-finite local "
                    "energies (masked out)", t, 100.0 * nonfinite,
                )
            if t % cfg.log.stats_frequency == 0:
                pmove_val = float(pmove)
                loss_val = float(loss) / scale
                var_val = float(variance.real) / scale**2
                imag_val = float(imaginary) / scale
                kin_val = float(kinetic) / scale
                ewald_val = loss_val - kin_val
                logging.info(
                    "%s Step %05d: %.4f E_h, variance=%.4f, pmove=%.2f, "
                    "imag=%.4f, kinetic=%.4f, ewald=%.4f",
                    datetime.datetime.now(), t, loss_val, var_val,
                    pmove_val, imag_val, kin_val, ewald_val,
                )
                row = {
                    "energy": loss_val,
                    "variance": var_val,
                    "pmove": pmove_val,
                    "imaginary": imag_val,
                    "kinetic": kin_val,
                    "ewald": ewald_val,
                    "nonfinite": nonfinite,
                }
                if log_damping:
                    row["damping"] = float(extra[0])
                if polarization_fn is not None:
                    row["complex_polarization"] = complex(
                        polarization_fn(data)
                    ).real
                writer.write(t, **row)
            if structure_factor_fn is not None:
                sk = np.asarray(structure_factor_fn(data)).real
                with open(f"{ckpt_save_path}/structure_factor.csv", "a") as f:
                    f.write(f"{t}," + ",".join(str(v) for v in sk) + "\n")
            if cfg.log.local_energies and t % cfg.log.stats_frequency == 0:
                # per-walker local energies (Re, Im interleaved); opt-in —
                # the reference declares this flag but never writes it
                el = np.asarray(jax.device_get(e_l))
                with open(f"{ckpt_save_path}/local_energies.csv", "a") as f:
                    f.write(
                        f"{t},"
                        + ",".join(f"{v.real:.10g},{v.imag:.10g}" for v in el)
                        + "\n"
                    )

            # adaptive proposal width, fully on device
            # (reference adapts on host: process.py:367-374)
            mcmc_width, pmoves = width_update(t, mcmc_width, pmoves, pmove)

            if (
                time.time() - time_of_last_ckpt > cfg.log.save_frequency * 60
                or t >= iterations - 1
                or (
                    cfg.log.save_frequency_in_step > 0
                    and t % cfg.log.save_frequency_in_step == 0
                )
            ):
                if optimizer_name != "none":
                    checkpoint_lib.save(
                        ckpt_save_path, t, np.asarray(jax.device_get(data)),
                        jax.device_get(params), jax.device_get(opt_state),
                        np.asarray(mcmc_width),
                    )
                time_of_last_ckpt = time.time()
        tracer.close()

    return params, data, (float(loss) / scale if loss is not None else None)
