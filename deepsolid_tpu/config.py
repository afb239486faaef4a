"""Default configuration (ml_collections) for deepsolid_tpu runs.

Key layout mirrors the reference (DeepSolid/base_config.py:22-157) so users
can carry over overrides, with these deliberate changes:
  * `system.cell` holds a serializable `Supercell` (or its dict form), not
    a live PySCF object — configs and checkpoints are picklable/jsonable.
  * `system.klist_policy` selects the native occupied-k-list source
    ('auto'/'uniform'/'fermi') or 'explicit' with `system.klist`.
  * `precision` replaces use_x64 ('float32' default on TPU; tests use
    float64 on CPU).
  * `optim.laplacian_mode` gains the TPU-preferred 'forward' engine.
"""

from __future__ import annotations

import ml_collections


def default() -> ml_collections.ConfigDict:
    cfg = ml_collections.ConfigDict(
        {
            "batch_size": 4096,
            "precision": "float32",  # 'float32' | 'float64'
            # MXU matmul passes for float32 arrays: 'highest' (6-pass bf16,
            # full f32 accuracy — parity with the reference's A100 fp32),
            # 'tensorfloat32' (3-pass), or 'default' (1-pass bf16).
            # Measured per-walker kinetic error vs 'highest' on equilibrated
            # H10 walkers (r=1.8, cc-pVDZ-pretrained net): 'default' biases
            # by +0.200 Ha/atom (training diverges — the round-1/round-2
            # H10 stall root cause), 'tensorfloat32' by -0.0037 Ha/atom
            # (still 37x the 1e-4 accuracy target). Only 'highest' is
            # production-safe.
            "matmul_precision": "highest",
            # Precision tier for the TANGENT-axis matmuls of the forward
            # Laplacian only (the (3N, n, f) jac blocks and the det head's
            # batched A^-1 J_t products — ~80% of the E_L FLOPs). The
            # value path always runs at matmul_precision. 'high' (bf16_3x)
            # doubles MXU throughput on those blocks; validate per system
            # with benchmarks/f64_reeval.py before dropping from 'highest'.
            "tangent_matmul_precision": "highest",
            # Storage dtype for the dense (3N, n, 256) trunk tangent
            # stream between forward-Laplacian layers — the largest
            # tensors of the E_L pass, which is HBM-bandwidth-bound
            # (the compute-tier A/B above measured 1.017x: a dead
            # lever). 'bf16' halves that stream; ALL arithmetic stays
            # f32 (kernels upcast on read; value/Laplacian paths and
            # tangent-square reductions are f32), so rounding enters
            # only at the once-per-layer store. MEASURED on the trained
            # C-diamond 2x2x2 state (round 4): 1.09x kinetic-only
            # throughput but a +11.4 mHa/atom E_L bias vs the f64
            # re-eval (f32 storage itself is clean, -1.0+-2.4 mHa/cell)
            # — 100x over the 1e-4 Ha/atom budget, so bf16 is NOT the
            # default anywhere. 'auto' follows env
            # DEEPSOLID_TPU_JET_STORE (default f32). Only flip after
            # benchmarks/f64_reeval.py passes on YOUR trained state.
            "jet_storage": "auto",  # 'auto' | 'f32' | 'bf16'
            "optim": {
                "iterations": 1000000,
                "optimizer": "kfac",  # 'kfac' | 'adam' | 'none'
                "lr": {
                    "rate": 5.0e-2,
                    "decay": 1.0,
                    "delay": 10000.0,
                },
                "clip_el": 5.0,
                "clip_type": "real",  # 'real' | 'complex'
                "gradient_clip": 5.0,  # global-norm clip on adam grads; <=0 off
                "adam": {
                    "b1": 0.9,
                    "b2": 0.999,
                    "eps": 1.0e-8,
                    "eps_root": 0.0,
                },
                "kfac": {
                    "invert_every": 1,
                    "cov_update_every": 1,
                    "damping": 0.001,
                    "cov_ema_decay": 0.95,
                    "momentum": 0.0,
                    "min_damping": 1.0e-4,
                    "norm_constraint": 0.001,
                    "l2_reg": 0.0,
                    # Levenberg-Marquardt adaptive damping (the reference
                    # warns this is "not currently available" upstream,
                    # base_config.py:69 — we provide it): every
                    # `adaptation_interval` steps, re-evaluate the loss on
                    # the same walkers after the update and compare the
                    # actual change against the quadratic-model prediction
                    # rho = dl / (g.d + d.F.d/2 + damping|d|^2/2); damping
                    # shrinks by decay^interval when rho > 3/4, grows when
                    # rho < 1/4.
                    "adaptive_damping": False,
                    "damping_adaptation_interval": 5,
                    "damping_adaptation_decay": 0.9,
                    "max_damping": 1.0,
                    # Fisher estimation mode (reference estimator.py:264-320):
                    # 'fisher_exact' (production default here and upstream)
                    # sums the exact per-output one-hot cotangents (two
                    # backward passes: re + im); 'fisher_gradients' and
                    # 'fisher_curvature_prop' are the cheap MC fallbacks —
                    # ONE backward pass seeded with sqrt(2)*N(0,1) /
                    # sqrt(2)*Rademacher respectively, unbiased for the
                    # same factors with sampling noise the cov EMA
                    # averages out. The MC modes are PARITY options
                    # (unit unbiasedness + short e2e descent tests,
                    # tests/test_kfac.py) — production runs here use
                    # fisher_exact; promote an MC mode only with its
                    # own converged-energy evidence.
                    "estimation_mode": "fisher_exact",
                },
                "ministeps": 1,
                "laplacian_mode": "partition",  # 'forward'|'partition'|'vmap'|'for'|'hessian'
                "partition_number": 3,
                # walkers per local-energy sweep (0 = whole batch at once);
                # bounds forward-Laplacian jet memory at large batch sizes
                "el_chunk": 0,
                # walker-chunk the psi-gradient vjp, KFAC curvature
                # capture, and MCMC log-psi sweeps (lax.map): lets the
                # full KFAC step run at batch 4096 x 96e on one 16G chip.
                # 0 = whole batch.
                "psi_chunk": 0,
            },
            "log": {
                "stats_frequency": 1,
                "save_frequency": 10.0,  # minutes
                "save_frequency_in_step": -1,
                "save_path": "",
                "restore_path": "",
                "local_energies": False,
                "complex_polarization": False,
                "structure_factor": False,
                "stats_file_name": "train_stats",
                # non-empty: capture a jax.profiler (XProf/TensorBoard)
                # device trace of training steps [trace_start,
                # trace_start + trace_steps) into this directory
                "trace_path": "",
                "trace_start": 10,
                "trace_steps": 5,
            },
            "system": {
                "cell": None,  # deepsolid_tpu.system.Supercell (or dict)
                "ndim": 3,
                "klist_policy": "auto",  # 'auto'|'uniform'|'fermi'|'explicit'
                "klist": None,  # used when klist_policy == 'explicit'
                "basis": "",  # GTO basis name for native-SCF pretraining
            },
            "mcmc": {
                "burn_in": 100,
                "steps": 20,
                "init_width": 0.8,
                "move_width": 0.02,
                "adapt_frequency": 100,
                # Proposal-kind guidance (measured on the trained H10
                # state, runs/sampler_autocorr.json; reference marks both
                # alternatives "untested", qmc.py:83-287):
                #   importance_sampling (Langevin drift) decorrelates the
                #   slow polarization mode ~7x cheaper per |psi|^2 eval
                #   (~2.5x in wall-clock incl. the value_and_grad cost)
                #   than all-electron moves — worth enabling when long-
                #   wavelength observables or small-acceptance systems
                #   dominate the error bar.
                #   one_electron is at cost PARITY per eval (IAT_moves
                #   ~n_elec times smaller, but each sweep costs n_elec
                #   full evals — no low-rank determinant updates here or
                #   upstream) and is not worth its n_elec-fold eval count.
                # The importance sampler's per-move value_and_grad honors
                # optim.psi_chunk (round 4), so it fits the same memory
                # plan as the default sampler at production batch.
                "importance_sampling": False,
                "one_electron": False,
            },
            "network": {
                "detnet": {
                    "envelope_type": "isotropic",
                    "bias_orbitals": False,
                    "use_last_layer": False,
                    "full_det": False,
                    "hidden_dims": ((256, 32), (256, 32), (256, 32)),
                    "determinants": 8,
                    "distance_type": "nu",
                },
                "twist": (0.0, 0.0, 0.0),
            },
            "parallel": {
                # trailing mesh-axis size for sharding the 3N Laplacian
                # tangent columns (laplacian_mode='forward' only); the
                # remaining devices form the 'data' (walker) axis
                "deriv_devices": 1,
            },
            "debug": {
                "check_nan": False,
                "deterministic": False,
                # AOT-compile the train step, log XLA's static memory
                # analysis, and return without executing — for diagnosing
                # HBM ceilings at production batch sizes
                "compile_only": False,
                # '' = auto (OFF since round 5: plain-XLA fusion of the
                # trunk jet rule measured ~1.2x faster than the Pallas
                # kernels at the C-diamond production shape — see
                # ops/fwdlap._use_fused); 'on' restores the Pallas
                # kernels for A/B.
                "fused_kernels": "",
                # '' = auto (Pallas lane-batched Gauss-Jordan det-head
                # inverse; currently opt-in pending the on-chip A/B,
                # env DEEPSOLID_TPU_DET_KERNEL also applies);
                # 'on'/'off' to force, 'interpret' for CPU tests
                "det_kernel": "",
            },
            "pretrain": {
                "method": "net",  # 'net' | 'hf' | 'none'
                "iterations": 1000,
                "lr": 3e-4,
                "steps": 1,
                # orbital-source SCF level: 'core' (core-Hamiltonian
                # bands), 'hf' (self-consistent UHF, scf/hf.run_uhf), or
                # 'rhf' (restricted KRHF, closed shells — the reference's
                # bridge supports both, hf.py:61-81)
                "scf": "core",
            },
        }
    )
    return cfg


def resolve(cfg):
    return cfg.copy_and_resolve_references()
