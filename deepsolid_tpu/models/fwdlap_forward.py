"""Forward-Laplacian evaluation of the periodic FermiNet kinetic energy.

One network traversal carrying (value, Jacobian, Laplacian) jets replaces
the 3N JVP-of-grad re-traversals of the reference's Laplacian ladder
(DeepSolid/hamiltonian.py:45-159). Key structural savings:
  * two-electron stream jets stay PAIR-SPARSE (6 tangents instead of 3N):
    h2[i,j] never mixes with other pairs through the double stream;
  * ONE LU factorization per determinant instead of 3N;
  * the dense-tangent axis (3N) rides the MXU as a batched matmul dim.

Mirrors models/network.py:orbital_matrices step by step; tests assert the
value and the kinetic energy agree with the standard path + hessian mode.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from deepsolid_tpu.models import envelopes as envelopes_lib
from deepsolid_tpu.models import features as features_lib
from deepsolid_tpu.models.network import NetworkConfig, SystemSpec
from deepsolid_tpu.ops import fwdlap as fl
from deepsolid_tpu.ops.distance import enforce_pbc


def _channel_ranges(spins):
    ranges = []
    start = 0
    for s in spins:
        if s > 0:
            ranges.append((start, start + s))
        start += s
    return ranges


def _slice_tangents(jac, deriv_axis):
    """Keep only this device's tangent slice (dense reps only)."""
    if deriv_axis is None:
        return jac
    size = jax.lax.psum(1, deriv_axis)
    t_loc = jac.shape[0] // size
    t0 = jax.lax.axis_index(deriv_axis) * t_loc
    return jax.lax.dynamic_slice_in_dim(jac, t0, t_loc, axis=0)


def network_jets(params, x, spec: SystemSpec, cfg: NetworkConfig,
                 deriv_axis=None) -> fl.Jet:
    """Jet of complex log psi wrt the 3N electron coordinates.

    `deriv_axis`: optional mesh axis name over which the 3N tangent
    columns are sharded (the TPU analog of sequence/context parallelism
    for this workload, SURVEY.md §5): every DENSE jet holds only the
    local tangent slice; cross-tangent contractions psum over the axis.
    Pair-sparse two-electron jets (6 tangents) stay device-local.
    """
    dtype = x.dtype
    spins = spec.spins
    n = spec.nelectron
    pos = x.reshape(n, 3)
    atoms = jnp.asarray(spec.atoms, dtype)
    dist_fn = features_lib._DISTANCE_FNS[cfg.distance_type]
    rel = features_lib.REL_DIMS[cfg.distance_type]
    natom = atoms.shape[0]
    prim_av = jnp.asarray(spec.prim_av, dtype)
    prim_bv = jnp.asarray(spec.prim_bv, dtype)
    sim_av = jnp.asarray(spec.sim_av, dtype)
    sim_bv = jnp.asarray(spec.sim_bv, dtype)

    # ---- electron-atom features: analytic per-electron jets ------------------
    jet_fn = features_lib.DISTANCE_JET_FNS[cfg.distance_type]
    prim_x, _ = enforce_pbc(spec.prim_lattice, x)
    ae_disp = prim_x.reshape(n, 3)[:, None, :] - atoms[None, :, :]
    sd, dsd, lap_sd, rl, drl, lap_rl = jet_fn(ae_disp, prim_av, prim_bv)
    ae_val = jnp.concatenate([sd[..., None], rl], axis=-1)  # (n, natom, rel+1)
    ae_jac = jnp.concatenate([dsd[..., None], drl], axis=-1)  # (n, natom, 3, rel+1)
    ae_jac = jnp.moveaxis(ae_jac, 2, 0)  # (3, n, natom, rel+1)
    ae_lap = jnp.concatenate([lap_sd[..., None], lap_rl], axis=-1)
    h_one = fl.Jet(
        val=ae_val.reshape(n, natom * (rel + 1)),
        jac=fl.store_jac(_slice_tangents(
            fl.dense_from_electron_rows(
                ae_jac.reshape(3, n, natom * (rel + 1))
            ),
            deriv_axis,
        )),
        lap=ae_lap.reshape(n, natom * (rel + 1)),
    )

    # ---- electron-electron features: analytic pair-sparse jets ---------------
    sim_x, _ = enforce_pbc(spec.sim_lattice, x)
    sim_pos = sim_x.reshape(n, 3)
    eye = jnp.eye(n, dtype=dtype)
    u = sim_pos[:, None, :] - sim_pos[None, :, :] + eye[..., None]
    sd, dsd, lap_sd, rl, drl, lap_rl = jet_fn(u, sim_av, sim_bv)
    ee_val = jnp.concatenate([sd[..., None], rl], axis=-1)  # (n, n, rel+1)
    ee_jac = jnp.moveaxis(
        jnp.concatenate([dsd[..., None], drl], axis=-1), 2, 0
    )  # (3, n, n, rel+1) wrt u
    ee_lap = jnp.concatenate([lap_sd[..., None], lap_rl], axis=-1)
    mask = (1.0 - eye)[..., None]
    h_two = fl.Jet(
        val=ee_val * mask,
        jac=jnp.concatenate([ee_jac, -ee_jac], axis=0) * mask[None],
        lap=2.0 * ee_lap * mask,  # Lap_{r_i} + Lap_{r_j} = 2 Lap_u
    )

    ranges = _channel_ranges(spins)

    # ---- symmetric feature mixing ---------------------------------------------
    # Split representation: the concat [h1 | mean_ch(h1) | mean_ch(h2)] is
    # kept as a ROW-VARYING jet (h1 + pair means) and a ROW-CONSTANT jet
    # (the per-channel h1 means, identical for every electron row). The
    # row-constant block enters dense layers at (T, 1, f) cost instead of
    # riding the (T, n, f) jac matmul — the mean columns are ~60% of the
    # mixed width at trunk/orbital layers, so this cuts the dominant MXU
    # and HBM cost of the forward-Laplacian pass by ~2x (ROADMAP item 6).
    # W rows are ordered [h1 | means | pair means] (models/network.py
    # construct_symmetric_features), so w splits into
    #   w_rv = [w[:f1]; w[f1*(1+nch):]]   and   w_rc = w[f1 : f1*(1+nch)].
    def symmetric_split(h1: fl.Jet, h2: fl.Jet):
        rc_parts = []
        for (s, e) in ranges:
            h1s = fl.slice_axis(h1, 0, s, e)
            # channel means accumulate in f32 even when the trunk jac is
            # stored bf16: the (T, 1, f) row-constant block is tiny
            h1s = fl.Jet(h1s.val, h1s.jac.astype(h1s.val.dtype), h1s.lap)
            rc_parts.append(fl.mean_axis(h1s, axis=0, keepdims=True))
        rv_parts = [h1]
        for (s, e) in ranges:
            rv_parts.append(
                fl.Jet(
                    val=jnp.mean(h2.val[s:e], axis=0),
                    jac=fl.store_jac(_slice_tangents(
                        fl.dense_row_mean_from_pairs(h2.jac, s, e), deriv_axis
                    )),
                    lap=jnp.mean(h2.lap[s:e], axis=0),
                )
            )
        return fl.concat(rv_parts, axis=1), fl.concat(rc_parts, axis=1)

    def split_w(w, f1):
        nch = len(ranges)
        w_rv = jnp.concatenate([w[:f1], w[f1 * (1 + nch):]], axis=0)
        w_rc = w[f1:f1 * (1 + nch)]
        return w_rv, w_rc

    # python-float scale keeps weak typing: a bf16-stored jac stays bf16
    # through the residual while val/lap stay f32 (an f32 array scalar
    # would silently upcast the jac stream back to f32)
    inv_sqrt2 = float(2.0 ** -0.5)

    def residual(old: fl.Jet, new: fl.Jet) -> fl.Jet:
        if old.val.shape == new.val.shape:
            return fl.scale(fl.add(old, new), inv_sqrt2)
        return new

    n_double = len(params["double"])
    for i in range(n_double):
        f1 = h_one.val.shape[-1]
        h_rv, h_rc = symmetric_split(h_one, h_two)
        p1 = params["single"][i]
        w_rv, w_rc = split_w(p1["w"], f1)
        h_one_next = fl.dense_tanh_mix(h_rv, h_rc, w_rv, w_rc, p1.get("b"),
                                       axis_name=deriv_axis)
        p2 = params["double"][i]
        h_two_next = fl.dense_tanh(h_two, p2["w"], p2.get("b"))
        h_one = residual(h_one, h_one_next)
        h_two = residual(h_two, h_two_next)

    if n_double != len(params["single"]):
        f1 = h_one.val.shape[-1]
        h_rv, h_rc = symmetric_split(h_one, h_two)
        p1 = params["single"][-1]
        w_rv, w_rc = split_w(p1["w"], f1)
        h_one = residual(
            h_one,
            fl.dense_tanh_mix(h_rv, h_rc, w_rv, w_rc, p1.get("b"),
                              axis_name=deriv_axis),
        )
        h_to_orbitals = (h_one, None, None)
    else:
        f1 = h_one.val.shape[-1]
        h_rv, h_rc = symmetric_split(h_one, h_two)
        h_to_orbitals = (h_rv, h_rc, f1)

    # ---- orbital heads ----------------------------------------------------------
    envelope_fn = envelopes_lib.ENVELOPES[cfg.envelope_type]
    active = [s for s in spins if s > 0]
    klist = [jnp.asarray(k, dtype) for k in spec.klist]
    if cfg.full_det:
        k_cols = jnp.concatenate(klist, axis=0)

    sign_total = None
    l_total = None
    channel_jets = []
    h_orb_rv, h_orb_rc, f1_orb = h_to_orbitals
    for ch, (s, e) in enumerate(ranges):
        spin = e - s
        w_orb = params["orbital"][ch]["w"]
        b_orb = params["orbital"][ch].get("b")
        if h_orb_rc is None:
            raw = fl.dense(fl.slice_axis(h_orb_rv, 0, s, e), w_orb, b_orb)
        else:
            # the row-constant mean block is unaffected by row slicing
            w_rv, w_rc = split_w(w_orb, f1_orb)
            raw = fl.dense_mix(
                fl.slice_axis(h_orb_rv, 0, s, e), h_orb_rc, w_rv, w_rc,
                b_orb,
            )
        nparam = raw.val.shape[-1] // 2
        orb = fl.complexify(
            fl.slice_axis(raw, 1, 0, nparam),
            fl.slice_axis(raw, 1, nparam, 2 * nparam),
        )

        # envelope: per-electron function of r -> (nparam,)
        env_params = params["envelope"][ch]

        def env_fn(r, env_params=env_params):
            pr, _ = enforce_pbc(spec.prim_lattice, r)
            disp = pr - atoms
            sd, rl = dist_fn(disp, prim_av, prim_bv)
            to_env = sd[..., None] if cfg.envelope_type == "isotropic" else rl
            return envelope_fn(to_env[None], env_params)[0]  # (nparam,)

        envr = jax.vmap(lambda r: fl.jet_of_function(env_fn, r))(pos[s:e])

        norb = sum(spins) if cfg.full_det else spin
        ndet = cfg.determinants
        # (spin, ndet*norb) -> (ndet, spin, norb); linear_op maps the same
        # reshape+transpose over value, tangents, and laplacian rows
        orb = fl.linear_op(
            lambda v: v.reshape(v.shape[:-2] + (spin, ndet, norb))
            .swapaxes(-3, -2),
            orb,
        )

        # Bloch phases: analytic per-electron jets (spin, norb)
        kcol = k_cols if cfg.full_det else klist[ch]  # (norb, 3)
        phase_val = jnp.exp(1j * pos[s:e] @ kcol.T)  # (spin, norb)
        phase_jac3 = (
            1j * kcol.T[:, None, :] * phase_val[None]
        )  # (3, spin, norb)
        phase_lap = -jnp.sum(kcol**2, axis=-1)[None] * phase_val

        # Fused envelope*phase ROW-LOCAL jet: both factors depend only on
        # each orbital row's own electron, so their product jet is formed
        # at (3, spin, ndet, norb) cost and multiplied into the orbital
        # jet with fl.mul_row — ONE pass over the big (T, ndet, spin,
        # norb) tangent stream plus thin scatter/gather corrections,
        # instead of two dense fl.mul passes against materialized
        # (3N, ...) jets that are zero outside 3 tangent rows per
        # electron (the former _dense_rows_global path).
        env_val = envr.val.reshape(spin, ndet, norb)
        env_jac3 = jnp.moveaxis(envr.jac, 1, 0).reshape(3, spin, ndet, norb)
        env_lap = envr.lap.reshape(spin, ndet, norb)
        ep_val = env_val * phase_val[:, None, :]
        ep_jac3 = (
            env_jac3 * phase_val[None, :, None, :]
            + env_val[None] * phase_jac3[:, :, None, :]
        )
        ep_lap = (
            env_lap * phase_val[:, None, :]
            + 2.0 * jnp.sum(env_jac3 * phase_jac3[:, :, None, :], axis=0)
            + env_val * phase_lap[:, None, :]
        )
        orb = fl.mul_row(
            orb,
            jnp.swapaxes(ep_val, 0, 1),          # (ndet, spin, norb)
            jnp.swapaxes(ep_jac3, 1, 2),         # (3, ndet, spin, norb)
            jnp.swapaxes(ep_lap, 0, 1),
            n_total=n, offset=s, axis_name=deriv_axis,
        )
        channel_jets.append(orb)

    if cfg.full_det:
        mats = [fl.concat(channel_jets, axis=1)]
    else:
        mats = channel_jets

    for mat in mats:
        sign, l = fl.slogdet_jet(mat, axis_name=deriv_axis)
        if l_total is None:
            sign_total, l_total = sign, l
        else:
            sign_total = sign_total * sign
            l_total = fl.add(l_total, l)

    return fl.logsumexp_det_jet(sign_total, l_total, axis_name=deriv_axis)


def make_kinetic_forward(network, deriv_axis=None) -> Callable:
    """kinetic(params, x) -> complex local kinetic via forward Laplacian.

    With `deriv_axis`, the 3N tangent columns shard over that mesh axis.
    """
    spec, cfg = network.spec, network.cfg

    def kinetic(params, x):
        jet = network_jets(params, x, spec, cfg, deriv_axis=deriv_axis)
        grad2 = fl._tsum(jet.jac[:, None] ** 2, deriv_axis)[0]
        return -0.5 * (jet.lap + grad2)

    return kinetic


def make_logpsi_and_kinetic(network, deriv_axis=None) -> Callable:
    """(params, x) -> (log psi complex, kinetic complex) in one pass.

    With `deriv_axis`, the 3N tangent columns shard over that mesh axis
    (same contract as make_kinetic_forward).
    """
    spec, cfg = network.spec, network.cfg

    def both(params, x):
        jet = network_jets(params, x, spec, cfg, deriv_axis=deriv_axis)
        grad2 = fl._tsum(jet.jac[:, None] ** 2, deriv_axis)[0]
        return jet.val, -0.5 * (jet.lap + grad2)

    return both
