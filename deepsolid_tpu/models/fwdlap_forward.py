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


def _use_orb_scan() -> bool:
    """Gate for the tangent-chunked orbital+det head (default OFF —
    a MEMORY lever, not a speed default).

    The round-5 on-chip trace showed ~31% of the C-diamond kinetic eval
    in layout churn of the full-width post-trunk tangent stream: the
    (T, ndet, n, n) orbital jac built by mul_row was materialized padded
    (48-lane minor, 2.7x), relayouted twice, and repacked into the det
    head's flat (n, T*n) stream. The scan form slices the trunk jac per
    tangent chunk (T is a major axis — layout-free), runs orbital dense
    -> envelope*phase row product -> det trace contraction on
    chunk-sized temporaries, and never materializes any post-trunk
    (T, ...) tensor: at C-diamond el_chunk 128 the top live allocations
    become pure trunk streams. Measured same-window at el_chunk 64
    (C-diamond, batch 1024): 118.5 vs 129.1 walkers/s — 0.92x (the
    full-width path's relayout copies overlap with compute; the scan
    serializes) — so speed keeps the full-width default and the scan is
    opt-in where the full-width orbital jac does not fit (large
    electron counts / large el_chunk). DEEPSOLID_TPU_ORB_SCAN=on
    enables it."""
    return fl.env_flag("DEEPSOLID_TPU_ORB_SCAN", {"on", "off"}) == "on"


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
    def symmetric_split_parts(h1: fl.Jet, h2: fl.Jet):
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
        return rv_parts, fl.concat(rc_parts, axis=1)

    def symmetric_split(h1: fl.Jet, h2: fl.Jet):
        rv_parts, rc = symmetric_split_parts(h1, h2)
        return fl.concat(rv_parts, axis=1), rc

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
        orb_parts, h_orb_rc, f1_orb = [h_one], None, None
    else:
        f1_orb = h_one.val.shape[-1]
        orb_parts, h_orb_rc = symmetric_split_parts(h_one, h_two)

    # ---- orbital heads ----------------------------------------------------------
    envelope_fn = envelopes_lib.ENVELOPES[cfg.envelope_type]
    klist = [jnp.asarray(k, dtype) for k in spec.klist]
    if cfg.full_det:
        k_cols = jnp.concatenate(klist, axis=0)

    use_scan = _use_orb_scan()

    def jet0(j: fl.Jet) -> fl.Jet:
        # value/lap-only view: every fl op below short-circuits its
        # tangent work on the empty axis (the scan supplies the jacs)
        return fl.Jet(j.val, j.jac[:0], j.lap)

    if use_scan:
        h_orb_rv = fl.concat([jet0(p) for p in orb_parts], axis=1)
        rc0 = jet0(h_orb_rc) if h_orb_rc is not None else None
    else:
        h_orb_rv = fl.concat(orb_parts, axis=1)
        rc0 = h_orb_rc

    sign_total = None
    l_total = None
    channel_jets = []
    scan_ing = []  # per-channel ingredients for the tangent-chunk scan
    for ch, (s, e) in enumerate(ranges):
        spin = e - s
        w_orb = params["orbital"][ch]["w"]
        b_orb = params["orbital"][ch].get("b")
        if h_orb_rc is None:
            raw = fl.dense(fl.slice_axis(h_orb_rv, 0, s, e), w_orb, b_orb)
            w_rv = w_orb
        else:
            # the row-constant mean block is unaffected by row slicing
            w_rv, w_rc = split_w(w_orb, f1_orb)
            raw = fl.dense_mix(
                fl.slice_axis(h_orb_rv, 0, s, e), rc0, w_rv, w_rc,
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
        ep_val_sw = jnp.swapaxes(ep_val, 0, 1)       # (ndet, spin, norb)
        ep_jac3_sw = jnp.swapaxes(ep_jac3, 1, 2)     # (3, ndet, spin, norb)
        orb_val0 = orb.val                           # (ndet, spin, norb)
        orb = fl.mul_row(
            orb, ep_val_sw, ep_jac3_sw,
            jnp.swapaxes(ep_lap, 0, 1),
            n_total=n, offset=s, axis_name=deriv_axis,
        )
        channel_jets.append(orb)
        if use_scan:
            if h_orb_rc is None:
                w_parts = [w_orb]
                jbc = None
            else:
                widths = [p.val.shape[-1] for p in orb_parts]
                offs = [0]
                for wd in widths:
                    offs.append(offs[-1] + wd)
                w_parts = [w_rv[offs[i]:offs[i + 1]]
                           for i in range(len(widths))]
                f_rc = h_orb_rc.val.shape[-1]
                jbc = h_orb_rc.jac.reshape(-1, f_rc) @ w_rc  # (T_loc, d_out)
            scan_ing.append(dict(
                s=s, spin=spin, ndet=ndet, norb=norb, nparam=nparam,
                w_parts=w_parts, jbc=jbc, ep_val_sw=ep_val_sw,
                ep_jac3_sw=ep_jac3_sw, orb_val0=orb_val0,
            ))

    if cfg.full_det:
        mats = [fl.concat(channel_jets, axis=1)]
    else:
        mats = channel_jets

    if use_scan:
        sign_total, l_total = _orbital_det_scan(
            mats, scan_ing, orb_parts, cfg.full_det, deriv_axis,
        )
        return fl.logsumexp_det_jet(sign_total, l_total,
                                    axis_name=deriv_axis)

    for mat in mats:
        sign, l = fl.slogdet_jet(mat, axis_name=deriv_axis)
        if l_total is None:
            sign_total, l_total = sign, l
        else:
            sign_total = sign_total * sign
            l_total = fl.add(l_total, l)

    return fl.logsumexp_det_jet(sign_total, l_total, axis_name=deriv_axis)


def _orbital_det_scan(mats0, ing, parts, full_det, deriv_axis):
    """Tangent-chunked orbital + det head.

    mats0: per-mat VALUE/LAP jets (empty tangent axis) — the full
    orbital pipeline already applied to val/lap, missing only the
    jac-borne 2*cross term of the envelope*phase product Laplacian.
    ing: per-channel scan ingredients (weight slices, row-local
    envelope*phase factors, pre-product orbital values).
    parts: trunk rv jets whose DENSE jacs (T_loc, n, f_p) are the only
    full-width tangent tensors read — sliced per chunk along the major
    T axis (layout-free), so no post-trunk (T, ...) tensor is ever
    materialized (the full-width form spent ~31% of the kinetic eval
    relayouting the padded (T, ndet, n, n) orbital jac; round-5 trace).

    Per chunk: trunk-jac slice -> orbital dense -> complexify ->
    envelope*phase row-local product -> flat (n, tc*n) packing ->
    det trace contractions (fl.det_trace_chunk). Carries accumulate
    sum_t tr((A^-1 J_t)^2) per mat and the product-rule cross term per
    channel; stacked outputs are the per-tangent tr(A^-1 J_t).

    Returns (sign_total, l_total) matching the slogdet_jet-per-mat
    combination of the full-width path.
    """
    t_loc = parts[0].jac.shape[0]
    facs = [fl.det_factor(m.val) for m in mats0]
    n_max = max(m.val.shape[-1] for m in mats0)
    tc = fl._pick_det_scan_chunk(t_loc, n_max)
    steps = t_loc // tc
    shard0 = (jax.lax.axis_index(deriv_axis) * t_loc
              if deriv_axis is not None else 0)
    part_jacs = [p.jac for p in parts]
    prec = fl._tprec()

    def channel_chunk(g, c0, d):
        s, spin = d["s"], d["spin"]
        ndet, norb, nparam = d["ndet"], d["norb"], d["nparam"]
        jr = None
        for pj, wp in zip(part_jacs, d["w_parts"]):
            sl = jax.lax.dynamic_slice_in_dim(pj, c0, tc, axis=0)
            contrib = jnp.matmul(sl[:, s:s + spin, :], wp, precision=prec)
            jr = contrib if jr is None else jr + contrib
        if d["jbc"] is not None:
            jr = jr + jax.lax.dynamic_slice_in_dim(
                d["jbc"], c0, tc, axis=0)[:, None, :]
        jc = jax.lax.complex(jr[..., :nparam], jr[..., nparam:])
        # (tc, spin, nparam) -> (tc, ndet, spin, norb)
        jc = jc.reshape(tc, spin, ndet, norb).swapaxes(1, 2)
        # row-local envelope*phase product on this chunk's slab rows:
        # global tangent row g corresponds to electron i_g = g//3 - s
        # (component g%3) of this channel — mirror of fl.mul_row
        i_g = g // 3 - s
        comp = g % 3
        valid = (i_g >= 0) & (i_g < spin)
        i_cl = jnp.clip(i_g, 0, spin - 1)
        bj_row = d["ep_jac3_sw"][comp, :, i_cl, :]       # (tc, ndet, norb)
        av_row = jnp.moveaxis(d["orb_val0"][:, i_cl, :], 1, 0)
        u = av_row * bj_row                              # (tc, ndet, norb)
        rowsel = ((i_cl[:, None] == jnp.arange(spin)[None])
                  & valid[:, None]).astype(jr.dtype)     # (tc, spin)
        jac_mat = (jc * d["ep_val_sw"][None]
                   + rowsel[:, None, :, None] * u[:, :, None, :])
        # Laplacian cross term: pairs the chunk's slab-diagonal jac rows
        # with the row-local factor's jac
        g_rows = jc[jnp.arange(tc), :, i_cl, :]          # (tc, ndet, norb)
        cross_c = jnp.einsum("tdf,ts->dsf", g_rows * bj_row, rowsel)
        return jac_mat, cross_c

    def body(carry, c):
        l2s, crosses = carry
        c0 = c * tc
        g = shard0 + c0 + jnp.arange(tc)
        chunks, new_crosses = [], []
        for ci, d in enumerate(ing):
            jac_mat, cross_c = channel_chunk(g, c0, d)
            chunks.append(jac_mat)
            new_crosses.append(crosses[ci] + cross_c)
        mats_chunks = ([jnp.concatenate(chunks, axis=2)] if full_det
                       else chunks)
        trbs, new_l2s = [], []
        for mi, (jm, fac) in enumerate(zip(mats_chunks, facs)):
            ndet, nm = jm.shape[1], jm.shape[2]
            j2c = jnp.moveaxis(jm, 0, -2).reshape(ndet, nm, tc * nm)
            trb_c, l2_c = fl.det_trace_chunk(fac[0], j2c, tc, nm,
                                             lead=(ndet,))
            trbs.append(trb_c)
            new_l2s.append(l2s[mi] + l2_c)
        return (tuple(new_l2s), tuple(new_crosses)), tuple(trbs)

    cdtype = mats0[0].val.dtype
    init = (
        tuple(jnp.zeros((m.val.shape[0],), cdtype) for m in mats0),
        tuple(jnp.zeros(d["orb_val0"].shape, cdtype) for d in ing),
    )
    (l2s, crosses), trbs = jax.lax.scan(
        body, init, jnp.arange(steps), length=steps)

    sign_total = None
    l_total = None
    for mi, (m0, (a_inv, sign, logdet)) in enumerate(zip(mats0, facs)):
        cross = (jnp.concatenate(crosses, axis=1) if full_det
                 else crosses[mi])
        if deriv_axis is not None:
            cross = jax.lax.psum(cross, deriv_axis)
        mat_lap = m0.lap + 2.0 * cross
        lap1 = jnp.sum(a_inv * jnp.swapaxes(mat_lap, -1, -2),
                       axis=(-1, -2))
        lap2 = l2s[mi]
        if deriv_axis is not None:
            lap2 = jax.lax.psum(lap2, deriv_axis)
        jac = trbs[mi].reshape(t_loc, -1)  # step-major == tangent order
        l = fl.Jet(logdet, jac, lap1 - lap2)
        if l_total is None:
            sign_total, l_total = sign, l
        else:
            sign_total = sign_total * sign
            l_total = fl.add(l_total, l)
    return sign_total, l_total


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
