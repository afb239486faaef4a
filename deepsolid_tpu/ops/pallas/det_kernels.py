"""Pallas TPU kernel: lane-batched complex matrix inverse + slogdet.

The forward-Laplacian det head (ops/fwdlap.slogdet_jet) needs, per
orbital matrix A, the explicit inverse A^-1 (for the batched tangent
products A^-1 J_t and the Laplacian trace) and slogdet(A). XLA's TPU LU
(`lu_factor`/`lu_solve`) runs one sequential elimination per matrix with
pivot gathers that serialize on the scalar unit — lane-hostile for the
many-small-matrix shape of VMC (batch x ndet matrices of size
n_electrons-per-spin; ROADMAP item 5, round-2 VERDICT #1).

This kernel instead lays the MATRIX BATCH across the 128 VPU lanes and
the matrix elements across (sublane-rows, cols): one Gauss-Jordan
elimination with per-lane partial pivoting runs all 128 matrices of a
lane block simultaneously — every step is a handful of elementwise
(n, n, 128) VPU ops, with no cross-lane traffic. Per-lane row pivoting
uses masked max/select instead of gathers; the row-swap history is
unscrambled by per-lane column swaps at the end (the classic in-place
Gauss-Jordan bookkeeping, vectorized over lanes).

Numerics match LAPACK-grade partial pivoting: the pivot is the largest
|A[r, k]| among unused rows, per lane. logdet accumulates as
sum log|piv| and the complex sign as prod(piv/|piv|) * (-1)^swaps.

The reference implements none of this: its det head calls cuSOLVER-via-XLA
per walker (DeepSolid/network.py:375-392 slogdet_op); there is no
reference counterpart file.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _lane_block(n_pad: int) -> int:
    """Lanes per grid step: full 128 when the (n, n, lanes) planes plus
    elementwise temporaries fit VMEM, halved otherwise; env-tunable."""
    env = os.environ.get("DEEPSOLID_TPU_DET_BLOCK_B", "")
    if env:
        return int(env)
    bl = 128
    # ~8 live (n, n, bl) f32 arrays: in+out planes and the elimination
    # temporaries of one step, under a ~12 MB VMEM budget
    while bl > 16 and n_pad * n_pad * 4 * 8 * bl > 12e6:
        bl //= 2
    return bl


def _gj_kernel(ar_ref, ai_ref, ar_o, ai_o, acc_o, m_scr, *, n_pad):
    """One lane block: in-place Gauss-Jordan inverse of 128 complex
    matrices stored as real/imag (n_pad, n_pad, bl) planes."""
    bl = ar_ref.shape[-1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1, bl), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad, bl), 1)

    # working copy; accumulators: row 0 = log|det|, 1 = Re sign, 2 = Im sign
    ar_o[:] = ar_ref[:]
    ai_o[:] = ai_ref[:]
    acc_o[:] = jnp.zeros_like(acc_o)
    acc_o[1:2, :] = jnp.ones_like(acc_o[1:2, :])

    # NOTE on lowering: dynamic indexing only ever rides the UNTILED
    # leading axis (rows of the (n, n, lanes) planes; dim 0 of the 3-D
    # m_scr scratch). Columns — the sublane axis — are always selected by
    # masked reductions, which Mosaic vectorizes unconditionally.

    def fwd(k, _):
        is_k_col = iota_c == k
        # column k via masked reduction over the sublane axis
        cr = jnp.sum(jnp.where(is_k_col, ar_o[:], 0.0), axis=1,
                     keepdims=True)  # (n, 1, bl)
        ci = jnp.sum(jnp.where(is_k_col, ai_o[:], 0.0), axis=1,
                     keepdims=True)

        # per-lane partial pivot among rows >= k
        unused = iota_r >= k
        mag = jnp.where(unused, cr * cr + ci * ci, -1.0)
        mx = jnp.max(mag, axis=0, keepdims=True)
        is_max = jnp.logical_and(mag == mx, unused)
        m = jnp.min(jnp.where(is_max, iota_r, n_pad), axis=0, keepdims=True)
        m_scr[pl.ds(k, 1)] = m  # (1, 1, bl)

        onehot_m = iota_r == m      # (n, 1, bl)
        is_k_row = iota_r == k

        piv_r = jnp.sum(jnp.where(onehot_m, cr, 0.0), axis=0, keepdims=True)
        piv_i = jnp.sum(jnp.where(onehot_m, ci, 0.0), axis=0, keepdims=True)
        den = piv_r * piv_r + piv_i * piv_i
        inv_den = 1.0 / den
        dr = piv_r * inv_den        # d = 1 / piv
        di = -piv_i * inv_den

        # slogdet accumulators
        sw = jnp.where(m == k, 1.0, -1.0).astype(jnp.float32)
        rs = jax.lax.rsqrt(den) * sw
        la = acc_o[0:1, :] + 0.5 * jnp.log(den).reshape(1, bl)
        sr = acc_o[1:2, :]
        si = acc_o[2:3, :]
        pr2 = piv_r.reshape(1, bl)
        pi2 = piv_i.reshape(1, bl)
        rs2 = rs.reshape(1, bl)
        acc_o[0:1, :] = la
        acc_o[1:2, :] = (sr * pr2 - si * pi2) * rs2
        acc_o[2:3, :] = (sr * pi2 + si * pr2) * rs2

        # pivot row (extracted before the swap) and old row k
        prow_r = jnp.sum(jnp.where(onehot_m, ar_o[:], 0.0), axis=0,
                         keepdims=True)                      # (1, n, bl)
        prow_i = jnp.sum(jnp.where(onehot_m, ai_o[:], 0.0), axis=0,
                         keepdims=True)
        rowk_r = ar_o[pl.ds(k, 1), :, :]                     # (1, n, bl)
        rowk_i = ai_o[pl.ds(k, 1), :, :]

        # scaled pivot row d * prow
        ps_r = prow_r * dr - prow_i * di
        ps_i = prow_r * di + prow_i * dr

        # multiplier column f = (swapped A)[:, k]; row k's entry unused
        ckk_r = jnp.sum(jnp.where(is_k_row, cr, 0.0), axis=0, keepdims=True)
        ckk_i = jnp.sum(jnp.where(is_k_row, ci, 0.0), axis=0, keepdims=True)
        f_r = jnp.where(onehot_m, ckk_r, cr)                 # (n, 1, bl)
        f_i = jnp.where(onehot_m, ckk_i, ci)

        # row swap fused into the elimination update
        asw_r = jnp.where(onehot_m, rowk_r, ar_o[:])
        asw_i = jnp.where(onehot_m, rowk_i, ai_o[:])
        elim_r = asw_r - (f_r * ps_r - f_i * ps_i)
        elim_i = asw_i - (f_r * ps_i + f_i * ps_r)
        new_r = jnp.where(is_k_row, ps_r, elim_r)
        new_i = jnp.where(is_k_row, ps_i, elim_i)
        # column k holds the inverse's multipliers: -f*d (d at the pivot)
        nfd_r = -(f_r * dr - f_i * di)
        nfd_i = -(f_r * di + f_i * dr)
        new_r = jnp.where(is_k_col, jnp.where(is_k_row, dr, nfd_r), new_r)
        new_i = jnp.where(is_k_col, jnp.where(is_k_row, di, nfd_i), new_i)
        ar_o[:] = new_r
        ai_o[:] = new_i
        return 0

    jax.lax.fori_loop(0, n_pad, fwd, 0)

    # unscramble: (PA)^-1 -> A^-1 by column swaps in reverse pivot order
    def unscramble(t, _):
        j = n_pad - 1 - t
        mj = m_scr[pl.ds(j, 1)]  # (1, 1, bl)
        oc = iota_c == mj
        is_j_col = iota_c == j
        colj_r = jnp.sum(jnp.where(is_j_col, ar_o[:], 0.0), axis=1,
                         keepdims=True)
        colj_i = jnp.sum(jnp.where(is_j_col, ai_o[:], 0.0), axis=1,
                         keepdims=True)
        colm_r = jnp.sum(jnp.where(oc, ar_o[:], 0.0), axis=1, keepdims=True)
        colm_i = jnp.sum(jnp.where(oc, ai_o[:], 0.0), axis=1, keepdims=True)
        ar_o[:] = jnp.where(is_j_col, colm_r, jnp.where(oc, colj_r, ar_o[:]))
        ai_o[:] = jnp.where(is_j_col, colm_i, jnp.where(oc, colj_i, ai_o[:]))
        return 0

    jax.lax.fori_loop(0, n_pad, unscramble, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gj_flat(a: jnp.ndarray, interpret: bool = False):
    """(B, n, n) complex64 -> (A^-1 (B, n, n), sign (B,), log|det| (B,))."""
    b, n, _ = a.shape
    n_pad = _round_up(max(n, 8), 8)
    bl = _lane_block(n_pad)
    b_pad = _round_up(max(b, bl), bl)

    # pad extra rows/cols and extra lanes with identity blocks: they pick
    # pivot 1 at their own step (log|1| = 0, no swaps) and perturb nothing
    base = jnp.broadcast_to(
        jnp.eye(n_pad, dtype=jnp.float32), (b_pad, n_pad, n_pad)
    )
    ar = base.at[:b, :n, :n].set(a.real)
    ai = jnp.zeros((b_pad, n_pad, n_pad), jnp.float32).at[:b, :n, :n].set(
        a.imag
    )
    ar = ar.transpose(1, 2, 0)  # (n, n, B): batch across lanes
    ai = ai.transpose(1, 2, 0)

    grid = (b_pad // bl,)
    plane = pl.BlockSpec((n_pad, n_pad, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    ar_o, ai_o, acc = pl.pallas_call(
        functools.partial(_gj_kernel, n_pad=n_pad),
        grid=grid,
        in_specs=[plane, plane],
        out_specs=[
            plane,
            plane,
            pl.BlockSpec((8, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n_pad, 1, bl), jnp.int32)],
        interpret=interpret,
    )(ar, ai)

    a_inv = jax.lax.complex(ar_o, ai_o).transpose(2, 0, 1)[:b, :n, :n]
    sign = jax.lax.complex(acc[1], acc[2])[:b]
    logabs = acc[0][:b]
    return a_inv, sign, logabs


def _make_entry(interpret: bool):
    """Entry with a custom vmap rule: a (..., n, n) complex64 ->
    (a_inv (..., n, n), sign (...,), log|det| (...,)).

    All leading dims flatten into the lane batch; the vmap rule keeps
    OUTER vmaps (walker batching in the kinetic path) flattening into
    lanes instead of looping the kernel grid one matrix at a time.
    """

    @jax.custom_batching.custom_vmap
    def entry(a: jnp.ndarray):
        batch = a.shape[:-2]
        n = a.shape[-1]
        a_inv, sign, logabs = _gj_flat(
            a.reshape((-1, n, n)), interpret=interpret
        )
        return (
            a_inv.reshape(batch + (n, n)),
            sign.reshape(batch),
            logabs.reshape(batch),
        )

    @entry.def_vmap
    def _rule(axis_size, in_batched, a):
        if not in_batched[0]:
            # closed-over operand: replicate to the vmap axis so the
            # declared batched outputs carry the right leading dim
            a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        out = entry(a)
        return out, (True, True, True)

    return entry


gj_inverse_slogdet = _make_entry(False)
# interpreter-mode entry: CPU tests of the kernel and of the integrated
# det-head path (ops/fwdlap.set_det_kernel('interpret'))
gj_inverse_slogdet_interpret = _make_entry(True)


def gj_inverse_slogdet_reference(a):
    """jnp oracle with the same signature."""
    sign, logabs = jnp.linalg.slogdet(a)
    return jnp.linalg.inv(a), sign, logabs
