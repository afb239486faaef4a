"""Pallas TPU kernels for forward-Laplacian jet propagation.

The hot op of the fwdlap trunk is the fused dense+tanh jet rule:
    z      = val @ w + b            t = tanh(z)   d = 1 - t^2
    jac_o  = d * (jac @ w)                        (T, n, d_out)
    lap_o  = d * (lap @ w) + (-2 t d) * sum_t (jac @ w)^2

Unfused, the (T, n, d_out) intermediate jac@w is written to HBM by the
matmul and re-read twice (scaling by d; squared reduction over T). The
kernel streams T-chunks of jac through VMEM, accumulating the square-sum
in scratch, so the biggest tensor of the layer crosses HBM exactly once.

Grid layout: (n_blocks, col_blocks, t_chunks) with t innermost — scratch
accumulators persist across the sequential TPU grid, reset at t == 0 and
flushed into lap_o at the last t chunk.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _default_block_t():
    """Tangent-chunk rows per kernel grid step. Larger blocks mean fewer
    sequential grid iterations and a taller MXU matmul per step at the
    cost of VMEM (jac in + jac out = 2 * bt * bn * 128 lanes * 4B);
    env-tunable for on-chip sweeps."""
    import os

    return int(os.environ.get("DEEPSOLID_TPU_JET_BLOCK_T", "8"))


def _default_block_c():
    """Output-column block per grid step. The jac input block is re-read
    once per column block (its index map ignores the column index), so a
    wider bc cuts the dominant HBM stream's read count at the cost of
    VMEM for the (bt, bn, bc) jac output block; env-tunable for sweeps."""
    import os

    return int(os.environ.get("DEEPSOLID_TPU_JET_BLOCK_C", "128"))


def _pick_bn(n: int, block_n) -> int:
    """Electron-row block size for one grid step.

    'auto' picks, among multiples of 8 up to 128, the bn whose
    round_up(n, bn) padding is minimal (largest such bn on ties): the
    row dimension is electrons-per-walker, which is rarely a power of
    two — e.g. n=96 (C-diamond 2x2x2) gets bn=96 / zero padded rows
    where a fixed bn=64 padded to 128 (33% wasted MXU rows and HBM
    stream), and n=162 (bcc-Li 3x3x3) gets bn=56 / 6 padded rows
    instead of 64 / 30. An integer (or DEEPSOLID_TPU_JET_BLOCK_N)
    forces the legacy fixed-size behavior for sweeps."""
    if block_n is None or block_n == "auto":
        import os

        env = os.environ.get("DEEPSOLID_TPU_JET_BLOCK_N", "auto")
        block_n = env if env == "auto" else int(env)
    if block_n != "auto":
        return min(int(block_n), _round_up(n, 8))
    best_bn, best_pad = 8, None
    for bn in range(8, 129, 8):
        pad = _round_up(n, bn) - n
        if best_pad is None or pad <= best_pad:
            best_bn, best_pad = bn, pad
    return best_bn


def _kernel(val_ref, lap_ref, jac_ref, w_ref, b_ref,
            val_o_ref, lap_o_ref, jac_o_ref, acc_ref, t_scr_ref,
            *, jac_precision=jax.lax.Precision.HIGHEST):
    tk = pl.program_id(2)
    n_tk = pl.num_programs(2)
    w = w_ref[:]

    @pl.when(tk == 0)
    def _():
        z = jnp.dot(val_ref[:], w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = z + b_ref[:]
        t = jnp.tanh(z)
        t_scr_ref[:] = t
        val_o_ref[:] = t.astype(val_o_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = t_scr_ref[:]
    d = 1.0 - t * t

    # one batched matmul over the whole t-chunk (MXU-friendly); the
    # tangent block may ride a cheaper precision tier than the value
    # pass (ops/fwdlap.set_tangent_precision)
    yj = jax.lax.dot_general(
        jac_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jac_precision,
    )  # (bt, bn, bc)
    jac_o_ref[:] = (d[None] * yj).astype(jac_o_ref.dtype)
    acc_ref[:] += jnp.sum(yj * yj, axis=0)

    @pl.when(tk == n_tk - 1)
    def _():
        yl = jnp.dot(lap_ref[:], w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        out = d * yl + (-2.0 * t * d) * acc_ref[:]
        lap_o_ref[:] = out.astype(lap_o_ref.dtype)


def _kernel_partial(val_ref, lap_ref, jac_ref, w_ref, b_ref,
                    val_o_ref, lap_o_ref, jac_o_ref, s_o_ref,
                    acc_ref, t_scr_ref,
                    *, jac_precision=jax.lax.Precision.HIGHEST):
    """Like _kernel, but the tangent-square reduction is emitted as a
    separate output `s` instead of folded into lap — for a device-sharded
    tangent axis, where the caller must psum `s` across the mesh before
    forming lap = d*(lap@w) + (-2 t d) * psum(s)."""
    tk = pl.program_id(2)
    n_tk = pl.num_programs(2)
    w = w_ref[:]

    @pl.when(tk == 0)
    def _():
        z = jnp.dot(val_ref[:], w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = z + b_ref[:]
        t = jnp.tanh(z)
        t_scr_ref[:] = t
        val_o_ref[:] = t.astype(val_o_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = t_scr_ref[:]
    d = 1.0 - t * t

    yj = jax.lax.dot_general(
        jac_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jac_precision,
    )  # (bt, bn, bc)
    jac_o_ref[:] = (d[None] * yj).astype(jac_o_ref.dtype)
    acc_ref[:] += jnp.sum(yj * yj, axis=0)

    @pl.when(tk == n_tk - 1)
    def _():
        yl = jnp.dot(lap_ref[:], w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        lap_o_ref[:] = (d * yl).astype(lap_o_ref.dtype)
        s_o_ref[:] = acc_ref[:].astype(s_o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_c", "block_t", "jac_precision"),
)
def fused_dense_tanh_jet_partial(
    val: jnp.ndarray,   # (n, d_in)
    jac: jnp.ndarray,   # (T_local, n, d_in) — this device's tangent slice
    lap: jnp.ndarray,   # (n, d_in)
    w: jnp.ndarray,     # (d_in, d_out)
    b: jnp.ndarray,     # (d_out,)
    block_n=None,
    block_c: int | None = None,
    block_t: int | None = None,
    jac_precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(val_out, jac_out, lap_part, s_local) of the tanh(dense(.)) jet
    rule with the tangent reduction left open:
        lap_out = lap_part + (-2 val_out (1 - val_out^2)) * SUM(s_local)
    where SUM runs over every device's s_local (psum over the 'deriv'
    mesh axis; see ops/fwdlap.dense_tanh)."""
    t_dim, n, d_in = jac.shape
    d_out = w.shape[1]
    bn = _pick_bn(n, block_n)
    if block_c is None:
        block_c = _default_block_c()
    bc = min(block_c, _round_up(d_out, 128))
    if block_t is None:
        block_t = _default_block_t()
    bt = min(block_t, t_dim)

    n_pad = _round_up(n, bn)
    c_pad = _round_up(d_out, bc)
    k_pad = _round_up(d_in, 128)
    t_pad = _round_up(t_dim, bt)

    def pad(x, shape):
        # aligned shapes skip the materialized HBM copy entirely — with
        # auto block_n this is the common case for the one-stream jets
        # (the biggest tensor of the layer would otherwise cross HBM an
        # extra 2x: zero-fill + copy on the way in, slice on the way out)
        if tuple(x.shape) == tuple(shape):
            return x
        out = jnp.zeros(shape, x.dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    valp = pad(val, (n_pad, k_pad))
    lapp = pad(lap, (n_pad, k_pad))
    jacp = pad(jac, (t_pad, n_pad, k_pad))
    wp = pad(w, (k_pad, c_pad))
    bp = pad(b.reshape(1, -1), (1, c_pad))

    grid = (n_pad // bn, c_pad // bc, t_pad // bt)
    val_o, lap_o, jac_o, s_o = pl.pallas_call(
        functools.partial(_kernel_partial, jac_precision=jac_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, k_pad), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k_pad), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, k_pad), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bc), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, bc), lambda i, j, k: (k, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((t_pad, n_pad, c_pad), jac.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, bc), jnp.float32),
            pltpu.VMEM((bn, bc), jnp.float32),
        ],
    )(valp, lapp, jacp, wp, bp)

    return (
        val_o[:n, :d_out],
        jac_o[:t_dim, :n, :d_out],
        lap_o[:n, :d_out],
        s_o[:n, :d_out],
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_c", "block_t", "jac_precision"),
)
def fused_dense_tanh_jet(
    val: jnp.ndarray,   # (n, d_in)
    jac: jnp.ndarray,   # (T, n, d_in)
    lap: jnp.ndarray,   # (n, d_in)
    w: jnp.ndarray,     # (d_in, d_out)
    b: jnp.ndarray,     # (d_out,)
    block_n=None,
    block_c: int | None = None,
    block_t: int | None = None,
    jac_precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(val_out, jac_out, lap_out) of the tanh(dense(.)) jet rule."""
    t_dim, n, d_in = jac.shape
    d_out = w.shape[1]
    bn = _pick_bn(n, block_n)
    if block_c is None:
        block_c = _default_block_c()
    bc = min(block_c, _round_up(d_out, 128))
    if block_t is None:
        block_t = _default_block_t()
    bt = min(block_t, t_dim)

    n_pad = _round_up(n, bn)
    c_pad = _round_up(d_out, bc)
    k_pad = _round_up(d_in, 128)
    t_pad = _round_up(t_dim, bt)

    def pad(x, shape):
        # aligned shapes skip the materialized HBM copy entirely — with
        # auto block_n this is the common case for the one-stream jets
        # (the biggest tensor of the layer would otherwise cross HBM an
        # extra 2x: zero-fill + copy on the way in, slice on the way out)
        if tuple(x.shape) == tuple(shape):
            return x
        out = jnp.zeros(shape, x.dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    valp = pad(val, (n_pad, k_pad))
    lapp = pad(lap, (n_pad, k_pad))
    jacp = pad(jac, (t_pad, n_pad, k_pad))
    wp = pad(w, (k_pad, c_pad))
    bp = pad(b.reshape(1, -1), (1, c_pad))

    grid = (n_pad // bn, c_pad // bc, t_pad // bt)
    val_o, lap_o, jac_o = pl.pallas_call(
        functools.partial(_kernel, jac_precision=jac_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, k_pad), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k_pad), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, k_pad), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bc), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, bc), lambda i, j, k: (k, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((t_pad, n_pad, c_pad), jac.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, bc), jnp.float32),
            pltpu.VMEM((bn, bc), jnp.float32),
        ],
    )(valp, lapp, jacp, wp, bp)

    return (
        val_o[:n, :d_out],
        jac_o[:t_dim, :n, :d_out],
        lap_o[:n, :d_out],
    )


def dense_tanh_jet_reference(val, jac, lap, w, b):
    """jnp reference implementation of the same fused rule."""
    z = val @ w + b
    t = jnp.tanh(z)
    d = 1.0 - t * t
    yj = jac @ w
    return t, d * yj, d * (lap @ w) + (-2.0 * t * d) * jnp.sum(yj * yj, axis=0)


# ---------------------------------------------------------------------------
# mix variant: row-varying dense input + row-CONSTANT broadcast input
# ---------------------------------------------------------------------------
#
# The one-stream mixing concatenates [h1 | mean_per_channel(h1) | pair
# means]; the mean blocks are identical for every electron row, yet the
# plain path tiles them to (T, n, f) and pushes them through the full
# (T*n, f) @ (f, d_out) jac matmul — ~60% of the layer's MXU work and HBM
# traffic multiplying row-constant data (ROADMAP item 6). Here the
# row-constant block is pre-contracted OUTSIDE the kernel at (T, 1, f_rc)
# cost and enters as per-tangent broadcast vectors:
#     z   = val @ w + zbc + b
#     yj  = jac @ w + jbc[t]            (broadcast over rows)
#     yl  = lap @ w + lbc
# with the tanh jet rule applied to the totals.


def _kernel_mix(val_ref, lap_ref, jac_ref, w_ref, b_ref, zbc_ref, lbc_ref,
                jbc_ref, val_o_ref, lap_o_ref, jac_o_ref, acc_ref,
                t_scr_ref, *, jac_precision=jax.lax.Precision.HIGHEST):
    tk = pl.program_id(2)
    n_tk = pl.num_programs(2)
    w = w_ref[:]

    @pl.when(tk == 0)
    def _():
        z = jnp.dot(val_ref[:], w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = z + b_ref[:] + zbc_ref[:]
        t = jnp.tanh(z)
        t_scr_ref[:] = t
        val_o_ref[:] = t.astype(val_o_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = t_scr_ref[:]
    d = 1.0 - t * t

    yj = jax.lax.dot_general(
        jac_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jac_precision,
    )  # (bt, bn, bc)
    yj = yj + jbc_ref[:][:, None, :]
    jac_o_ref[:] = (d[None] * yj).astype(jac_o_ref.dtype)
    acc_ref[:] += jnp.sum(yj * yj, axis=0)

    @pl.when(tk == n_tk - 1)
    def _():
        yl = jnp.dot(lap_ref[:], w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        out = d * (yl + lbc_ref[:]) + (-2.0 * t * d) * acc_ref[:]
        lap_o_ref[:] = out.astype(lap_o_ref.dtype)


def _kernel_mix_partial(val_ref, lap_ref, jac_ref, w_ref, b_ref, zbc_ref,
                        lbc_ref, jbc_ref, val_o_ref, lap_o_ref, jac_o_ref,
                        s_o_ref, acc_ref, t_scr_ref,
                        *, jac_precision=jax.lax.Precision.HIGHEST):
    """Mix kernel with the tangent-square reduction left open (sharded
    tangent axis; see fused_dense_tanh_jet_partial)."""
    tk = pl.program_id(2)
    n_tk = pl.num_programs(2)
    w = w_ref[:]

    @pl.when(tk == 0)
    def _():
        z = jnp.dot(val_ref[:], w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = z + b_ref[:] + zbc_ref[:]
        t = jnp.tanh(z)
        t_scr_ref[:] = t
        val_o_ref[:] = t.astype(val_o_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = t_scr_ref[:]
    d = 1.0 - t * t

    yj = jax.lax.dot_general(
        jac_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jac_precision,
    )
    yj = yj + jbc_ref[:][:, None, :]
    jac_o_ref[:] = (d[None] * yj).astype(jac_o_ref.dtype)
    acc_ref[:] += jnp.sum(yj * yj, axis=0)

    @pl.when(tk == n_tk - 1)
    def _():
        yl = jnp.dot(lap_ref[:], w, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        lap_o_ref[:] = (d * (yl + lbc_ref[:])).astype(lap_o_ref.dtype)
        s_o_ref[:] = acc_ref[:].astype(s_o_ref.dtype)


def _fused_mix_call(kernel, n_outs, val, jac, lap, zbc, lbc, jbc, w, b,
                    block_n, block_c, block_t,
                    jac_precision=jax.lax.Precision.HIGHEST):
    t_dim, n, d_in = jac.shape
    d_out = w.shape[1]
    bn = _pick_bn(n, block_n)
    if block_c is None:
        block_c = _default_block_c()
    bc = min(block_c, _round_up(d_out, 128))
    if block_t is None:
        block_t = _default_block_t()
    bt = min(block_t, t_dim)

    n_pad = _round_up(n, bn)
    c_pad = _round_up(d_out, bc)
    k_pad = _round_up(d_in, 128)
    t_pad = _round_up(t_dim, bt)

    def pad(x, shape):
        # aligned shapes skip the materialized HBM copy entirely — with
        # auto block_n this is the common case for the one-stream jets
        # (the biggest tensor of the layer would otherwise cross HBM an
        # extra 2x: zero-fill + copy on the way in, slice on the way out)
        if tuple(x.shape) == tuple(shape):
            return x
        out = jnp.zeros(shape, x.dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    valp = pad(val, (n_pad, k_pad))
    lapp = pad(lap, (n_pad, k_pad))
    jacp = pad(jac, (t_pad, n_pad, k_pad))
    wp = pad(w, (k_pad, c_pad))
    bp = pad(b.reshape(1, -1), (1, c_pad))
    zbcp = pad(zbc.reshape(1, -1), (1, c_pad))
    lbcp = pad(lbc.reshape(1, -1), (1, c_pad))
    jbcp = pad(jbc, (t_pad, c_pad))

    grid = (n_pad // bn, c_pad // bc, t_pad // bt)
    row_spec = pl.BlockSpec((bn, k_pad), lambda i, j, k: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, bc), lambda i, j, k: (0, j),
                            memory_space=pltpu.VMEM)
    nc_spec = pl.BlockSpec((bn, bc), lambda i, j, k: (i, j),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, jac_precision=jac_precision),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((bt, bn, k_pad), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bc), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            vec_spec,
            vec_spec,
            vec_spec,
            pl.BlockSpec((bt, bc), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[nc_spec, nc_spec,
                   pl.BlockSpec((bt, bn, bc), lambda i, j, k: (k, i, j),
                                memory_space=pltpu.VMEM)] +
                  [nc_spec] * (n_outs - 3),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype),
            jax.ShapeDtypeStruct((t_pad, n_pad, c_pad), jac.dtype),
        ] + [jax.ShapeDtypeStruct((n_pad, c_pad), val.dtype)] * (n_outs - 3),
        scratch_shapes=[
            pltpu.VMEM((bn, bc), jnp.float32),
            pltpu.VMEM((bn, bc), jnp.float32),
        ],
    )(valp, lapp, jacp, wp, bp, zbcp, lbcp, jbcp)
    return outs, (n, d_out, t_dim)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_c", "block_t", "jac_precision"),
)
def fused_dense_tanh_jet_mix(
    val, jac, lap,       # row-varying parts: (n, d_in), (T, n, d_in), (n, d_in)
    zbc, lbc, jbc,       # row-constant contractions: (d_out,), (d_out,), (T, d_out)
    w, b,                # (d_in, d_out), (d_out,)
    block_n=None,
    block_c: int | None = None,
    block_t: int | None = None,
    jac_precision=jax.lax.Precision.HIGHEST,
):
    """(val_out, jac_out, lap_out) of tanh(dense_rv(.) + broadcast(.))."""
    (val_o, lap_o, jac_o), (n, d_out, t_dim) = _fused_mix_call(
        _kernel_mix, 3, val, jac, lap, zbc, lbc, jbc, w, b,
        block_n, block_c, block_t, jac_precision,
    )
    return val_o[:n, :d_out], jac_o[:t_dim, :n, :d_out], lap_o[:n, :d_out]


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_c", "block_t", "jac_precision"),
)
def fused_dense_tanh_jet_mix_partial(
    val, jac, lap, zbc, lbc, jbc, w, b,
    block_n=None,
    block_c: int | None = None,
    block_t: int | None = None,
    jac_precision=jax.lax.Precision.HIGHEST,
):
    """Mix kernel emitting (val_out, jac_out, lap_part, s_local) for a
    device-sharded tangent axis (psum s before closing the lap)."""
    (val_o, lap_o, jac_o, s_o), (n, d_out, t_dim) = _fused_mix_call(
        _kernel_mix_partial, 4, val, jac, lap, zbc, lbc, jbc, w, b,
        block_n, block_c, block_t, jac_precision,
    )
    return (val_o[:n, :d_out], jac_o[:t_dim, :n, :d_out],
            lap_o[:n, :d_out], s_o[:n, :d_out])
