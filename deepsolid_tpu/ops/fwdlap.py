"""Forward-Laplacian jet algebra.

Propagates triples (value, Jacobian, Laplacian) — "jets" — through the
network in ONE forward pass, so the kinetic energy costs one traversal with
a tangent batch axis (MXU-friendly batched matmuls) instead of the 3N
re-traversals of JVP-of-grad engines, and ONE LU factorization per
determinant instead of 3N (the dominant O(N^3) saving; cf. the
forward-Laplacian method of arXiv:2307.08214).

Jet conventions:
  val: array of shape S
  jac: array of shape (T,) + S — derivatives along T tangent directions.
       T = 3N for dense jets; T = 3 for electron-sparse rows (derivative
       wrt that row's own electron); T = 6 for pair-sparse (wrt r_i, r_j).
  lap: array of shape S — FULL Laplacian over all 3N coordinates (the
       representation of jac does not change what lap means).

Sparse reps exist because the two-electron stream never mixes pairs: each
h2[i, j] stays a function of (r_i, r_j) through every double layer, so its
Jacobian has 6 meaningful directions, not 3N. Mixing (means over rows)
converts sparse jets to dense ones (see to_dense_* functions).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


_TANGENT_PRECISION = None  # None = inherit jax_default_matmul_precision

_JET_STORAGE = None  # None = resolve from env (default f32); 'f32'|'bf16'

_WARNED_ENVS = set()


def env_flag(name, valid, default=""):
    """Read an on/off-style env gate, warning ONCE on unrecognized
    values ('1', 'true', 'ON', ...) instead of silently treating them
    as the default (ADVICE r4: an operator forcing a kernel with =1
    must not silently get the off path)."""
    import os

    val = os.environ.get(name, "")
    if val and val not in valid:
        if name not in _WARNED_ENVS:
            _WARNED_ENVS.add(name)
            import logging

            logging.warning(
                "%s=%r not recognized (valid: %s); using default %r",
                name, val, "|".join(sorted(valid)), default or "auto",
            )
        return default
    return val or default


def set_jet_storage(d):
    """Storage dtype for the DENSE trunk tangent stream between layers.

    The (T=3N, n, 256) one-stream jacs are the largest tensors of the
    forward-Laplacian pass and the trunk is HBM-bandwidth-bound (round-4
    tangent-precision A/B: compute tier is a dead lever at 1.017x).
    'bf16' stores the jac between layers in bfloat16 — halving the
    dominant HBM stream — while ALL arithmetic stays f32: kernels upcast
    on read, the value/Laplacian paths and the tangent-square reductions
    are f32 throughout, so rounding enters only at the once-per-layer
    store. `d`: None/'auto' (env DEEPSOLID_TPU_JET_STORE, default f32),
    'f32', or 'bf16'."""
    global _JET_STORAGE
    if d in (None, "auto", ""):
        _JET_STORAGE = None
    elif d in ("f32", "float32"):
        _JET_STORAGE = "f32"
    elif d in ("bf16", "bfloat16"):
        _JET_STORAGE = "bf16"
    else:
        raise ValueError(f"jet_storage must be f32|bf16|auto, got {d!r}")


def _jet_store_dtype():
    """The dense-jac storage dtype, or None for full f32."""
    mode = _JET_STORAGE
    if mode is None:
        mode = env_flag("DEEPSOLID_TPU_JET_STORE",
                        {"f32", "float32", "bf16", "bfloat16"})
    return jnp.bfloat16 if mode in ("bf16", "bfloat16") else None


def store_jac(jac):
    """Cast a dense trunk jac to the configured storage dtype (no-op for
    f32 storage or non-float32 inputs — f64 runs stay exact)."""
    dt = _jet_store_dtype()
    if dt is None or jac.dtype != jnp.float32:
        return jac
    return jac.astype(dt)


def set_tangent_precision(p):
    """Matmul precision for the TANGENT-axis contractions only.

    The (T=3N, n, f) jac matmuls and the det head's batched A^-1 J_t
    products carry ~80% of the forward-Laplacian FLOPs; the VALUE path
    (which sets psi, the tanh linearization points and the LU) always
    stays at the session default ('highest' in production — the round-2
    H10 root cause). `p`: None (inherit default), 'highest' (bf16_6x),
    or 'high' (bf16_3x, ~2x MXU throughput on the tangent matmuls —
    opt-in via cfg.tangent_matmul_precision after f64 validation).
    """
    global _TANGENT_PRECISION
    _TANGENT_PRECISION = None if p in (None, "inherit") else jax.lax.Precision(p)


def _tprec():
    return _TANGENT_PRECISION


def _tsum(x, axis_name=None):
    """Sum over the (possibly device-sharded) tangent axis.

    With `axis_name` set, jac arrays hold only this device's tangent
    slice; cross-tangent contractions must psum over the mesh axis.
    """
    out = jnp.sum(x, axis=0)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Jet:
    val: jnp.ndarray
    jac: jnp.ndarray  # (T,) + val.shape
    lap: jnp.ndarray  # val.shape

    def tree_flatten(self):
        return (self.val, self.jac, self.lap), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def ntangent(self):
        return self.jac.shape[0]


# ---------------------------------------------------------------------------
# linear ops (same op on val/lap; vmapped over the tangent axis for jac)
# ---------------------------------------------------------------------------


def linear_op(op: Callable, *jets: Jet, **kwargs) -> Jet:
    """Applies a linear array op to a jet elementwise over components."""
    return Jet(
        val=op(*[j.val for j in jets], **kwargs),
        jac=jax.vmap(lambda *a: op(*a, **kwargs))(*[j.jac for j in jets]),
        lap=op(*[j.lap for j in jets], **kwargs),
    )


def add(a: Jet, b: Jet) -> Jet:
    return Jet(a.val + b.val, a.jac + b.jac, a.lap + b.lap)


def add_const(a: Jet, c) -> Jet:
    return Jet(a.val + c, a.jac, a.lap)


def scale(a: Jet, c) -> Jet:
    return Jet(a.val * c, a.jac * c, a.lap * c)


def reshape(a: Jet, shape) -> Jet:
    return Jet(
        a.val.reshape(shape),
        a.jac.reshape((a.jac.shape[0],) + tuple(shape)),
        a.lap.reshape(shape),
    )


def concat(jets: Sequence[Jet], axis: int) -> Jet:
    ax = axis if axis >= 0 else axis  # jac axis shifts by +1 for axis >= 0
    jac_axis = ax + 1 if ax >= 0 else ax
    return Jet(
        jnp.concatenate([j.val for j in jets], axis=ax),
        jnp.concatenate([j.jac for j in jets], axis=jac_axis),
        jnp.concatenate([j.lap for j in jets], axis=ax),
    )


def slice_axis(a: Jet, axis: int, start: int, stop: int) -> Jet:
    idx = [slice(None)] * a.val.ndim
    idx[axis] = slice(start, stop)
    idx = tuple(idx)
    jidx = (slice(None),) + idx
    return Jet(a.val[idx], a.jac[jidx], a.lap[idx])


def mean_axis(a: Jet, axis: int, keepdims: bool = False) -> Jet:
    return Jet(
        jnp.mean(a.val, axis=axis, keepdims=keepdims),
        jnp.mean(a.jac, axis=axis + 1 if axis >= 0 else axis, keepdims=keepdims),
        jnp.mean(a.lap, axis=axis, keepdims=keepdims),
    )


def sum_axis(a: Jet, axis: int, keepdims: bool = False) -> Jet:
    return Jet(
        jnp.sum(a.val, axis=axis, keepdims=keepdims),
        jnp.sum(a.jac, axis=axis + 1 if axis >= 0 else axis, keepdims=keepdims),
        jnp.sum(a.lap, axis=axis, keepdims=keepdims),
    )


def tile_rows(a: Jet, reps: int) -> Jet:
    """jnp.tile(x, [reps, 1]) for a (1, d)-shaped jet."""
    return Jet(
        jnp.tile(a.val, [reps, 1]),
        jnp.tile(a.jac, [1, reps, 1]),
        jnp.tile(a.lap, [reps, 1]),
    )


# ---------------------------------------------------------------------------
# nonlinear ops
# ---------------------------------------------------------------------------


def dense(a: Jet, w, b=None) -> Jet:
    """y = x @ w (+ b): Jacobian rides the MXU as a batched matmul."""
    val = a.val @ w
    if b is not None:
        val = val + b
    return Jet(val, jnp.matmul(a.jac, w, precision=_TANGENT_PRECISION),
               a.lap @ w)


def tanh(a: Jet, axis_name=None) -> Jet:
    t = jnp.tanh(a.val)
    d = 1.0 - t * t
    dd = -2.0 * t * d
    return Jet(t, d[None] * a.jac, d * a.lap + dd * _tsum(a.jac**2, axis_name))


_FUSED_DENSE_TANH = None  # None = auto (TPU + f32); True/False to force


def set_fused_kernels(enabled):
    """Force the Pallas fused dense+tanh jet kernel on or off (None=auto)."""
    global _FUSED_DENSE_TANH
    _FUSED_DENSE_TANH = enabled


def _use_fused(a: Jet, w) -> bool:
    if _FUSED_DENSE_TANH is not None:
        return _FUSED_DENSE_TANH
    # Default OFF since round 5: an interleaved-window on-chip A/B of the
    # C-diamond kinetic path (batch 256, el_chunk 64, 3 windows each) put
    # plain-XLA fusion at 146.5/159.0/158.6 walkers/s vs the Pallas
    # kernel's 128.6/128.4/128.4 — XLA's fusion of the jac matmul +
    # tanh' scaling + square-reduce now beats the handwritten pipeline by
    # ~1.2x at the production shape. The kernels stay available for A/B
    # via debug.fused_kernels='on' / set_fused_kernels(True).
    return False


def dense_tanh(a: Jet, w, b, axis_name=None) -> Jet:
    """Fused tanh(dense(.)) jet rule; Pallas kernel on TPU/f32 (keeps the
    (T, n, d_out) jac@w intermediate VMEM-resident), jnp composition
    elsewhere. With a device-sharded tangent axis (`axis_name`), the kernel
    emits its local tangent-square partial sum and the cross-device
    reduction rides one psum over the 'deriv' mesh axis."""
    if b is None or not _use_fused(a, w):
        out = tanh(dense(a, w, b), axis_name)
        # round-trip the storage dtype exactly like the kernel path: the
        # dense matmul upcasts a bf16-stored jac to f32, compute is f32,
        # and only the layer OUTPUT store rounds
        return Jet(out.val, out.jac.astype(a.jac.dtype), out.lap)
    from deepsolid_tpu.ops.pallas.jet_kernels import (
        fused_dense_tanh_jet,
        fused_dense_tanh_jet_partial,
    )

    t_dim = a.jac.shape[0]
    lead = a.val.shape[:-1]
    d_in = a.val.shape[-1]
    val2 = a.val.reshape(-1, d_in)
    jac2 = a.jac.reshape(t_dim, -1, d_in)
    lap2 = a.lap.reshape(-1, d_in)
    d_out = w.shape[-1]
    kprec = _TANGENT_PRECISION or jax.lax.Precision.HIGHEST
    if axis_name is None:
        v, j, l = fused_dense_tanh_jet(val2, jac2, lap2, w, b,
                                       jac_precision=kprec)
    else:
        v, j, lap_part, s_local = fused_dense_tanh_jet_partial(
            val2, jac2, lap2, w, b, jac_precision=kprec
        )
        s = jax.lax.psum(s_local, axis_name)
        l = lap_part + (-2.0 * v * (1.0 - v * v)) * s
    return Jet(
        v.reshape(lead + (d_out,)),
        j.reshape((t_dim,) + lead + (d_out,)),
        l.reshape(lead + (d_out,)),
    )


def dense_mix(a_rv: Jet, a_rc: Jet, w_rv, w_rc, b=None) -> Jet:
    """y = x_rv @ w_rv + broadcast_rows(x_rc @ w_rc) (+ b).

    `a_rc` is a ROW-CONSTANT jet (leading data axis of size 1, broadcast
    over the rows of `a_rv`): its contraction costs (T, 1, f_rc) instead
    of riding the full (T, n, f) jac matmul — the mean blocks of the
    one-stream mixing are row-constant by construction (ROADMAP item 6).
    """
    val = a_rv.val @ w_rv + a_rc.val @ w_rc
    if b is not None:
        val = val + b
    return Jet(
        val,
        jnp.matmul(a_rv.jac, w_rv, precision=_TANGENT_PRECISION)
        + jnp.matmul(a_rc.jac, w_rc, precision=_TANGENT_PRECISION),
        a_rv.lap @ w_rv + a_rc.lap @ w_rc,
    )


def dense_tanh_mix(a_rv: Jet, a_rc: Jet, w_rv, w_rc, b, axis_name=None) -> Jet:
    """tanh(dense_mix(.)) jet rule; Pallas mix kernel on TPU/f32.

    Same semantics as dense_tanh on the concatenation of (a_rv, tiled
    a_rc) with w rows stacked [w_rv; w_rc], without ever materializing
    the tiled row-constant block."""
    if b is None or not _use_fused(a_rv, w_rv):
        out = tanh(dense_mix(a_rv, a_rc, w_rv, w_rc, b), axis_name)
        return Jet(out.val, out.jac.astype(a_rv.jac.dtype), out.lap)
    from deepsolid_tpu.ops.pallas.jet_kernels import (
        fused_dense_tanh_jet_mix,
        fused_dense_tanh_jet_mix_partial,
    )

    t_dim = a_rv.jac.shape[0]
    lead = a_rv.val.shape[:-1]
    d_in = a_rv.val.shape[-1]
    d_out = w_rv.shape[-1]
    val2 = a_rv.val.reshape(-1, d_in)
    jac2 = a_rv.jac.reshape(t_dim, -1, d_in)
    lap2 = a_rv.lap.reshape(-1, d_in)
    # row-constant contractions (tiny: rows = 1)
    zbc = (a_rc.val @ w_rc).reshape(-1)
    lbc = (a_rc.lap @ w_rc).reshape(-1)
    jbc = (a_rc.jac @ w_rc).reshape(t_dim, d_out)
    kprec = _TANGENT_PRECISION or jax.lax.Precision.HIGHEST
    if axis_name is None:
        v, j, l = fused_dense_tanh_jet_mix(val2, jac2, lap2, zbc, lbc, jbc,
                                           w_rv, b, jac_precision=kprec)
    else:
        v, j, lap_part, s_local = fused_dense_tanh_jet_mix_partial(
            val2, jac2, lap2, zbc, lbc, jbc, w_rv, b, jac_precision=kprec
        )
        s = jax.lax.psum(s_local, axis_name)
        l = lap_part + (-2.0 * v * (1.0 - v * v)) * s
    return Jet(
        v.reshape(lead + (d_out,)),
        j.reshape((t_dim,) + lead + (d_out,)),
        l.reshape(lead + (d_out,)),
    )


def exp(a: Jet, axis_name=None) -> Jet:
    e = jnp.exp(a.val)
    return Jet(e, e[None] * a.jac, e * (a.lap + _tsum(a.jac**2, axis_name)))


def absolute(a: Jet) -> Jet:
    s = jnp.sign(a.val)
    return Jet(jnp.abs(a.val), s[None] * a.jac, s * a.lap)


def mul(a: Jet, b: Jet, axis_name=None) -> Jet:
    """Product rule; a and b must share the same tangent representation."""
    cross = 2.0 * _tsum(a.jac * b.jac, axis_name)
    return Jet(
        a.val * b.val,
        a.jac * b.val[None] + a.val[None] * b.jac,
        a.lap * b.val + a.val * b.lap + cross,
    )


def mul_row(a: Jet, b_val, b_jac3, b_lap, n_total: int, offset: int,
            axis_name=None) -> Jet:
    """Product jet of a dense-tangent jet with a ROW-LOCAL factor.

    `a.val` has shape (D, rows, F) (rows = electrons of one spin channel
    at global offset `offset`); `b` is a function of r_{offset+i} ONLY
    for row i: b_val/b_lap are (D, rows, F) and b_jac3 is
    (3, D, rows, F) holding db/dr_row. The dense equivalent —
    fl.mul(a, Jet(b_val, dense_from_electron_rows(...), b_lap)) —
    materializes a (3*n_total, D, rows, F) jac that is zero outside
    3 tangent rows per electron and streams it through two full product
    passes. Here the big (T, D, rows, F) jac crosses HBM once: the
    correction lands on a contiguous tangent slab, diagonal in
    (tangent row, electron row), so it is applied through a 0/1 slab
    mask and a zero-padded (T, D, F) update — the whole jac is ONE
    fusable elementwise expression. (A scatter-add formulation forced
    XLA to materialize the scaled jac plus scatter copies: observed
    4x 2.53G HLO temps / OOM on the 96e diamond at el_chunk=64.)
    The Laplacian cross term stays a thin slab-diagonal gather.
    With `axis_name`, a.jac holds this device's tangent slice;
    out-of-slice rows are masked and the cross term is psummed."""
    d_dim, rows, f_dim = a.val.shape
    if a.jac.shape[0] == 0:
        # empty tangent axis (value/lap-only jets, e.g. the orbital-scan
        # value path): no slab update, no cross term — the jac-borne
        # 2*cross piece of the product Laplacian is the caller's to add
        return Jet(a.val * b_val, a.jac,
                   a.lap * b_val + a.val * b_lap)
    i_idx = jnp.repeat(jnp.arange(rows), 3)                 # (3*rows,)
    t_idx = 3 * (offset + i_idx) + jnp.tile(jnp.arange(3), rows)
    t_loc = a.jac.shape[0]
    if axis_name is not None:
        shard0 = jax.lax.axis_index(axis_name) * t_loc
        t_idx = t_idx - shard0
        valid = (t_idx >= 0) & (t_idx < t_loc)
        t_idx = jnp.clip(t_idx, 0, t_loc - 1)
        vmask = valid[:, None, None].astype(a.val.real.dtype)
    else:
        shard0 = None
        vmask = None

    # b_jac3 (3, D, rows, F) -> (3*rows, D, F), flat index k = 3*i + c
    bj = jnp.moveaxis(b_jac3, 0, -2)                         # (D, rows, 3, F)
    bj = jnp.moveaxis(bj.reshape(d_dim, 3 * rows, f_dim), 1, 0)
    av = jnp.moveaxis(jnp.take(a.val, i_idx, axis=-2), 1, 0)  # (3*rows, D, F)

    # zero-pad the slab update to the full (global) tangent axis and
    # build the slab-diagonal 0/1 selector; in the sharded case slice
    # both down to this device's tangent window (3*n_total is split
    # exactly across the axis — _slice_tangents contract, no padding)
    t_glob = 3 * n_total
    u_pad = jnp.pad(av * bj, ((3 * offset, t_glob - 3 * (offset + rows)),
                              (0, 0), (0, 0)))               # (T_glob, D, F)
    sel = ((jnp.arange(t_glob) // 3)[:, None]
           == (offset + jnp.arange(rows))[None])
    sel = sel.astype(a.val.real.dtype)                       # (T_glob, rows)
    if shard0 is not None:
        u_pad = jax.lax.dynamic_slice_in_dim(u_pad, shard0, t_loc, axis=0)
        sel = jax.lax.dynamic_slice_in_dim(sel, shard0, t_loc, axis=0)
    jac = a.jac * b_val[None] + sel[:, None, :, None] * u_pad[:, :, None, :]

    g = a.jac[t_idx, :, i_idx]                               # (3*rows, D, F)
    if vmask is not None:
        g = g * vmask
    cross = jnp.moveaxis(
        (g * bj).reshape(rows, 3, d_dim, f_dim).sum(axis=1), 0, 1
    )                                                        # (D, rows, F)
    if axis_name is not None:
        cross = jax.lax.psum(cross, axis_name)

    return Jet(
        a.val * b_val,
        jac,
        a.lap * b_val + a.val * b_lap + 2.0 * cross,
    )


def mul_const(a: Jet, c) -> Jet:
    # trailing-dim broadcasting aligns c with both val (S) and jac ((T,)+S)
    return Jet(a.val * c, a.jac * c, a.lap * c)


def complexify(re: Jet, im: Jet) -> Jet:
    return Jet(re.val + 1j * im.val, re.jac + 1j * im.jac, re.lap + 1j * im.lap)


# ---------------------------------------------------------------------------
# autodiff jet seeding: jets of f(r) for a single 3-vector input
# ---------------------------------------------------------------------------


def jet_of_function(f: Callable, r: jnp.ndarray) -> Jet:
    """Jets of f: R^3 -> pytree-free array, tangents = the 3 coords of r.

    jac: (3,) + out_shape; lap: trace of the 3x3 Hessian per output.
    """
    val = f(r)
    eye = jnp.eye(3, dtype=r.dtype)
    jac = jax.vmap(lambda e: jax.jvp(f, (r,), (e,))[1])(eye)
    # Hessian diagonal via jvp of the jacobian-vector function
    def hvp(e):
        return jax.jvp(lambda y: jax.jvp(f, (y,), (e,))[1], (r,), (e,))[1]

    lap = jnp.sum(jax.vmap(hvp)(eye), axis=0)
    return Jet(val, jac, lap)


# ---------------------------------------------------------------------------
# sparse -> dense conversions
# ---------------------------------------------------------------------------


def dense_from_electron_rows(jac3: jnp.ndarray) -> jnp.ndarray:
    """(3, N, ...) electron-sparse jac -> (3N, N, ...) dense jac.

    Row i depends only on r_i: dense[(3i+c), i, ...] = jac3[c, i, ...].
    """
    n = jac3.shape[1]
    out = jnp.zeros((n, 3) + jac3.shape[1:], dtype=jac3.dtype)
    idx = jnp.arange(n)
    out = out.at[idx, :, idx].set(jnp.moveaxis(jac3, 0, 1))
    return out.reshape((3 * n,) + jac3.shape[1:])


def dense_jet_from_electron_rows(jet: Jet) -> Jet:
    return Jet(jet.val, dense_from_electron_rows(jet.jac), jet.lap)


def dense_row_mean_from_pairs(
    jac6: jnp.ndarray, row_start: int, row_stop: int
) -> jnp.ndarray:
    """Dense jac of g[j,...] = mean_{i in [row_start,row_stop)} h2[i,j,...].

    jac6: (6, N, N, ...) pair-sparse jac of h2 (first 3 dirs wrt r_i,
    last 3 wrt r_j). Returns (3N, N, ...).
    """
    n = jac6.shape[1]
    n_rows = row_stop - row_start
    # term 1: d/dr_i contributions, i in the averaged channel
    j_i = jac6[:3, row_start:row_stop]  # (3, n_rows, N, ...)
    term1 = jnp.zeros((n, 3) + jac6.shape[2:], dtype=jac6.dtype)
    term1 = term1.at[row_start:row_stop].set(
        jnp.moveaxis(j_i, 0, 1) / n_rows
    )
    term1 = term1.reshape((3 * n,) + jac6.shape[2:])
    # term 2: d/dr_j contributions (same j as the output row)
    s = jnp.mean(jac6[3:, row_start:row_stop], axis=1)  # (3, N, ...)
    term2 = dense_from_electron_rows(s)
    return term1 + term2


# ---------------------------------------------------------------------------
# determinant head rules
# ---------------------------------------------------------------------------


_DET_KERNEL = None  # None = auto; True/False/'interpret' to force


def set_det_kernel(enabled):
    """Force the Pallas lane-batched det-head inverse kernel on/off.

    `enabled`: None (auto — ON when the default backend is a TPU, off
    elsewhere; the round-3 on-chip A/B measured the kernel 5% faster on
    the production local-energy bench, 151.0 vs 143.8 walkers/s; env
    DEEPSOLID_TPU_DET_KERNEL=on|off overrides), True/False, or
    'interpret' (Pallas interpreter, for CPU tests of the integrated
    path)."""
    global _DET_KERNEL
    _DET_KERNEL = enabled


_ON_TPU = None


def _on_tpu() -> bool:
    global _ON_TPU
    if _ON_TPU is None:
        import jax

        _ON_TPU = jax.default_backend() == "tpu"
    return _ON_TPU


_GAUSS_SPLIT = None  # None = auto (off); True/False to force


def set_gauss_split(enabled):
    """Force the 3-multiplication Gauss split of the complex det-head
    tangent product on/off. Auto (None) is OFF: it trades 25% of the
    matmul FLOPs for (T, ..., n, n) temporaries that tip the production
    bench over HBM; env DEEPSOLID_TPU_GAUSS_SPLIT=on|off overrides."""
    global _GAUSS_SPLIT
    _GAUSS_SPLIT = enabled


def _use_gauss_split() -> bool:
    if _GAUSS_SPLIT is not None:
        return bool(_GAUSS_SPLIT)
    return env_flag("DEEPSOLID_TPU_GAUSS_SPLIT", {"on", "off"}) == "on"


_DET_SCAN = None  # None = auto (ON); True/False to force


def set_det_scan(enabled):
    """Force the chunked-scan det-head trace contraction on/off.

    Auto (None) is ON: the scan form computes B_t = A^-1 J_t and both
    trace contractions chunk-by-chunk over the tangent axis, so the
    full-width (.., n, T*n) product stream and its block transpose
    never reach HBM — at the C-diamond production shape the one-shot
    XLA form peaked ~8 GB higher (two 3.38G padded block-transpose
    temps + four 1.27G wide-dot outputs, the el_chunk-64 OOM of
    BENCH_r04). False restores the one-shot wide-dot form. Env
    DEEPSOLID_TPU_DET_SCAN=on|off overrides auto."""
    global _DET_SCAN
    _DET_SCAN = enabled


def _use_det_scan() -> bool:
    if _DET_SCAN is not None:
        return bool(_DET_SCAN)
    env = env_flag("DEEPSOLID_TPU_DET_SCAN", {"on", "off"})
    if env:
        return env == "on"
    return True


def _pick_det_scan_chunk(t_dim: int, n: int) -> int:
    """Tangent-chunk size for the scan det head: a divisor of t_dim
    whose lane width tc*n stays MXU-friendly (>=128 lanes, <=3072),
    preferring 128-aligned widths (layout-cheap lane slices), then the
    width closest to ~1024 lanes. Falls back to t_dim (one chunk = the
    one-shot form) when no divisor fits — small molecules/tests.
    DEEPSOLID_TPU_DET_SCAN_TC overrides for on-chip sweeps (clamped to
    the nearest divisor of t_dim)."""
    import os

    env = os.environ.get("DEEPSOLID_TPU_DET_SCAN_TC", "")
    if env:
        want = int(env)
        divs = [tc for tc in range(1, t_dim + 1) if t_dim % tc == 0]
        return min(divs, key=lambda tc: abs(tc - want))
    candidates = [
        tc for tc in range(1, t_dim + 1)
        if t_dim % tc == 0 and 128 <= tc * n <= 3072
    ]
    if not candidates:
        return t_dim
    return min(
        candidates,
        key=lambda tc: (0 if (tc * n) % 128 == 0 else 1,
                        abs(tc * n - 1024)),
    )


def _use_det_kernel(a) -> bool | str:
    # the kernel computes in f32 planes: complex64 inputs only (f64
    # runs — CPU re-evals, precision anchors — keep the LAPACK path)
    if a.dtype != jnp.complex64:
        return False
    forced = _DET_KERNEL
    if forced is None:
        env = env_flag("DEEPSOLID_TPU_DET_KERNEL",
                       {"on", "off", "interpret"})
        forced = env if env == "interpret" else (
            (env == "on") if env else _on_tpu())
    if forced == "interpret":
        return forced
    if forced:
        # Mosaic requires the lane block to be a full 128 lanes (the
        # batch axis is the minormost block dim); once the ~8 live
        # (n_pad, n_pad, 128) f32 planes outgrow the ~16 MB VMEM the
        # kernel cannot lower AT ALL (caught by the bcc-Li 162e AOT
        # probe: n_pad=88 -> 31.7 MB). Fall back to the LU path there —
        # even when forced on — mirroring det_kernels._lane_block.
        from deepsolid_tpu.ops.pallas.det_kernels import _lane_block, _round_up

        n_pad = _round_up(max(int(a.shape[-1]), 8), 8)
        if _lane_block(n_pad) < 128:
            return False
    return forced


def det_factor(a):
    """(A^-1, sign, logdet) for batched square matrices (..., n, n) —
    either the Pallas lane-batched Gauss-Jordan kernel
    (ops/pallas/det_kernels.py) or XLA's LU. The explicit inverse (one
    LU solve on the identity) lets the T per-tangent products A^-1 J_t
    ride the MXU as batched matmuls — T triangular solves would
    serialize on TPU. Same LU, same conditioning; one extra matmul
    rounding, negligible at full-f32 precision."""
    use_kernel = _use_det_kernel(a)
    if use_kernel:
        from deepsolid_tpu.ops.pallas import det_kernels

        fn = (det_kernels.gj_inverse_slogdet_interpret
              if use_kernel == "interpret"
              else det_kernels.gj_inverse_slogdet)
        return fn(a)
    lu, piv = jax.scipy.linalg.lu_factor(a)
    sign, logdet = jnp.linalg.slogdet(a)
    solve = functools.partial(jax.scipy.linalg.lu_solve, (lu, piv))
    n = a.shape[-1]
    a_inv = solve(jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape))
    return a_inv, sign, logdet


def det_trace_chunk(a_inv, j2c, tc, n, lead):
    """One tangent chunk of the det-head trace contractions.

    a_inv: (*lead, n, n); j2c: (*lead, n, tc*n) — the chunk's slice of
    the wide tangent stream, lanes ordered (t, k). Returns
    (trb (tc, *lead) = tr(A^-1 J_t), l2 (*lead,) = sum_t tr((A^-1
    J_t)^2) over the chunk). The only padded temp is the chunk-local
    (.., n, tc, n) block transpose. Matmuls ride the tangent precision
    tier (set_tangent_precision)."""
    mm = functools.partial(jnp.matmul, precision=_TANGENT_PRECISION)
    eye = jnp.eye(n, dtype=a_inv.real.dtype)
    mask = jnp.tile(eye, (1, tc))  # (n, tc*n), mask[i, t*n+k] = d_ik

    def _per_t(rowsum):  # (..., tc*n) -> (tc, ...)
        return jnp.moveaxis(
            rowsum.reshape(lead + (tc, n)).sum(-1), -1, 0)

    def _blk(x):  # (..., i, (t,k)) -> (..., k, (t,i)) within the chunk
        return jnp.swapaxes(
            x.reshape(lead + (n, tc, n)), -3, -1
        ).reshape(lead + (n, tc * n))

    if jnp.iscomplexobj(j2c):
        ar, ai = a_inv.real, a_inv.imag
        jr, ji = j2c.real, j2c.imag
        if _use_gauss_split():
            p1 = mm(ar, jr)
            p2 = mm(ai, ji)
            p3 = mm(ar + ai, jr + ji)
            br, bi = p1 - p2, p3 - p1 - p2
        else:
            br = mm(ar, jr) - mm(ai, ji)
            bi = mm(ar, ji) + mm(ai, jr)
        trb = jax.lax.complex(_per_t(jnp.sum(br * mask, axis=-2)),
                              _per_t(jnp.sum(bi * mask, axis=-2)))
        dr, di = _blk(br), _blk(bi)
        l2 = jax.lax.complex(
            jnp.sum(br * dr - bi * di, axis=(-1, -2)),
            jnp.sum(br * di + bi * dr, axis=(-1, -2)),
        )
    else:
        b = mm(a_inv, j2c)
        trb = _per_t(jnp.sum(b * mask, axis=-2))
        l2 = jnp.sum(b * _blk(b), axis=(-1, -2))
    return trb, l2


def _det_scan_traces(a_inv, j2, t_dim, n, lead):
    """Chunked-scan det-head trace contractions (the default XLA path).

    jac[t] = tr(A^-1 J_t) and lap2 = sum_t tr((A^-1 J_t)^2), computed
    per lane-aligned tangent chunk of the wide (.., n, T*n) stream: each
    scan step forms only its (.., n, tc*n) slice of B = A^-1 J, reduces
    both traces, and accumulates — the full-width product stream, its
    block transpose, and their padded (.., n, T, n) views never reach
    HBM (at C-diamond el_chunk 64 the one-shot form held two 3.38G
    padded transpose temps plus four 1.27G dot outputs live at once —
    the BENCH_r04 OOM)."""
    tc = _pick_det_scan_chunk(t_dim, n)
    steps = t_dim // tc

    def body(acc, c):
        sl = jax.lax.dynamic_slice_in_dim(j2, c * tc * n, tc * n, axis=-1)
        trb, l2 = det_trace_chunk(a_inv, sl, tc, n, lead)
        return acc + l2, trb

    lap2, trbs = jax.lax.scan(
        body, jnp.zeros(lead, dtype=j2.dtype),
        jnp.arange(steps), length=steps, unroll=_det_scan_unroll(steps),
    )
    jac = trbs.reshape((t_dim,) + lead)  # step-major == global t order
    return jac, lap2


def _det_scan_unroll(steps: int) -> int:
    """Unroll factor for the det-head tangent-chunk scans: unrolled
    bodies expose independent chunk chains XLA can pipeline (the only
    loop-carried dependency is the cheap accumulator add), trading a
    bounded amount of live-temp memory back for overlap. Env
    DEEPSOLID_TPU_DET_SCAN_UNROLL (default 1)."""
    import os

    u = int(os.environ.get("DEEPSOLID_TPU_DET_SCAN_UNROLL", "1"))
    u = max(1, min(u, steps))
    while steps % u:
        u -= 1
    return u


def slogdet_jet(mat: Jet, axis_name=None) -> Tuple[jnp.ndarray, Jet]:
    """(sign, jet of log det A) for a jet of square matrices (..., n, n).

    For each matrix: d log det = tr(A^-1 dA);
    Lap log det = tr(A^-1 Lap A) - sum_t tr((A^-1 J_t A)(A^-1 J_t A)).
    One factorization per matrix (vs 3N in JVP-of-grad engines) — either
    XLA's LU or the Pallas lane-batched Gauss-Jordan kernel
    (ops/pallas/det_kernels.py), which runs 128 matrices per VPU pass
    with the walker/det batch across lanes.
    """
    a = mat.val
    a_inv, sign, logdet = det_factor(a)
    # Wide-dot restructure (round-4 on-chip op trace): forming A^-1 J_t
    # as a T-batched matmul over (n, n) tiles made XLA relayout the
    # (T, ..., n, n) stream around every consumer — seven full-stream
    # copies, 25% of the whole C-diamond kinetic step. Instead move the
    # tangent axis next to the column axis ONCE and form every tangent
    # product as a single wide matmul A^-1 (n, n) @ J (n, T*n): the flat
    # T*n lane axis tiles the 128-lane MXU exactly (288*48 = 108*128
    # where n=48 alone pads 2.67x), the dot consumes the moveaxis result
    # directly, and the trace contractions below read the wide product
    # in place. Rides the tangent precision tier
    # (see set_tangent_precision).
    t_dim = mat.jac.shape[0]
    n = a.shape[-1]
    lead = mat.jac.shape[1:-2]
    j2 = jnp.moveaxis(mat.jac, 0, -2).reshape(lead + (n, t_dim * n))

    # tr(A^-1 L) as an inner product with the materialized inverse —
    # saves the n^3 LU solve a trace-of-solve would spend on off-diagonal
    # columns it never reads
    lap1 = jnp.sum(a_inv * jnp.swapaxes(mat.lap, -1, -2), axis=(-1, -2))

    if _use_det_scan():
        jac, lap2 = _det_scan_traces(a_inv, j2, t_dim, n, lead)
        if axis_name is not None:
            lap2 = jax.lax.psum(lap2, axis_name)
        return sign, Jet(logdet, jac, lap1 - lap2)

    # One-shot wide-dot form (DEEPSOLID_TPU_DET_SCAN=off; superseded by
    # the chunked scan above, which holds ~8 GB less live at the
    # C-diamond production shape — see _det_scan_traces).
    # The trace contractions stay on the FLAT (n, T*n) layout: any
    # materialization of the (i, T, k) view pads its 48-lane minor dim
    # 2.7x (3.38 GiB each at C-diamond el_chunk 64), and einsum /
    # natural-layout-reduce forms of the same math made XLA materialize
    # it up to five times. Per-tangent resolution is recovered by
    # reducing the ROW axis first (a fused multiply+reduce) and
    # reshaping the resulting (T*n,) vector — 55 KB — instead of the
    # stream. Complex arithmetic is hand-split into explicit f32
    # component arrays: XLA's TPU pipeline splits complex into (re, im)
    # pairs anyway, but complex-typed multiplies between the dot and the
    # reduces materialized their 1.27 GiB component products instead of
    # fusing them into the reductions (round-4 op trace).
    def _per_t(rowsum):  # (..., T*n) -> (T, ...)
        return jnp.moveaxis(
            rowsum.reshape(lead + (t_dim, n)).sum(-1), -1, 0)

    def _blk_t(x):  # (..., i, (t,k)) -> (..., k, (t,i)) block transpose
        return jnp.swapaxes(
            x.reshape(lead + (n, t_dim, n)), -3, -1
        ).reshape(lead + (n, t_dim * n))

    mm = functools.partial(jnp.matmul, precision=_TANGENT_PRECISION)
    eye = jnp.eye(n, dtype=a.real.dtype)
    mask = jnp.tile(eye, (1, t_dim))  # (n, T*n), mask[i, t*n+k] = d_ik
    if jnp.iscomplexobj(a):
        ar, ai = a_inv.real, a_inv.imag
        jr, ji = j2.real, j2.imag
        if _use_gauss_split():
            # OFF by default: the extra (..., n, T*n) temporaries
            # (jr+ji and the three products) raise peak HBM enough to
            # OOM the production C-diamond batch-1024 bench on a 16G
            # chip (round-3 capture log); enable via
            # set_gauss_split(True) / DEEPSOLID_TPU_GAUSS_SPLIT=on where
            # the det head is compute- rather than memory-bound. The
            # 3-multiplication Gauss split (p1=Re*Re, p2=Im*Im,
            # p3=(Re+Im)(Re+Im)) saves 25% over the 4 real matmuls of
            # the complex product.
            p1 = mm(ar, jr)
            p2 = mm(ai, ji)
            p3 = mm(ar + ai, jr + ji)
            br, bi = p1 - p2, p3 - p1 - p2
        else:
            br = mm(ar, jr) - mm(ai, ji)
            bi = mm(ar, ji) + mm(ai, jr)
        # tr(A^-1 J_t): eye-masked diagonal reduce on the flat layout
        jac = jax.lax.complex(_per_t(jnp.sum(br * mask, axis=-2)),
                              _per_t(jnp.sum(bi * mask, axis=-2)))
        # tr((A^-1 J_t)^2): pair B elementwise with its block transpose
        # d[i, (t,k)] = B_t[k,i] — the one unavoidable full-stream
        # transpose of the det head, done packed-to-packed per component
        dr, di = _blk_t(br), _blk_t(bi)
        lap2 = jax.lax.complex(
            _per_t(jnp.sum(br * dr - bi * di, axis=-2)),
            _per_t(jnp.sum(br * di + bi * dr, axis=-2)),
        )
    else:
        b2 = mm(a_inv, j2)
        jac = _per_t(jnp.sum(b2 * mask, axis=-2))
        lap2 = _per_t(jnp.sum(b2 * _blk_t(b2), axis=-2))
    lap2 = _tsum(lap2, axis_name)
    return sign, Jet(logdet, jac, lap1 - lap2)


def logsumexp_det_jet(sign, l: Jet, w=None, axis_name=None) -> Jet:
    """Jet of log |sum_d w_d s_d exp(l_d)| + i arg(...): combined over the
    leading det axis of l. Matches ops/slogdet.logdet_matmul semantics."""
    lmax = jax.lax.stop_gradient(jnp.max(l.val.real))
    e = sign * jnp.exp(l.val - lmax)
    if w is not None:
        e = e * w
    s_tot = jnp.sum(e)
    p = e / s_tot  # complex weights, sum to 1
    jac = jnp.sum(p[None] * l.jac, axis=1)  # (T,)
    lap = (
        jnp.sum(p * (l.lap + _tsum(l.jac**2, axis_name)))
        - _tsum(jac[:, None] ** 2, axis_name)[0]
    )
    val = jnp.log(jnp.abs(s_tot)) + lmax + 1j * jnp.angle(s_tot)
    return Jet(val, jac, lap)
