"""Pallas TPU kernel: fused det-head jet trace contractions.

The forward-Laplacian det head (ops/fwdlap.slogdet_jet) needs, per
orbital matrix A with tangent stream J_t (t = 1..T = 3N):

    trb_t  = tr(A^-1 J_t)                    (the logdet jet's jacobian)
    lap2   = sum_t tr((A^-1 J_t)^2)          (the quadratic Laplacian term)

In XLA-land the product B_t = A^-1 J_t must be materialized in HBM and
tr(B_t^2) needs a transposed read of it; with n ~ 48 every (.., n, n)
materialization pads its 48-lane minor dim 2.7x and every transposed
read is a full-stream layout copy — the round-4 op trace measured the
XLA det head (dot + block transposes + reduces) at ~185 ms of a 486 ms
C-diamond (96e) kinetic eval at el_chunk 64.

This kernel keeps B entirely in VMEM. Per grid step (d, t-block):

  1. B = A^-1 @ J over the WIDE layout (n, bt*n) — one MXU dot whose
     flat lane axis tiles the 128-lane unit exactly; complex formed via
     the 3-multiplication Gauss split (VMEM temporaries are free).
  2. trb: eye-masked row reduce -> (1, bt*n), then per-tangent segment
     sums as a selection-matrix dot (Mosaic rejects lane-restructuring
     reshapes of 48-wide groups; the tiny (bt*n, bt) dot is the legal
     spelling of a segmented lane reduction).
  3. tr(B_t^2): pair B's t-th COLUMN slab with the t-th ROW slab of the
     plain 2D transpose E = B.T — contiguous 2D slices, no block
     transpose: sum_ik B[i, (t,k)] * B[k, (t,i)] = sum(B[:, tn:(t+1)n]
     * E[tn:(t+1)n, :]). Accumulated across the t-block grid in VMEM
     scratch, flushed at the last step.

HBM traffic: the stream is read exactly once, packed; B/E never touch
HBM. The reference has no counterpart (its det head is torch/cuSOLVER
autodiff; DeepSolid/network.py:375-392); the forward-Laplacian det-head
algebra itself follows SURVEY.md section 3's kinetic-engine analysis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bt(t_dim: int, n: int) -> int:
    """Largest divisor of T with bt*n lanes within a VMEM-friendly bound
    (~10 live (n, bt*n) f32 planes per step), env-overridable."""
    import os

    env = os.environ.get("DEEPSOLID_TPU_DET_JET_BLOCK_T", "")
    # ~16 live (n, bt*n) f32 planes per step (Gauss-split temporaries +
    # the plain transpose + double-buffered input DMA) must fit the
    # 16 MB VMEM stack: bt*n <= 3072 lanes keeps the plane 0.6 MB at
    # n=48 (bt=96 measured 18.66M > 16M on v5e).
    cap = int(env) if env else max(1, 3072 // n)
    best = 1
    for bt in range(1, min(cap, t_dim) + 1):
        if t_dim % bt == 0:
            best = bt
    return best


def _kernel_body(ar_ref, ai_ref, jr_ref, ji_ref,
                 trb_r_ref, trb_i_ref, lap2_r_ref, lap2_i_ref,
                 acc_ref, *, n, bt, bt_pad, t_axis, precision):
    tb = pl.program_id(t_axis)
    n_tb = pl.num_programs(t_axis)
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    ar = ar_ref[:].reshape(n, n)
    ai = ai_ref[:].reshape(n, n)
    jr = jr_ref[:].reshape(n, bt * n)
    ji = ji_ref[:].reshape(n, bt * n)

    # B = A^-1 @ J, complex via 3-mult Gauss split (all VMEM-resident)
    p1 = dot(ar, jr)
    p2 = dot(ai, ji)
    p3 = dot(ar + ai, jr + ji)
    br = p1 - p2
    bi = p3 - p1 - p2

    # trb: eye-masked diagonal row-reduce + segment sums via a selection
    # dot (the Mosaic-legal segmented lane reduction). The selection
    # matrix is padded to bt_pad output lanes (Mosaic requires output
    # lane blocks to be 128-multiples or the full axis; columns >= bt
    # select nothing and the caller slices them off).
    row = jax.lax.broadcasted_iota(jnp.int32, (n, bt * n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, bt * n), 1)
    mask = (col % n == row).astype(jnp.float32)
    segr = jax.lax.broadcasted_iota(jnp.int32, (bt * n, bt_pad), 0)
    segc = jax.lax.broadcasted_iota(jnp.int32, (bt * n, bt_pad), 1)
    sel = (segr // n == segc).astype(jnp.float32)
    # Output tiles are (8, bt_pad) sublane x lane blocks (the minimum
    # Mosaic f32 tile); the row vector is broadcast across the 8
    # sublanes and the host reads row 0.
    trb_r_ref[:] = jnp.broadcast_to(
        dot((br * mask).sum(axis=0, keepdims=True), sel),
        trb_r_ref.shape[:-2] + (8, bt_pad),
    ).reshape(trb_r_ref.shape)
    trb_i_ref[:] = jnp.broadcast_to(
        dot((bi * mask).sum(axis=0, keepdims=True), sel),
        trb_i_ref.shape[:-2] + (8, bt_pad),
    ).reshape(trb_i_ref.shape)

    # sum_t tr(B_t^2): column slab of B against row slab of B.T.
    # Accumulated as SMEM scalars (a vector-tile scalar would need a
    # both-axes broadcast at the flush, which Mosaic does not implement;
    # a scalar splat via jnp.full is supported).
    er = br.T
    ei = bi.T
    accr = jnp.float32(0.0)
    acci = jnp.float32(0.0)
    for t in range(bt):
        bsr = br[:, t * n:(t + 1) * n]
        bsi = bi[:, t * n:(t + 1) * n]
        esr = er[t * n:(t + 1) * n, :]
        esi = ei[t * n:(t + 1) * n, :]
        accr = accr + jnp.sum(bsr * esr - bsi * esi)
        acci = acci + jnp.sum(bsr * esi + bsi * esr)

    @pl.when(tb == 0)
    def _():
        acc_ref[0] = jnp.float32(0.0)
        acc_ref[1] = jnp.float32(0.0)

    acc_ref[0] += accr
    acc_ref[1] += acci

    @pl.when(tb == n_tb - 1)
    def _():
        lap2_r_ref[:] = jnp.full(lap2_r_ref.shape, acc_ref[0],
                                 jnp.float32)
        lap2_i_ref[:] = jnp.full(lap2_i_ref.shape, acc_ref[1],
                                 jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def det_jet_traces(a_inv, j2, block_t=None, interpret=False):
    """Fused det-head jet trace contractions.

    a_inv: (D, n, n) complex64 — explicit inverses.
    j2:    (D, n, T*n) complex64 — wide tangent stream, lanes (t, k).
    Returns (trb (T, D) complex64, lap2 (D,) complex64) with
    trb[t, d] = tr(A_d^-1 J_{t,d}) and lap2[d] = sum_t tr((A_d^-1
    J_{t,d})^2) summed over the LOCAL tangent axis (callers psum over a
    sharded deriv axis).
    """
    d_dim, n, tn = j2.shape
    t_dim = tn // n
    bt = block_t or _pick_bt(t_dim, n)
    n_tb = t_dim // bt
    # Mosaic lane rule: an output block's last dim must be a multiple of
    # 128 or the whole axis. Per-(d, tb) trb blocks carry bt tangent
    # sums, so pad each block to bt_pad lanes and slice below.
    bt_pad = -(-bt // 128) * 128

    kern = functools.partial(
        _kernel_body, n=n, bt=bt, bt_pad=bt_pad, t_axis=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    trb_r, trb_i, lap2_r, lap2_i = pl.pallas_call(
        kern,
        grid=(d_dim, n_tb),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda d, tb: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda d, tb: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, bt * n), lambda d, tb: (d, 0, tb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, bt * n), lambda d, tb: (d, 0, tb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, bt_pad), lambda d, tb: (d, tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, bt_pad), lambda d, tb: (d, tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda d, tb: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda d, tb: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_dim, n_tb, 8, bt_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_dim, n_tb, 8, bt_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_dim, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((d_dim, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=bool(interpret),
    )(a_inv.real, a_inv.imag, j2.real, j2.imag)

    trb_r = trb_r[:, :, 0, :bt].reshape(d_dim, t_dim)
    trb_i = trb_i[:, :, 0, :bt].reshape(d_dim, t_dim)
    trb = jax.lax.complex(trb_r, trb_i).T  # (T, D)
    lap2 = jax.lax.complex(lap2_r[:, 0, 0], lap2_i[:, 0, 0])
    return trb, lap2
