"""Oracle tests for the fused det-head jet-trace Pallas kernel
(ops/pallas/det_jet_kernels.det_jet_traces), interpret mode on CPU.

Covers the Mosaic lane-padding path (bt not a 128-multiple — the
production C-diamond shape n=48, T=288 picks bt=96 and must pad each
per-block trb output to 128 lanes) and the multi-t-block accumulation
grid. Oracle: dense complex einsums of tr(A^-1 J_t) / sum_t tr((A^-1
J_t)^2). The reference has no counterpart (its det head is autodiff'd,
DeepSolid/network.py:375-392).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsolid_tpu.ops import fwdlap as fl
from deepsolid_tpu.ops.pallas import det_jet_kernels as djk


def _rand_c(shape, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        scale * (rng.randn(*shape) + 1j * rng.randn(*shape)), jnp.complex64
    )


def _oracle(a_inv, j2):
    d, n, tn = j2.shape
    t = tn // n
    b = jnp.einsum("dij,djk->dik", a_inv, j2)  # (d, n, t*n)
    b = jnp.moveaxis(b.reshape(d, n, t, n), 2, 1)  # (d, t, n, n)
    trb = jnp.einsum("dtii->dt", b).T  # (t, d)
    lap2 = jnp.einsum("dtij,dtji->d", b, b)
    return trb, lap2


@pytest.mark.parametrize(
    "d,n,t,block_t",
    [
        (3, 8, 6, None),     # single block, bt=6 -> bt_pad=128
        (2, 8, 12, 3),       # multi-block grid (n_tb=4), bt_pad=128
        (1, 16, 8, 4),       # n=16, two blocks
    ],
)
def test_det_jet_traces_matches_dense(d, n, t, block_t):
    a = _rand_c((d, n, n), seed=5) + 2.0 * jnp.eye(n, dtype=jnp.complex64)
    a_inv = jnp.linalg.inv(a)
    j2 = _rand_c((d, n, t * n), seed=6, scale=0.3)
    trb, lap2 = djk.det_jet_traces(a_inv, j2, block_t=block_t,
                                   interpret=True)
    trb0, lap20 = _oracle(a_inv, j2)
    np.testing.assert_allclose(np.asarray(trb), np.asarray(trb0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lap2), np.asarray(lap20),
                               rtol=2e-4, atol=2e-4)


def test_slogdet_jet_det_jet_kernel_integration():
    """slogdet_jet with the jet-trace kernel forced (interpret) == XLA."""
    t_dim, ndet, n = 9, 2, 8
    rng = np.random.RandomState(3)
    mat = fl.Jet(
        val=_rand_c((ndet, n, n), seed=11)
        + 2.0 * jnp.eye(n, dtype=jnp.complex64),
        jac=jnp.asarray(
            0.1 * (rng.randn(t_dim, ndet, n, n)
                   + 1j * rng.randn(t_dim, ndet, n, n)),
            jnp.complex64,
        ),
        lap=_rand_c((ndet, n, n), seed=12, scale=0.1),
    )
    sign0, jet0 = fl.slogdet_jet(mat)
    fl.set_det_jet_kernel("interpret")
    try:
        sign1, jet1 = fl.slogdet_jet(mat)
    finally:
        fl.set_det_jet_kernel(None)
    np.testing.assert_allclose(np.asarray(sign1), np.asarray(sign0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jet1.val), np.asarray(jet0.val),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jet1.jac), np.asarray(jet0.jac),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jet1.lap), np.asarray(jet0.lap),
                               rtol=2e-4, atol=2e-4)


def test_det_jet_traces_under_vmap():
    """The production call sites run under vmap (walker batch): the
    batched pallas_call's padded output blocks must stay legal and
    numerics unchanged."""
    d, n, t, batch = 2, 8, 6, 4
    a = _rand_c((batch, d, n, n), seed=7) + 2.0 * jnp.eye(
        n, dtype=jnp.complex64
    )
    a_inv = jnp.linalg.inv(a)
    j2 = _rand_c((batch, d, n, t * n), seed=8, scale=0.3)
    trb, lap2 = jax.vmap(
        lambda ai, j: djk.det_jet_traces(ai, j, interpret=True)
    )(a_inv, j2)
    trb0, lap20 = jax.vmap(_oracle)(a_inv, j2)
    np.testing.assert_allclose(np.asarray(trb), np.asarray(trb0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lap2), np.asarray(lap20),
                               rtol=2e-4, atol=2e-4)
