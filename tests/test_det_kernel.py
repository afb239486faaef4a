"""Lane-batched Gauss-Jordan det-head kernel: interpret-mode correctness.

Oracles: jnp.linalg.inv / slogdet, and the integrated slogdet_jet LU path
(the production det head of the forward-Laplacian engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.ops import fwdlap as fl
from deepsolid_tpu.ops.pallas.det_kernels import (
    gj_inverse_slogdet_interpret,
    gj_inverse_slogdet_reference,
)


def _random_complex(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        scale * (rng.randn(*shape) + 1j * rng.randn(*shape)),
        jnp.complex64,
    )


@pytest.mark.parametrize(
    "b,n",
    [(3, 5), (2, 8), (4, 13), (1, 48), (130, 16)],  # 130 > one lane block
)
def test_gj_kernel_matches_oracle(b, n):
    a = _random_complex((b, n, n), seed=b * 100 + n)
    ainv, sign, logabs = gj_inverse_slogdet_interpret(a)
    rinv, rsign, rlogabs = gj_inverse_slogdet_reference(a)
    np.testing.assert_allclose(np.asarray(ainv), np.asarray(rinv),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sign), np.asarray(rsign),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logabs), np.asarray(rlogabs),
                               rtol=1e-5, atol=1e-5)
    # the inverse actually inverts
    eye = jnp.einsum("bij,bjk->bik", a, ainv)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(n), (b, n, n)),
        atol=5e-5,
    )


def test_gj_kernel_pivoting_zero_diagonal():
    # zero diagonal forces a row swap at every step; sign must carry the
    # permutation parity exactly
    a = jnp.array([[[0, 1 + 1j], [2 - 1j, 0]]], dtype=jnp.complex64)
    ainv, sign, logabs = gj_inverse_slogdet_interpret(a)
    rinv, rsign, rlogabs = gj_inverse_slogdet_reference(a)
    np.testing.assert_allclose(np.asarray(ainv), np.asarray(rinv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sign), np.asarray(rsign), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logabs), np.asarray(rlogabs),
                               atol=1e-6)


def test_gj_kernel_permutation_matrix_exact():
    n = 6
    perm = np.roll(np.eye(n), 2, axis=0)  # parity of a 6-cycle^2 shift
    a = jnp.asarray(perm[None], jnp.complex64)
    ainv, sign, logabs = gj_inverse_slogdet_interpret(a)
    np.testing.assert_allclose(np.asarray(ainv)[0], perm.T, atol=0)
    assert float(np.asarray(logabs)[0]) == 0.0
    rsign, _ = np.linalg.slogdet(perm)
    np.testing.assert_allclose(np.asarray(sign)[0], rsign, atol=0)


def test_gj_kernel_vmap_flattens_into_lanes():
    # outer vmap (walker batching) must flatten into the lane batch via
    # the custom vmap rule, not loop the kernel — and stay correct
    a = _random_complex((7, 3, 9, 9), seed=5)
    ainv, sign, logabs = jax.vmap(gj_inverse_slogdet_interpret)(a)
    rinv, rsign, rlogabs = gj_inverse_slogdet_reference(a)
    np.testing.assert_allclose(np.asarray(ainv), np.asarray(rinv),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sign), np.asarray(rsign),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logabs), np.asarray(rlogabs),
                               rtol=1e-5, atol=1e-5)


def test_slogdet_jet_det_kernel_integration():
    """slogdet_jet with the kernel forced (interpret) == the LU path."""
    t_dim, ndet, n = 6, 2, 5
    rng = np.random.RandomState(3)
    mat = fl.Jet(
        val=_random_complex((ndet, n, n), seed=11)
        + 2.0 * jnp.eye(n, dtype=jnp.complex64),
        jac=jnp.asarray(
            0.1 * (rng.randn(t_dim, ndet, n, n)
                   + 1j * rng.randn(t_dim, ndet, n, n)),
            jnp.complex64,
        ),
        lap=_random_complex((ndet, n, n), seed=12, scale=0.1),
    )
    sign0, jet0 = fl.slogdet_jet(mat)
    fl.set_det_kernel("interpret")
    try:
        sign1, jet1 = fl.slogdet_jet(mat)
    finally:
        fl.set_det_kernel(None)
    np.testing.assert_allclose(np.asarray(sign1), np.asarray(sign0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jet1.val), np.asarray(jet0.val),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jet1.jac), np.asarray(jet0.jac),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jet1.lap), np.asarray(jet0.lap),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# value path (ops/slogdet.slogdet_op): kernel forward + exact custom VJP
# ---------------------------------------------------------------------------


def test_slogdet_op_kernel_value_and_vjp():
    """slogdet_op with the kernel: values match jnp.linalg.slogdet, and
    the custom VJP (linear transpose of the slogdet JVP rule over the
    kernel's saved inverse) matches jnp's autodiff cotangents."""
    from deepsolid_tpu.ops import slogdet as slog

    a = _random_complex((4, 7, 7), seed=21) + 1.5 * jnp.eye(
        7, dtype=jnp.complex64
    )
    want = jnp.linalg.slogdet(a)
    fl.set_det_kernel("interpret")
    try:
        got, vjp_got = jax.vjp(slog.slogdet_op, a)
    finally:
        fl.set_det_kernel(None)
    _, vjp_want = jax.vjp(jnp.linalg.slogdet, a)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-5, atol=1e-5)
    rng = np.random.RandomState(0)
    ct = (
        jnp.asarray(rng.randn(4) + 1j * rng.randn(4), jnp.complex64),
        jnp.asarray(rng.randn(4), np.asarray(want[1]).dtype),
    )
    (ga,) = vjp_got(ct)
    # jnp.linalg.slogdet returns a SlogdetResult namedtuple; its vjp
    # demands the same pytree type for the cotangents
    (wa,) = vjp_want(type(want)(*ct))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=2e-4, atol=2e-4)


def test_logdet_matmul_kernel_grad_end_to_end():
    """Gradient of log|psi| through logdet_matmul agrees between the
    kernel path and the default path (the loss/KFAC consumers)."""
    from deepsolid_tpu.ops.slogdet import logdet_matmul

    ndet, n = 3, 5
    xs0 = _random_complex((ndet, n, n), seed=31) + 1.2 * jnp.eye(
        n, dtype=jnp.complex64
    )
    w = jnp.asarray(np.random.RandomState(1).randn(ndet), jnp.float32)

    def f(x):
        phase, logmag = logdet_matmul([x], w)
        return logmag.real.sum()

    g0 = jax.grad(f)(xs0)
    fl.set_det_kernel("interpret")
    try:
        g1 = jax.grad(f)(xs0)
    finally:
        fl.set_det_kernel(None)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4, atol=2e-4)


def test_slogdet_op_kernel_jvp_of_grad_second_order():
    """The reference-style partition/for engines take jvp-of-grad through
    log|psi|; the kernel's recursive custom JVP must support that second
    order and agree with jnp.linalg.slogdet's autodiff."""
    from deepsolid_tpu.ops import slogdet as slog

    a = _random_complex((2, 6, 6), seed=41) + 1.5 * jnp.eye(
        6, dtype=jnp.complex64
    )
    rng = np.random.RandomState(2)
    v = jnp.asarray(
        0.3 * (rng.randn(2, 6, 6) + 1j * rng.randn(2, 6, 6)), jnp.complex64
    )

    def make_f(op):
        def f(x):
            sign, logabs = op(x)
            return jnp.sum(logabs)

        return f

    def ke(op, x):
        # jvp(grad f) — the kinetic-energy access pattern (f is real;
        # grad of a real function of a complex input is well-defined)
        g = jax.grad(make_f(op))
        return jax.jvp(g, (x,), (v,))

    w_p, w_t = ke(jnp.linalg.slogdet, a)
    fl.set_det_kernel("interpret")
    try:
        g_p, g_t = ke(slog.slogdet_op, a)
    finally:
        fl.set_det_kernel(None)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(w_p),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(w_t),
                               rtol=2e-3, atol=2e-3)


def test_vmap_closed_over_unbatched_operand():
    """custom_vmap rule with in_batched=(False,): the operand is closed
    over, so outputs must replicate to axis_size (not stay size-1)."""
    import jax

    key = jax.random.PRNGKey(0)
    a = (
        jax.random.normal(key, (5, 5))
        + 1j * jax.random.normal(jax.random.PRNGKey(1), (5, 5))
    ).astype(jnp.complex64)
    out = jax.vmap(lambda s: gj_inverse_slogdet_interpret(a)[2] * s)(
        jnp.ones(4)
    )
    assert out.shape == (4,)
    ref = jnp.linalg.slogdet(a)[1]
    np.testing.assert_allclose(np.asarray(out), np.full(4, float(ref)),
                               rtol=1e-5)
