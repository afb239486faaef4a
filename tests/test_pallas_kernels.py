"""Pallas jet kernels: interpret-mode correctness against the jnp rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl


def make_case(t_dim=12, n=10, d_in=20, d_out=12, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    val = jnp.asarray(rng.randn(n, d_in), dtype)
    jac = jnp.asarray(rng.randn(t_dim, n, d_in), dtype)
    lap = jnp.asarray(rng.randn(n, d_in), dtype)
    w = jnp.asarray(rng.randn(d_in, d_out) / np.sqrt(d_in), dtype)
    b = jnp.asarray(rng.randn(d_out), dtype)
    return val, jac, lap, w, b


@pytest.mark.parametrize("shape", [(12, 10, 20, 12), (8, 4, 132, 256)])
def test_fused_dense_tanh_jet_interpret(shape, monkeypatch):
    from deepsolid_tpu.ops.pallas import jet_kernels

    # run the pallas kernel in interpreter mode on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(jet_kernels.pl, "pallas_call", interp_call)

    t_dim, n, d_in, d_out = shape
    val, jac, lap, w, b = make_case(t_dim, n, d_in, d_out)
    got = jet_kernels.fused_dense_tanh_jet(val, jac, lap, w, b,
                                           block_n=8, block_c=128, block_t=4)
    want = jet_kernels.dense_tanh_jet_reference(val, jac, lap, w, b)
    for g, wnt, name in zip(got, want, ("val", "jac", "lap")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_fused_dense_tanh_jet_partial_sharded_recombination(monkeypatch):
    """The partial kernel run per tangent shard + a cross-shard sum of `s`
    reproduces the unsharded jet rule (this is what dense_tanh does with
    psum when the 'deriv' mesh axis shards the tangents)."""
    from deepsolid_tpu.ops.pallas import jet_kernels

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(jet_kernels.pl, "pallas_call", interp_call)

    t_dim, n, d_in, d_out = 12, 10, 20, 12
    val, jac, lap, w, b = make_case(t_dim, n, d_in, d_out)
    shards = [
        jet_kernels.fused_dense_tanh_jet_partial(
            val, jac[k * 6:(k + 1) * 6], lap, w, b,
            block_n=8, block_c=128, block_t=4,
        )
        for k in range(2)
    ]
    s = shards[0][3] + shards[1][3]  # the psum over the deriv axis
    v = shards[0][0]
    lap_got = shards[0][2] + (-2.0 * v * (1.0 - v * v)) * s
    jac_got = jnp.concatenate([sh[1] for sh in shards], axis=0)

    want_v, want_j, want_l = jet_kernels.dense_tanh_jet_reference(
        val, jac, lap, w, b
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jac_got), np.asarray(want_j),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lap_got), np.asarray(want_l),
                               rtol=2e-5, atol=2e-5)


def test_fwdlap_dense_tanh_wrapper_fallback():
    """On CPU the wrapper must silently use the jnp path and agree."""
    from deepsolid_tpu.ops import fwdlap as fl

    val, jac, lap, w, b = make_case(6, 5, 8, 4, dtype=jnp.float64)
    jet = fl.Jet(val, jac, lap)
    out = fl.dense_tanh(jet, w, b)
    ref = fl.tanh(fl.dense(jet, w, b))
    np.testing.assert_allclose(np.asarray(out.val), np.asarray(ref.val))
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(ref.jac))
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(ref.lap))


def test_tangent_precision_plumbing(monkeypatch):
    """The tangent-precision tier threads through the jnp jet ops and the
    fused kernels (interpret mode) without changing CPU results — on CPU
    every precision tier is the same f32 arithmetic, so this pins the
    plumbing (static-arg hashability, kernel closure) rather than values."""
    import jax
    import numpy as np

    from deepsolid_tpu.ops import fwdlap as fl

    rng = np.random.default_rng(3)
    t_dim, n, d_in, d_out = 12, 8, 16, 24
    jet = fl.Jet(
        val=jnp.asarray(rng.normal(size=(n, d_in)), jnp.float32),
        jac=jnp.asarray(rng.normal(size=(t_dim, n, d_in)), jnp.float32),
        lap=jnp.asarray(rng.normal(size=(n, d_in)), jnp.float32),
    )
    w = jnp.asarray(rng.normal(size=(d_in, d_out)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(d_out,)), jnp.float32)

    base = fl.dense_tanh(jet, w, b)
    try:
        fl.set_tangent_precision("high")
        assert fl._TANGENT_PRECISION == jax.lax.Precision.HIGH
        tiered = fl.dense_tanh(jet, w, b)
    finally:
        fl.set_tangent_precision(None)
    np.testing.assert_allclose(np.asarray(tiered.jac), np.asarray(base.jac),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tiered.lap), np.asarray(base.lap),
                               rtol=1e-6)

    # fused kernel path in interpret mode with the non-default tier
    import functools
    from jax.experimental import pallas as pl_mod
    orig_call = pl_mod.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    monkeypatch.setattr(pl_mod, "pallas_call", patched)
    from deepsolid_tpu.ops.pallas import jet_kernels

    v, j, l = jet_kernels.fused_dense_tanh_jet(
        jet.val, jet.jac, jet.lap, w, b,
        jac_precision=jax.lax.Precision.HIGH,
    )
    np.testing.assert_allclose(np.asarray(j), np.asarray(base.jac),
                               rtol=1e-5, atol=1e-6)
    # lap carries the tangent square-sum: f32 accumulation order differs
    # between the kernel scratch loop and the jnp reduction
    np.testing.assert_allclose(np.asarray(l), np.asarray(base.lap),
                               rtol=1e-4, atol=1e-4)


def test_pick_bn_auto_minimizes_padding():
    from deepsolid_tpu.ops.pallas.jet_kernels import _pick_bn

    assert _pick_bn(96, None) == 96     # C-diamond 2x2x2: zero padding
    assert _pick_bn(162, None) == 56    # bcc-Li 3x3x3: 168 rows, 6 pad
    assert _pick_bn(64, None) == 64
    assert _pick_bn(10, None) == 16     # round_up(10, 8) = 16, pad 6
    assert _pick_bn(256, None) == 128   # large n: cap at 128, zero pad
    assert _pick_bn(96, 64) == 64       # explicit override keeps legacy
    assert _pick_bn(4, 64) == 8         # explicit caps at round_up(n, 8)


def test_fused_dense_tanh_jet_interpret_auto_bn(monkeypatch):
    """Auto block_n (n=96 -> bn=96, no padded rows) matches the jnp rule."""
    from deepsolid_tpu.ops.pallas import jet_kernels

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(jet_kernels.pl, "pallas_call", interp_call)

    val, jac, lap, w, b = make_case(t_dim=8, n=96, d_in=32, d_out=16)
    got = jet_kernels.fused_dense_tanh_jet(val, jac, lap, w, b, block_t=4)
    want = jet_kernels.dense_tanh_jet_reference(val, jac, lap, w, b)
    for g, wnt, name in zip(got, want, ("val", "jac", "lap")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_fused_dense_tanh_jet_bf16_storage(monkeypatch):
    """bf16-stored tangent stream: the kernel upcasts the jac read to f32,
    computes everything (incl. the tangent-square accumulator) in f32, and
    rounds only the jac OUTPUT store — so val/lap match the f32 reference
    tightly while jac matches to bf16 storage precision."""
    from deepsolid_tpu.ops.pallas import jet_kernels

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(jet_kernels.pl, "pallas_call", interp_call)

    val, jac, lap, w, b = make_case(12, 10, 20, 12)
    jac_bf16 = jac.astype(jnp.bfloat16)
    got = jet_kernels.fused_dense_tanh_jet(val, jac_bf16, lap, w, b,
                                           block_n=8, block_c=128, block_t=4)
    assert got[1].dtype == jnp.bfloat16
    want = jet_kernels.dense_tanh_jet_reference(
        val, jac_bf16.astype(jnp.float32), lap, w, b
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-5, atol=2e-5, err_msg="val")
    np.testing.assert_allclose(
        np.asarray(got[1].astype(jnp.float32)), np.asarray(want[1]),
        rtol=0, atol=float(jnp.finfo(jnp.bfloat16).eps) * 8, err_msg="jac",
    )
    # lap's tangent-square accumulation runs in f32 OFF THE UPCAST READ —
    # no bf16 squaring anywhere, so lap matches the f32-of-bf16 reference
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               rtol=2e-5, atol=2e-5, err_msg="lap")
