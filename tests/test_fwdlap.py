"""Forward-Laplacian engine: agreement with autodiff oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.models.fwdlap_forward import (
    make_kinetic_forward,
    make_logpsi_and_kinetic,
    network_jets,
)
from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.ops import fwdlap as fl
from deepsolid_tpu.ops.laplacian import make_kinetic
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.scf.free_electron import free_electron_klist

from fixtures import h2_supercell, lih_supercell


def build(sc, full_det=False, distance_type="nu", envelope="isotropic",
          dets=2, hidden=((16, 4), (16, 4))):
    klist = free_electron_klist(sc)
    net = make_network(
        sc,
        klist,
        NetworkConfig(
            hidden_dims=hidden,
            determinants=dets,
            envelope_type=envelope,
            full_det=full_det,
            distance_type=distance_type,
        ),
    )
    key = jax.random.PRNGKey(11)
    params = net.init(key)
    x = init_electrons(key, sc, sc.nelec, batch_size=1)[0]
    return net, params, x


def test_jet_algebra_basics():
    # jets of f(z) = tanh(z @ w) * exp(z1) against autodiff
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(4, 3))
    z0 = jnp.asarray(rng.randn(4))

    def f(z):
        return jnp.tanh(z @ w) * jnp.exp(z[1])

    seed = fl.Jet(z0, jnp.eye(4), jnp.zeros(4))
    z1 = fl.Jet(z0[1:2], jnp.eye(4)[:, 1:2], jnp.zeros((1,)))
    out = fl.mul(fl.tanh(fl.dense(seed, w)), fl.exp(z1))
    np.testing.assert_allclose(np.asarray(out.val), np.asarray(f(z0)), rtol=1e-10)
    jac = jax.jacfwd(f)(z0)
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(jac.T), rtol=1e-9)
    hess = jax.hessian(f)(z0)
    lap = jnp.trace(hess, axis1=-2, axis2=-1)
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(lap), rtol=1e-9)


def test_mul_row_matches_dense_mul():
    # mul_row (row-local factor, scatter-free slab-mask form) against
    # fl.mul with the factor's jac embedded densely, global + sharded
    rng = np.random.default_rng(0)
    n_total, d_dim, rows, f_dim, off = 7, 2, 3, 4, 2
    t_glob = 3 * n_total

    def c(*s):
        return jnp.asarray(rng.normal(size=s) + 1j * rng.normal(size=s))

    a = fl.Jet(c(d_dim, rows, f_dim), c(t_glob, d_dim, rows, f_dim),
               c(d_dim, rows, f_dim))
    b_val, b_lap = c(d_dim, rows, f_dim), c(d_dim, rows, f_dim)
    b_jac3 = c(3, d_dim, rows, f_dim)

    bj_dense = jnp.zeros((t_glob, d_dim, rows, f_dim), complex)
    for i in range(rows):
        for cc in range(3):
            bj_dense = bj_dense.at[3 * (off + i) + cc, :, i, :].set(
                b_jac3[cc, :, i, :])
    ref = fl.mul(a, fl.Jet(b_val, bj_dense, b_lap))
    got = fl.mul_row(a, b_val, b_jac3, b_lap, n_total=n_total, offset=off)
    for name in ("val", "jac", "lap"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)), rtol=1e-12)

    # sharded tangents: 3 devices x 7 tangent rows
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:3]), ("t",))
    spec = jax.sharding.PartitionSpec

    def local(ajac):
        out = fl.mul_row(fl.Jet(a.val, ajac, a.lap), b_val, b_jac3, b_lap,
                         n_total=n_total, offset=off, axis_name="t")
        return out.jac, out.lap

    jac_sh, lap_sh = jax.shard_map(
        local, mesh=mesh, in_specs=spec("t"), out_specs=(spec("t"), spec())
    )(a.jac)
    np.testing.assert_allclose(np.asarray(jac_sh), np.asarray(got.jac),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lap_sh), np.asarray(got.lap),
                               rtol=1e-12)


@pytest.mark.parametrize("full_det", [False, True])
def test_value_matches_network(full_det):
    sc = lih_supercell()
    net, params, x = build(sc, full_det=full_det)
    jet = network_jets(params, x, net.spec, net.cfg)
    want = net.logdet(params, x)
    np.testing.assert_allclose(complex(jet.val), complex(want), rtol=1e-9)


@pytest.mark.parametrize(
    "distance_type",
    # 'nu' is the production distance type and stays the default-suite
    # hessian oracle; the 'tri' variant re-runs the same heavyweight
    # oracle (~45 s) and tri's analytic jets are already covered by
    # test_feature_jets, so it rides the slow lane (suite budget).
    ["nu", pytest.param("tri", marks=pytest.mark.slow)],
)
@pytest.mark.parametrize("full_det", [False, True])
def test_kinetic_matches_hessian(full_det, distance_type):
    sc = lih_supercell()
    net, params, x = build(sc, full_det=full_det, distance_type=distance_type)
    kin_fwd = make_kinetic_forward(net)
    kin_ref = make_kinetic(net.logdet, mode="hessian")
    got = complex(kin_fwd(params, x))
    want = complex(kin_ref(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-7)


@pytest.mark.slow  # heavyweight oracle; lighter default-suite coverage exists
def test_kinetic_matches_hessian_spin_polarized():
    from deepsolid_tpu.system import Atom, Cell, make_supercell

    # single H atom cell: spins (1, 0) — exercises the single-channel path
    cell = Cell.from_atoms(
        [Atom("H", (1.0, 0, 0))], np.diag([2.0, 10.0, 10.0]), spin=1
    )
    sc = make_supercell(cell, np.diag([2, 1, 1]))
    net, params, x = build(sc)
    got = complex(make_kinetic_forward(net)(params, x))
    want = complex(make_kinetic(net.logdet, mode="hessian")(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_kinetic_matches_hessian_h2_and_gradjets():
    sc = h2_supercell()
    net, params, x = build(sc, dets=4)
    jet = network_jets(params, x, net.spec, net.cfg)
    # jac must equal grad of logdet (complex split)
    gu = jax.grad(lambda p, y: net.logdet(p, y).real, argnums=1)(params, x)
    gv = jax.grad(lambda p, y: net.logdet(p, y).imag, argnums=1)(params, x)
    np.testing.assert_allclose(
        np.asarray(jet.jac), np.asarray(gu + 1j * gv), rtol=1e-7, atol=1e-10
    )


def test_local_energy_forward_mode():
    from deepsolid_tpu.hamiltonian import make_local_energy

    sc = h2_supercell()
    net, params, x = build(sc)
    el_fwd = make_local_energy(net.logdet, sc, mode="forward", network=net)
    el_ref = make_local_energy(net.logdet, sc, mode="hessian")
    ke1, ew1 = el_fwd(params, x)
    ke2, ew2 = el_ref(params, x)
    np.testing.assert_allclose(complex(ke1), complex(ke2), rtol=1e-7)
    np.testing.assert_allclose(float(ew1), float(ew2), rtol=1e-10)


@pytest.mark.parametrize("gauss_split", [False, True])
def test_slogdet_jet_complex_against_autodiff(gauss_split, request):
    """Direct f64 oracle for the complex det head, on BOTH tangent-product
    lowerings (naive complex matmul and the Gauss 3-multiplication split
    of A^-1 J_t): jet of log det A(z) for a dense complex matrix-valued
    function vs jacfwd/hessian."""
    fl.set_gauss_split(gauss_split)
    request.addfinalizer(lambda: fl.set_gauss_split(None))
    rng = np.random.RandomState(3)
    n, m = 4, 5  # n x n complex matrix, m tangent directions
    w_re = jnp.asarray(rng.randn(m, n * n))
    w_im = jnp.asarray(rng.randn(m, n * n))
    base = jnp.asarray(rng.randn(n, n) + 1j * rng.randn(n, n) + 4 * np.eye(n))

    def mat(z):
        d = (z @ w_re + 1j * (z @ w_im))
        return base + (d + 0.1 * d * d).reshape(n, n)  # nonzero laplacian

    def logdet(z):
        sign, l = jnp.linalg.slogdet(mat(z))
        return l + jnp.log(sign)

    z0 = jnp.asarray(rng.randn(m))
    seed = fl.Jet(z0, jnp.eye(m), jnp.zeros(m))
    d = fl.complexify(fl.dense(seed, w_re), fl.dense(seed, w_im))
    quad = fl.mul(d, d)
    flat = fl.Jet(d.val + 0.1 * quad.val, d.jac + 0.1 * quad.jac,
                  d.lap + 0.1 * quad.lap)
    mjet = fl.linear_op(lambda v: v.reshape(v.shape[:-1] + (n, n)), flat)
    mjet = fl.Jet(base + mjet.val, mjet.jac, mjet.lap)
    sign, out = fl.slogdet_jet(mjet)

    np.testing.assert_allclose(
        np.asarray(out.val + jnp.log(sign)), np.asarray(logdet(z0)),
        rtol=1e-9, atol=1e-12,
    )
    jac = jax.jacfwd(logdet)(z0)
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(jac),
                               rtol=1e-8, atol=1e-10)
    # jax.hessian = jacrev(jacfwd) rejects complex outputs; the input is
    # real so double-jacfwd is the right oracle
    hess = jax.jacfwd(jax.jacfwd(logdet))(z0)
    lap = jnp.trace(hess, axis1=-2, axis2=-1)
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(lap),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.slow  # opt-in knob, gated out of production (config.py)
def test_jet_storage_bf16_kinetic(request):
    """bf16 trunk-jac storage (cfg.jet_storage='bf16'): the kinetic energy
    of an f32 network stays within ~1% of the full-f32 evaluation (storage
    rounding is ~0.4% relative noise injected once per layer; all compute
    stays f32), and f64 evaluations are BIT-EXACT regardless of the
    setting (store_jac no-ops on non-f32 inputs, so precision anchors and
    CPU-f64 re-evals are never degraded)."""
    sc = lih_supercell()
    net, params, x = build(sc)
    kin = make_kinetic_forward(net)
    f64_ref = complex(kin(params, x))

    p32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
        params,
    )
    x32 = x.astype(jnp.float32)
    f32_val = complex(kin(p32, x32))

    fl.set_jet_storage("bf16")
    request.addfinalizer(lambda: fl.set_jet_storage(None))
    bf16_val = complex(kin(p32, x32))
    assert abs(bf16_val - f32_val) <= 0.01 * abs(f32_val) + 5e-3, (
        f"bf16 storage kinetic {bf16_val} vs f32 {f32_val}"
    )
    # f64 path unchanged under the bf16 setting
    assert complex(kin(params, x)) == f64_ref


@pytest.mark.parametrize("full_det", [False, True])
def test_orbital_det_scan_matches_full_width(full_det, monkeypatch):
    """The opt-in tangent-chunked orbital+det head (fwdlap_forward.
    _orbital_det_scan, DEEPSOLID_TPU_ORB_SCAN=on — the memory lever for
    large electron counts) must reproduce the full-width path's jet
    exactly up to summation order."""
    sc = lih_supercell()
    net, params, x = build(sc, full_det=full_det, dets=2)
    monkeypatch.delenv("DEEPSOLID_TPU_ORB_SCAN", raising=False)
    want = network_jets(params, x, net.spec, net.cfg)
    monkeypatch.setenv("DEEPSOLID_TPU_ORB_SCAN", "on")
    got = network_jets(params, x, net.spec, net.cfg)
    np.testing.assert_allclose(np.asarray(got.val), np.asarray(want.val),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.jac), np.asarray(want.jac),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.lap), np.asarray(want.lap),
                               rtol=1e-9, atol=1e-12)
