"""Native KFAC optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsolid_tpu.models.network import NetworkConfig, make_network
from deepsolid_tpu.optim.kfac import KfacOptimizer, pi_adjusted_inverse, psd_inv_cholesky
from deepsolid_tpu.sampling.init import init_electrons
from deepsolid_tpu.scf.free_electron import free_electron_klist

from fixtures import lih_supercell


def small_setup(batch=16):
    sc = lih_supercell()
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((16, 4), (16, 4)), determinants=2),
    )
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    data = init_electrons(key, sc, sc.nelec, batch_size=batch)
    opt = KfacOptimizer(
        network=net, learning_rate_schedule=lambda t: 0.05, damping=1e-3
    )
    return sc, net, params, data, opt


def test_psd_inv_cholesky():
    rng = np.random.RandomState(0)
    m = rng.randn(5, 5)
    f = m @ m.T
    inv = psd_inv_cholesky(jnp.asarray(f), 0.1)
    np.testing.assert_allclose(
        np.asarray(inv), np.linalg.inv(f + 0.1 * np.eye(5)), rtol=1e-8
    )


def test_pi_adjusted_inverse_reconstruction():
    """Damped Kronecker inverse: (A x G + lambda I)^-1 approx inv0 x inv1."""
    rng = np.random.RandomState(1)
    a = rng.randn(4, 4)
    a = a @ a.T + 0.5 * np.eye(4)
    g = rng.randn(3, 3)
    g = g @ g.T + 0.5 * np.eye(3)
    # exact in the lam -> 0 limit
    inv0, inv1 = pi_adjusted_inverse(jnp.asarray(a), jnp.asarray(g), 1e-14)
    kron_inv = np.kron(np.asarray(inv0), np.asarray(inv1))
    np.testing.assert_allclose(
        kron_inv, np.linalg.inv(np.kron(a, g)), rtol=1e-4, atol=1e-7
    )
    # with damping it's the pi-split approximation: (A+pi*sqrt(l))x(G+sqrt(l)/pi)
    # whose cross terms scale as sqrt(lam); just require the right ballpark
    lam = 1e-3
    inv0, inv1 = pi_adjusted_inverse(jnp.asarray(a), jnp.asarray(g), lam)
    kron_inv = np.kron(np.asarray(inv0), np.asarray(inv1))
    exact = np.linalg.inv(np.kron(a, g) + lam * np.eye(12))
    err = np.abs(kron_inv - exact).max() / np.abs(exact).max()
    assert err < 0.15, err


def test_zero_factor_guard():
    z = jnp.zeros((3, 3))
    g = jnp.eye(2)
    inv0, inv1 = pi_adjusted_inverse(z, g, 0.01)
    assert np.all(np.isfinite(np.asarray(inv0)))
    np.testing.assert_allclose(np.asarray(inv0), np.eye(3) / np.sqrt(0.01))


def test_state_and_curvature_shapes():
    sc, net, params, data, opt = small_setup()
    state = opt.init(params, data)
    reg = net.layer_registry(params)
    assert set(state["blocks"]) == set(reg)
    # envelope params are covered by diagonal blocks
    assert any("envelope" in k for k in state["diag"])

    state2 = opt.update_curvature(state, params, data)
    for name, block in state2["blocks"].items():
        a = np.asarray(block["a_raw"])
        g = np.asarray(block["g_raw"])
        np.testing.assert_allclose(a, a.T, atol=1e-10)
        np.testing.assert_allclose(g, g.T, atol=1e-10)
        # PSD: eigenvalues >= 0
        assert np.linalg.eigvalsh(a).min() > -1e-10
        assert np.linalg.eigvalsh(g).min() > -1e-10
        assert float(block["weight"]) == 1.0


def test_capture_dy_matches_autodiff():
    """dy for a layer equals sqrt(2) * d(log psi)/d(layer output)."""
    sc, net, params, data, opt = small_setup(batch=2)
    taps, dy, diag_grads = opt._capture(params, data)
    name = "orbital_0"

    # independent computation via jacrev on the eps-perturbed forward
    shapes = opt._tap_shapes(params, data.shape[-1:],
                             jax.tree_util.tree_leaves(params)[0].dtype)
    out_shape = shapes[name][1]

    def f(e):
        def one(x, e1):
            return net.logdet_with_taps(params, x, eps={name: e1})[0]

        return jax.vmap(one)(data, e)

    eps0 = jnp.zeros((2,) + out_shape)
    jac_re = jax.jacrev(lambda e: f(e).real.sum())(eps0)
    jac_im = jax.jacrev(lambda e: f(e).imag.sum())(eps0)
    np.testing.assert_allclose(
        np.asarray(dy[name][0]), np.sqrt(2) * np.asarray(jac_re), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(dy[name][1]), np.sqrt(2) * np.asarray(jac_im), rtol=1e-8
    )


def test_step_norm_constraint():
    """lr^2 * <precond, grads> <= norm_constraint after scaling."""
    sc, net, params, data, opt = small_setup()
    state = opt.init(params, data)
    state = opt.update_curvature(state, params, data)

    # fake grads: use parameter-shaped random values
    key = jax.random.PRNGKey(5)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    grads = jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
         for i, l in enumerate(leaves)],
    )
    new_params, new_state = opt.step_fn(params, state, grads, opt.damping)
    assert int(new_state["step"]) == 1
    # update actually changed the params and is finite
    diffs = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                   new_params, params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert all(
        np.all(np.isfinite(np.asarray(v)))
        for v in jax.tree_util.tree_leaves(new_params)
    )


def test_envelope_kronecker_block_matches_explicit_fisher():
    """Full-envelope sigma gets a per-atom Kronecker block (reference:
    QmcBlockedDense, curvature_tags_and_blocks.py:56-132). With ONE walker
    and ONE electron the Kronecker factorization is exact:
    F = extra_scale * (A kron G) must equal the explicit Fisher
    2 (J_re J_re^T + J_im J_im^T) of log psi w.r.t. vec(sigma)."""
    import numpy as np

    from deepsolid_tpu.system import Atom, Cell, make_supercell

    cell = Cell.from_atoms([Atom("H", (1.0, 1.2, 0.8))], np.eye(3) * 6.0,
                           spin=1)
    sc = make_supercell(cell, np.eye(3))
    net = make_network(
        sc,
        free_electron_klist(sc),
        NetworkConfig(hidden_dims=((8, 4),), determinants=2,
                      envelope_type="full"),
    )
    key = jax.random.PRNGKey(3)
    params = net.init(key)
    data = init_electrons(key, sc, sc.nelec, batch_size=1)
    opt = KfacOptimizer(
        network=net, learning_rate_schedule=lambda t: 0.05, damping=1e-3
    )
    state = opt.init(params, data)
    state = opt.update_curvature(state, params, data)
    blk = state["env_blocks"]["envelope_0"]
    a = np.asarray(blk["a_raw"][0])
    g = np.asarray(blk["g_raw"][0])
    f_kron = float(blk["extra_scale"]) * np.kron(a, g)

    sigma = params["envelope"][0]["sigma"]  # (k, m, natom=1, np)
    k, m, natom, npar = sigma.shape
    x = data[0]

    def logpsi_sigma(s, part):
        p2 = jax.tree_util.tree_map(lambda v: v, params)
        p2["envelope"][0]["sigma"] = s
        out = net.logdet(p2, x)
        return out.real if part == "re" else out.imag

    vecs = []
    for part in ("re", "im"):
        jac = jax.jacrev(lambda s: logpsi_sigma(s, part))(sigma)
        # vec order must match the block layout: k-major, then (m, np)
        jac = np.asarray(jac).transpose(2, 0, 1, 3)[0].reshape(-1)
        vecs.append(jac)
    f_exact = 2.0 * (np.outer(vecs[0], vecs[0]) + np.outer(vecs[1], vecs[1]))
    np.testing.assert_allclose(f_kron, f_exact, rtol=1e-8, atol=1e-12)


def _random_grads(params, seed=5):
    key = jax.random.PRNGKey(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
         for i, l in enumerate(leaves)],
    )


def test_fisher_quadratic_nonnegative():
    """v^T F v >= 0 for the block-approximate Fisher (it is a sum of PSD
    Kronecker/diagonal blocks)."""
    sc, net, params, data, opt = small_setup()
    state = opt.init(params, data)
    state = opt.update_curvature(state, params, data)
    for seed in (1, 2, 3):
        v = _random_grads(params, seed)
        q = float(opt.fisher_quadratic(state, params, v))
        assert np.isfinite(q) and q >= 0.0, q


def test_adaptive_damping_rho_rule():
    """LM rule: rho=1 (perfect model) shrinks damping by decay^interval,
    rho=0 (no actual progress) grows it; clamped to [min, max]."""
    sc, net, params, data, _ = small_setup()
    opt = KfacOptimizer(
        network=net, learning_rate_schedule=lambda t: 0.05, damping=1e-3,
        adaptive_damping=True, damping_adaptation_interval=5,
        damping_adaptation_decay=0.9, min_damping=1e-6, max_damping=1.0,
    )
    state = opt.init(params, data)
    state = opt.update_curvature(state, params, data)
    grads = _random_grads(params)
    delta = jax.tree_util.tree_map(lambda g: -1e-3 * g, grads)
    new_params = jax.tree_util.tree_map(jnp.add, params, delta)

    def inner(a, b):
        return sum(
            jnp.sum(x * y)
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        )

    quad = float(
        inner(grads, delta)
        + 0.5 * opt.fisher_quadratic(state, new_params, delta)
        + 0.5 * state["damping"] * inner(delta, delta)
    )
    assert quad < 0.0  # descent direction: model predicts a decrease
    omega = opt.damping_adaptation_decay ** opt.damping_adaptation_interval

    # rho = 1: actual change equals predicted -> damping shrinks
    st = opt.adapt_damping(state, params, new_params, grads, 0.0, quad)
    np.testing.assert_allclose(float(st["rho"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        float(st["damping"]), float(state["damping"]) * omega, rtol=1e-6
    )
    # rho = 0: no actual progress -> damping grows
    st = opt.adapt_damping(state, params, new_params, grads, 0.0, 0.0)
    np.testing.assert_allclose(float(st["rho"]), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        float(st["damping"]), float(state["damping"]) / omega, rtol=1e-6
    )
    # degenerate quad >= 0 is treated as rho = -1 -> damping grows
    st2 = opt.adapt_damping(state, params, params, grads, 0.0, 0.0)
    np.testing.assert_allclose(float(st2["rho"]), -1.0, atol=1e-9)
    # clamping
    opt_hi = KfacOptimizer(
        network=net, learning_rate_schedule=lambda t: 0.05, damping=1e-3,
        adaptive_damping=True, min_damping=9e-4, max_damping=1.1e-3,
    )
    st = opt_hi.adapt_damping(state, params, new_params, grads, 0.0, quad)
    assert float(st["damping"]) >= 9e-4 - 1e-12


@pytest.mark.slow  # heavyweight oracle; lighter default-suite coverage exists
def test_kfac_e2e_adaptive_damping():
    """Training with adaptive damping runs end-to-end and logs a damping
    trajectory that actually moves."""
    import os
    import tempfile

    from deepsolid_tpu.train import process
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir, "kfac", iterations=12)
        cfg.optim.kfac.adaptive_damping = True
        cfg.optim.kfac.damping_adaptation_interval = 2
        params, data, energy = process.process(cfg)
        assert np.isfinite(energy)
        csv = os.path.join(tmpdir, "train_stats.csv")
        header = open(csv).readline().strip().split(",")
        assert "damping" in header
        col = header.index("damping")
        rows = [l.split(",") for l in open(csv).read().strip().split("\n")[1:]]
        dampings = np.array([float(r[col]) for r in rows])
        assert np.all(np.isfinite(dampings))
        assert dampings.min() != dampings.max()  # the LM rule engaged


@pytest.mark.slow  # ~100 s; the env-block Fisher equality test is default
def test_kfac_e2e_full_envelope_smoke():
    """The KFAC step runs end-to-end with envelope_type='full' (the
    env Kronecker blocks flow through curvature, inverse, precondition)."""
    import tempfile

    from deepsolid_tpu.train import process
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir, "kfac", iterations=2)
        cfg.network.detnet.envelope_type = "full"
        params, data, energy = process.process(cfg)
        assert np.isfinite(energy)


def test_kfac_e2e_training():
    """KFAC demonstrably optimizes the H2 wavefunction over a short run.

    The descent signal is the LOCAL-ENERGY VARIANCE, not the raw energy:
    before the sampler equilibrates, mean E_L over non-|psi|^2 walkers is
    not a variational bound and can sit far BELOW the true ground state,
    so "energy(last) < energy(first)" tests walker equilibration, not
    optimization (round-1 failure mode). Var[E_L] -> 0 as psi approaches
    an eigenstate and is insensitive to that bias. Deterministic seeds via
    small_cfg (debug.deterministic).
    """
    import tempfile

    from deepsolid_tpu.train import process
    from test_train_e2e import small_cfg

    with tempfile.TemporaryDirectory() as tmpdir:
        cfg = small_cfg(tmpdir, "kfac", iterations=30)
        cfg.optim.lr.rate = 0.05
        cfg.mcmc.burn_in = 40  # equilibrate before the measured window
        params, data, energy = process.process(cfg)
        assert np.isfinite(energy)
        import os

        csv = os.path.join(tmpdir, "train_stats.csv")
        rows = [l.split(",") for l in open(csv).read().strip().split("\n")[1:]]
        energies = np.array([float(r[1]) for r in rows])
        variances = np.array([float(r[2]) for r in rows])
        assert np.all(np.isfinite(energies))
        # optimization evidence: the residual Var[E_L] shrinks hard
        assert np.mean(variances[-5:]) < 0.5 * np.mean(variances[:5]), (
            variances,
        )


def test_fisher_gradients_mode_unbiased():
    """MC capture (estimation_mode='fisher_gradients') has the exact
    two-pass factors as its expectation: averaging the g-factor sums over
    many seeds must converge to fisher_exact's d_re^T d_re + d_im^T d_im
    (reference estimator.py:264-269 semantics)."""
    import dataclasses as _dc

    sc, net, params, data, opt = small_setup(batch=4)
    mc_opt = _dc.replace(opt, estimation_mode="fisher_gradients")

    _, _, exact_diag = opt._factor_sums(params, data)
    exact_dense, _, _ = opt._factor_sums(params, data)

    name = next(iter(exact_dense))
    g_exact = np.asarray(exact_dense[name][1])
    a_exact = np.asarray(exact_dense[name][0])

    n_seeds = 400
    mc_fn = jax.jit(
        lambda r: mc_opt._factor_sums(params, data, rng=r)[0][name]
    )
    acc_g = 0.0
    acc_a = 0.0
    for i in range(n_seeds):
        a_s, g_s = mc_fn(jax.random.PRNGKey(1000 + i))
        acc_a = acc_a + np.asarray(a_s)
        acc_g = acc_g + np.asarray(g_s)
    # the A factor (layer inputs) is seed-independent — must match exactly
    np.testing.assert_allclose(acc_a / n_seeds, a_exact, rtol=1e-10)
    # the G factor is a 400-sample MC mean of a rank-1-per-walker
    # estimator: compare at the statistical scale
    scale = np.abs(g_exact).max()
    err = np.abs(acc_g / n_seeds - g_exact).max() / scale
    assert err < 0.25, f"MC G factor off by {err:.3f} of scale"


@pytest.mark.parametrize(
    "mode", ["fisher_gradients", "fisher_curvature_prop"]
)
def test_mc_estimation_modes_e2e_descend(mode):
    """MC curvature still trains: short KFAC run lowers the loss for
    each estimation mode (reference estimator.py:264-320 offers all
    three; fisher_exact is the production default exercised by
    test_kfac_e2e_training)."""
    import dataclasses as _dc
    import functools

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deepsolid_tpu.parallel import DATA_AXIS
    from deepsolid_tpu.train.loss import make_loss

    sc, net, params, data, opt = small_setup(batch=32)
    opt = _dc.replace(opt, estimation_mode=mode)
    total_energy = make_loss(
        net.logdet, net.batch_logdet, sc, mode="forward", network_obj=net
    )
    val_and_grad = jax.value_and_grad(total_energy, argnums=0, has_aux=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), (DATA_AXIS,))
    p = jax.device_put(params, NamedSharding(mesh, P()))
    d = jax.device_put(np.asarray(data), NamedSharding(mesh, P(DATA_AXIS)))
    state = opt.init(p, d, mesh)
    noop_mcmc = lambda p_, d_, k_, w_: (d_, jnp.zeros(()))
    step = opt.make_train_step(mesh, noop_mcmc, val_and_grad)
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(12):
        key, sub = jax.random.split(key)
        p, d, state, _, stats = step(p, d, state, sub, jnp.asarray(0.1))
        losses.append(float(stats[0]))
    assert losses[-1] < losses[0], losses


def test_curvature_prop_mode_unbiased_and_distinct():
    """fisher_curvature_prop (Rademacher seeds): unbiased like
    fisher_gradients, with |z| = 1 exactly — the A factor is identical,
    the single-seed G factor differs from the normal-seeded one."""
    import dataclasses as _dc

    sc, net, params, data, opt = small_setup(batch=4)
    exact_dense, _, _ = opt._factor_sums(params, data)
    name = next(iter(exact_dense))

    cp = _dc.replace(opt, estimation_mode="fisher_curvature_prop")
    fg = _dc.replace(opt, estimation_mode="fisher_gradients")
    key = jax.random.PRNGKey(77)
    d_cp, _, _ = cp._factor_sums(params, data, rng=key)
    d_fg, _, _ = fg._factor_sums(params, data, rng=key)
    np.testing.assert_allclose(
        np.asarray(d_cp[name][0]), np.asarray(exact_dense[name][0]),
        rtol=1e-10,
    )
    assert not np.allclose(
        np.asarray(d_cp[name][1]), np.asarray(d_fg[name][1])
    )

    acc = 0.0
    n_seeds = 300
    cp_fn = jax.jit(
        lambda r: cp._factor_sums(params, data, rng=r)[0][name][1]
    )
    for i in range(n_seeds):
        acc = acc + np.asarray(cp_fn(jax.random.PRNGKey(2000 + i)))
    g_exact = np.asarray(exact_dense[name][1])
    err = np.abs(acc / n_seeds - g_exact).max() / np.abs(g_exact).max()
    assert err < 0.25, err
