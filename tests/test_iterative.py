"""Matrix-free iterative path: matvec vs dense, CG solve vs Cholesky solve,
SLQ logdet vs exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu.ops import iterative, kernels, linalg, rtensor

pytestmark = pytest.mark.heavy  # compile-heavy; -m "not heavy" fast loop


def _problem(n=40, dim=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-2, 2, (n, dim)))
    theta = jnp.asarray(rng.uniform(0.3, 1.5, dim))
    K = kernels.kern_grad("SqExp", rtensor.calc_rtensor(x, x), theta)
    n_data = K.shape[0]
    eta = 1e-6
    pvec = jnp.sqrt(jnp.diagonal(K))
    Keta = K + eta * jnp.diag(pvec ** 2)
    return x, theta, K, Keta, eta, pvec, n_data


def test_matvec_matches_dense():
    x, theta, K, Keta, eta, pvec, n_data = _problem()
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((n_data, 3)))
    got = iterative.kern_matvec("SqExp", x, theta, None, v, row_block=16,
                                eta=eta, pvec=pvec)
    want = Keta @ v
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_mbcg_solves():
    x, theta, K, Keta, eta, pvec, n_data = _problem()
    rng = np.random.default_rng(2)
    B = jnp.asarray(rng.standard_normal((n_data, 4)))

    # precondition with the diagonal (the precon trick as a CG preconditioner)
    Minv = 1.0 / jnp.diagonal(Keta)

    def mv(V):
        return iterative.kern_matvec("SqExp", x, theta, None, V, row_block=16,
                                     eta=eta, pvec=pvec)

    res = iterative.mbcg(mv, B, max_iters=400, tol=1e-12, M_inv_diag=Minv)
    want = jnp.linalg.solve(Keta, B)
    np.testing.assert_allclose(res.X, want, rtol=1e-6, atol=1e-8)
    assert float(jnp.max(res.residnorm)) < 1e-10


def test_slq_logdet():
    x, theta, K, Keta, eta, pvec, n_data = _problem(n=30)

    def mv(V):
        return iterative.kern_matvec("SqExp", x, theta, None, V, row_block=16,
                                     eta=eta, pvec=pvec)

    exact = float(2 * jnp.sum(jnp.log(jnp.diagonal(
        jnp.linalg.cholesky(Keta)))))
    est, _ = iterative.slq_logdet(mv, n_data, jax.random.PRNGKey(0),
                                  n_probes=64, max_iters=200,
                                  scale_diag=jnp.diagonal(Keta))
    # SLQ is a Monte-Carlo estimate (probe variance dominates)
    assert abs(float(est) - exact) < 0.10 * max(abs(exact), 10.0), \
        f"est {est} vs exact {exact}"


def test_iterative_mll_vs_dense():
    """Iterative MLL (CG + SLQ) against the dense path at moderate
    conditioning.  SLQ/Hutchinson are Monte-Carlo estimators: the value is
    accurate to ~1% of |logdet| and the gradient to ~15-20% per component at
    64 probes (the regime GPyTorch-style iterative GPs operate in)."""
    import jax
    from gpgradpy_tpu import GpConfig, GpData, Hypers, HpInfo, make_data_spec
    from gpgradpy_tpu.model import conditioning, likelihood, likelihood_iter
    from gpgradpy_tpu.types import hypers_to_hp_vec

    rng = np.random.default_rng(0)
    n, dim = 40, 3
    xx = rng.uniform(-2, 2, (n, dim))
    f = np.sum(xx ** 2, 1)
    g = 2 * xx
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e6)
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(xx), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n, dim)))
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.7, 1.1, 0.4]))

    dense = likelihood.calc_lkd(cfg, spec, data, hp, eta)
    it = likelihood_iter.calc_lkd_iterative(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=64,
        max_cg_iters=600, row_block=32)
    assert float(it.cg_resid) < 1e-8
    np.testing.assert_allclose(float(it.varK), float(dense.varK), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(it.beta), np.asarray(dense.beta),
                               rtol=1e-5)
    # SLQ logdet error scales with n_data (probe variance); assert in
    # per-datum nats rather than relative to the (cancellation-prone) lnlkd
    assert abs(float(it.ln_lkd) - float(dense.ln_lkd)) < 0.05 * spec.n_data

    info = HpInfo(dim=dim)
    vec = hypers_to_hp_vec(info, hp)
    _, gd, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data, vec, eta)
    gd_theta = np.asarray(gd) / (np.asarray(hp.theta) * np.log(10))
    _, gtheta, _ = likelihood_iter.neg_mll_iterative_and_grad(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=64,
        max_cg_iters=600, row_block=32)
    np.testing.assert_allclose(np.asarray(gtheta), gd_theta, rtol=0.25)


def test_iterative_noisy_mll_vs_dense():
    """Noisy-regime iterative MLL (varK and noise variances as numeric
    hyperparameters) against the dense noisy path; gradient over the full
    Hypers pytree via the exact quadratic surrogate + Hutchinson trace."""
    import jax
    from gpgradpy_tpu import GpConfig, GpData, Hypers, HpInfo, make_data_spec
    from gpgradpy_tpu.model import conditioning, likelihood, likelihood_iter
    from gpgradpy_tpu.types import hypers_to_hp_vec

    rng = np.random.default_rng(0)
    n, dim = 40, 3
    xx = rng.uniform(-2, 2, (n, dim))
    f = np.sum(xx ** 2, 1) + 0.01 * rng.standard_normal(n)
    g = 2 * xx + 0.01 * rng.standard_normal((n, dim))
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e4)
    # unknown noise -> var_fval/var_fgrad are numeric hyperparameters
    spec = make_data_spec(dim, True, n, std_fval=None, std_grad=None)
    assert spec.b_has_noisy_data
    data = GpData(x=jnp.asarray(xx), fval=jnp.asarray(f),
                  std_fval=None, grad=jnp.asarray(g), std_grad=None)
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.7, 1.1, 0.4]),
                varK=jnp.asarray(2.5), var_fval=jnp.asarray(1e-3),
                var_fgrad=jnp.asarray(2e-3))

    dense = likelihood.calc_lkd(cfg, spec, data, hp, eta)
    it = likelihood_iter.calc_lkd_iterative_noisy(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=64,
        max_cg_iters=400, row_block=32)
    assert float(it.cg_resid) < 1e-8
    np.testing.assert_allclose(np.asarray(it.beta), np.asarray(dense.beta),
                               rtol=1e-5)
    assert abs(float(it.ln_lkd) - float(dense.ln_lkd)) < 0.05 * spec.n_data

    # gradient: dense autodiff oracle (in VALUE space) vs the surrogate
    def dense_nll(theta, varK, var_fval, var_fgrad):
        hp_ = Hypers(theta=theta, varK=varK, var_fval=var_fval,
                     var_fgrad=var_fgrad)
        return -likelihood.calc_lkd(cfg, spec, data, hp_, eta).ln_lkd

    gd = jax.grad(dense_nll, argnums=(0, 1, 2, 3))(
        hp.theta, hp.varK, hp.var_fval, hp.var_fgrad)
    _, grad_hp, _ = likelihood_iter.neg_mll_iterative_noisy_and_grad(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=64,
        max_cg_iters=400, row_block=32)
    got = (grad_hp.theta, grad_hp.varK, grad_hp.var_fval, grad_hp.var_fgrad)
    for got_i, want_i, name in zip(got, gd,
                                   ("theta", "varK", "var_fval", "var_fgrad")):
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                                   rtol=0.3, atol=1e-3), name


def test_predict_iterative_vs_dense():
    """Matrix-free posterior mu/sig (CG path) equals the dense predict."""
    import jax
    from gpgradpy_tpu import GpConfig, GpData, Hypers, make_data_spec
    from gpgradpy_tpu.model import conditioning, predict, predict_iter
    from gpgradpy_tpu.model.likelihood import closed_form_hp

    rng = np.random.default_rng(0)
    n, dim = 40, 3
    xx = rng.uniform(-2, 2, (n, dim))
    f = np.sum(xx ** 2, 1)
    g = 2 * xx
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e4)
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(xx), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n, dim)))
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.7, 1.1, 0.4]))
    xq = jnp.asarray(rng.uniform(-2, 2, (9, dim)))

    hp_full = closed_form_hp(cfg, spec, data, hp, eta)
    state = predict.setup_eval(cfg, spec, data, hp_full, eta)
    mu_d, sig_d, *_ = predict.eval_model(cfg, spec, data, state, xq)

    mu_i, sig_i, beta_i, varK_i, res = predict_iter.predict_iterative(
        cfg, spec, data, hp, eta, xq, max_cg_iters=400)
    assert float(jnp.max(res.residnorm)) < 1e-8
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sig_i), np.asarray(sig_d),
                               rtol=1e-4, atol=1e-8)
