"""Facade extras: posterior sampling API, mean-with-given-data helper, and
the FD gradient-check utility."""

import numpy as np

from gpgradpy_tpu import GaussianProcess
from gpgradpy_tpu.utils.gradcheck import test_grad_calc as fd_grad_check


def _fit_gp():
    n = 8
    x = np.linspace(2.5, 7.5, n)[:, None]
    f = np.sin(x[:, 0]) + np.sin(10 * x[:, 0] / 3)
    g = (np.cos(x[:, 0]) + (10 / 3) * np.cos(10 * x[:, 0] / 3))[:, None]
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, 1)))
    gp.set_hpara("optz", 0)
    return gp, x, f, g


def test_sample_posterior_concentrates():
    gp, x, f, g = _fit_gp()
    samples, diag = gp.sample_posterior(n_chains=4, n_warmup=150,
                                        n_samples=200, max_depth=6, seed=0)
    assert samples.shape == (4, 200, 1)
    theta_map = float(np.asarray(gp.hp_vals.theta)[0])
    med = float(np.median(samples[..., 0]))
    # posterior mass around the MAP length-scale (log10 within ~0.5)
    assert abs(np.log10(med) - np.log10(theta_map)) < 0.6
    assert float(np.mean(diag["diverging"])) < 0.05


def test_calc_model_mean_w_data():
    gp, x, f, g = _fit_gp()
    # with the ORIGINAL data this must reproduce eval_model's mean
    xq = np.array([[4.2], [6.0]])
    mu_ref, _, dmu_ref, *_ = gp.eval_model(xq, calc_grad=True)
    mu, dmu = gp.calc_model_mean_w_data_init(xq, f, g, calc_grad=True)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-8)
    np.testing.assert_allclose(dmu, dmu_ref, rtol=1e-8)
    # scaled data changes the prediction consistently (mean fn held fixed)
    mu2, _ = gp.calc_model_mean_w_data_init(xq, 2 * f, 2 * g, calc_grad=False)
    assert not np.allclose(mu2, mu)
    # no rescaling frame active: the _scl entry coincides with _init
    mu3, dmu3 = gp.calc_model_mean_w_data_scl(xq, f, g, calc_grad=True)
    np.testing.assert_allclose(mu3, mu, rtol=1e-12)
    np.testing.assert_allclose(dmu3, dmu, rtol=1e-12)


def test_calc_model_mean_w_data_scl_rescaled_frame():
    """_init == frame-transform + _scl under an active rescaling (the
    reference's split, GpEvalModel.py:384-397)."""
    rng = np.random.default_rng(3)
    n, d = 12, 2
    x = rng.uniform(-2, 2, (n, d))
    f = np.sum(x ** 2, 1) + 1.5
    g = 2 * x
    gp = GaussianProcess(d, True, "SqExp", wellcond_mtd="rescale_origin")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, d)))
    gp.set_hpara("optz", 0)

    xq = rng.uniform(-1.5, 1.5, (3, d))
    f2 = f + 0.3 * np.sin(x[:, 0])
    g2 = g.copy()
    g2[:, 0] += 0.3 * np.cos(x[:, 0])
    mu_i, dmu_i = gp.calc_model_mean_w_data_init(xq, f2, g2, calc_grad=True)
    s = gp.DataScl
    xq_s = s.x_init_2_scl(xq)
    f2_s, _, g2_s, _ = s.obj_init_2_scl(f2, None, g2, None)[:4]
    mu_s, dmu_s = gp.calc_model_mean_w_data_scl(xq_s, f2_s, g2_s,
                                                calc_grad=True)
    np.testing.assert_allclose(mu_s, mu_i, rtol=1e-10)
    np.testing.assert_allclose(dmu_s, dmu_i, rtol=1e-10)


def test_golden_mean_w_data_vs_reference_formula():
    """Golden parity for calc_model_mean_w_data_scl against the reference's
    INTENDED formula (GpEvalModel.py:397-440).  As shipped the reference
    method raises (it passes raw point arrays where the bound kernel
    expects an Rtensor, GpEvalModel.py:401); the test restores the missing
    calc_Rtensor step and otherwise evaluates the reference's own pieces in
    place."""
    import sys
    sys.path.insert(0, "tests")
    from ref_shim import load_reference
    from scipy import linalg as slinalg

    GP = load_reference()
    if GP is None:
        import pytest
        pytest.skip("reference library unavailable")

    dim, n = 2, 6
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    theta = np.array([1.1, 0.8])

    rgp = GP(dim, True, "SqExp", "base")
    rgp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    hp = rgp.make_hp_class(beta=None, theta=theta, kernel=None, varK=None)
    lkd, ok = rgp.calc_lkd_all(hp, calc_lkd=True, calc_grad=False)
    assert ok
    hp.beta = lkd.hp_beta
    hp.varK = lkd.hp_varK
    rgp.set_hpara("set", 0, hp_vals=hp)
    rgp.setup_eval_model()

    xq = np.array([[0.3, -0.4], [0.1, 0.55]])
    f2 = f + 0.2 * x[:, 1]
    g2 = g.copy()
    g2[:, 1] += 0.2
    # reference formula with the missing Rtensor step restored
    Kgrad_xy = rgp.calc_KernGrad(rgp.calc_Rtensor(xq, x), theta, None)
    nx = xq.shape[0]
    mean_fval, mean_fgrad = rgp.eval_mean_fun(
        x, hp.beta, bvec_use_grad=rgp.bvec_use_grad, calc_grad=True)[:2]
    mean_vec = rgp.make_data_vec(mean_fval, mean_fgrad)
    mu0, dmu0 = rgp.eval_mean_fun(xq, hp.beta, calc_grad=True)[:2]
    data_vec = np.hstack((f2, np.reshape(g2, g2.size, order="F")))
    sol = slinalg.cho_solve(rgp.KernEta_chofac, data_vec - mean_vec)
    mu_ref = mu0 + Kgrad_xy[:nx] @ sol
    dmu_ref = np.reshape(Kgrad_xy[nx:] @ sol, [nx, dim], order="F") + dmu0

    # --- ours, same fixed hyperparameters
    gp = GaussianProcess(dim, True, "SqExp", "base")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    from gpgradpy_tpu.types import Hypers
    import jax.numpy as jnp
    gp.set_hpara("set", 0, hp_vals=Hypers(theta=jnp.asarray(theta)))
    mu, dmu = gp.calc_model_mean_w_data_scl(xq, f2, g2, calc_grad=True)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dmu, dmu_ref, rtol=1e-8, atol=1e-11)


def test_grad_check_utility(capsys):
    fd, gr = fd_grad_check(np.array([1.0, 2.0]),
                           lambda v: np.sum(v ** 2),
                           lambda v: 2 * v, print_calc=True)
    np.testing.assert_allclose(fd, gr, rtol=1e-6)
    assert "FD test" in capsys.readouterr().out


def test_make_predict_fn_serving_path():
    gp, x, f, g = _fit_gp()
    predict = gp.make_predict_fn(calc_grad=True)
    xq = np.array([[4.2], [6.0]])
    mu, sig, dmu, dsig, _, _ = predict(xq)
    mu_ref, sig_ref, dmu_ref, *_ = gp.eval_model(xq, calc_grad=True)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dmu), dmu_ref, rtol=1e-12)


def test_eval_model_var_rescaled_frames():
    """eval_model_var under data rescaling (the reference raises here,
    GpEvalModel.py:256): var must equal sig^2 from eval_model in the init
    frame, and its gradient/Hessian must match central FD of the var."""
    import numpy as np
    from gpgradpy_tpu import GaussianProcess

    rng = np.random.default_rng(5)
    n, d = 14, 2
    x = rng.uniform(-2, 2, (n, d))
    f = np.sum(x ** 2, 1) + 3.0
    g = 2 * x
    gp = GaussianProcess(d, True, "SqExp", wellcond_mtd="rescale_origin")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, d)))
    gp.set_hpara("optz", 0)

    xq = rng.uniform(-1.5, 1.5, (5, d))
    _, sig, _, _, _, _ = gp.eval_model(xq)
    var, dvar, d2var = gp.eval_model_var(xq, calc_grad=True, calc_hess=True)
    np.testing.assert_allclose(var, sig ** 2, rtol=1e-8, atol=1e-12)

    eps = 1e-5
    for k in range(d):
        xp = xq.copy(); xp[:, k] += eps
        xm = xq.copy(); xm[:, k] -= eps
        fd = (gp.eval_model_var(xp)[0] - gp.eval_model_var(xm)[0]) / (2 * eps)
        np.testing.assert_allclose(dvar[:, k], fd, rtol=1e-3, atol=1e-8)
        fdg = (gp.eval_model_var(xp, calc_grad=True)[1]
               - gp.eval_model_var(xm, calc_grad=True)[1]) / (2 * eps)
        np.testing.assert_allclose(d2var[:, :, k], fdg, rtol=1e-3, atol=1e-6)


def test_plt_debug_lkd_contour(tmp_path):
    """MLL 2-D contour debug hook: grid values finite where the fit lives,
    png written (GpHparaOptz.plt_debug_lkd parity)."""
    n = 10
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, (n, 2))
    f = np.sum(x ** 2, axis=1)
    g = 2.0 * x
    gp = GaussianProcess(2, True, "SqExp", "precon")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, 2)))
    gp.set_hpara("optz", 0)
    # d=2 problem: scan the two theta components (the reference's case)
    out = tmp_path / "lkd.png"
    lkd = gp.plt_debug_lkd(i_optz=0, dims=(0, 1), n_grid=6, path=str(out))
    assert lkd.shape == (6, 6)
    assert np.isfinite(lkd).any()
    assert out.exists() and out.stat().st_size > 0
