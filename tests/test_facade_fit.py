"""End-to-end facade tests: the reference's driver workflow
(set_data -> set_hpara('optz') -> eval_model) on the plt_surr_1d problem
(/root/reference/gpgradpy/plt/plt_surr_1d.py:57-65), plus multistart fit
quality, history round-trips, and the rescaling conditioning methods."""

import numpy as np
import pytest

from gpgradpy_tpu import GaussianProcess


def _sin_problem(n=8, lb=2.5, ub=7.5):
    """f = sin(x) + sin(10x/3) on [2.5, 7.5] (plt_surr_1d.py:57-65)."""
    x = np.linspace(lb, ub, n)[:, None]
    f = np.sin(x[:, 0]) + np.sin(10 * x[:, 0] / 3)
    g = (np.cos(x[:, 0]) + (10 / 3) * np.cos(10 * x[:, 0] / 3))[:, None]
    return x, f, g


def test_fit_and_predict_1d_gradient_enhanced():
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(5)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)

    # interpolation at the data points (noise-free GP)
    mu, sig = gp.eval_model(x)[:2]
    np.testing.assert_allclose(mu, f, atol=1e-4)
    assert np.all(sig < 1e-2)

    # reasonable prediction off-node
    xq = np.array([[4.1], [5.7]])
    mu_q, sig_q, dmu_q, dsig_q, d2mu_q, d2sig_q = gp.eval_model(
        xq, calc_grad=True, calc_hess=True)
    fq = np.sin(xq[:, 0]) + np.sin(10 * xq[:, 0] / 3)
    np.testing.assert_allclose(mu_q, fq, atol=0.05)
    gq = np.cos(xq[:, 0]) + (10 / 3) * np.cos(10 * xq[:, 0] / 3)
    np.testing.assert_allclose(dmu_q[:, 0], gq, atol=0.5)
    assert np.all(sig_q > 0)

    # history was stored
    h = gp.history
    assert np.isfinite(h.hp_theta[0, 0])
    assert np.isfinite(h.Kcov_cond[0])
    assert np.isfinite(h.ln_lkd[0])


def test_fit_gradient_free():
    x, f, _ = _sin_problem(n=12)
    gp = GaussianProcess(1, False, "SqExp", "base")
    gp.set_data(x, f, np.zeros(12))
    gp.init_optz_surr(2)
    gp.set_hpara("optz", 0)
    mu, sig = gp.eval_model(x)[:2]
    np.testing.assert_allclose(mu, f, atol=1e-3)


@pytest.mark.parametrize("ktype", ["SqExp", "Ma5f2", "RatQu"])
def test_fit_all_kernels_2d(ktype):
    rng = np.random.default_rng(0)
    n, dim = 10, 2
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    gp = GaussianProcess(dim, True, ktype, "precon")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    gp.set_hpara("optz", 0)
    xq = rng.uniform(-0.8, 0.8, (5, dim))
    mu = gp.eval_model(xq)[0]
    np.testing.assert_allclose(mu, np.sum(xq ** 2, 1), atol=0.05)


def test_fit_noisy_data():
    rng = np.random.default_rng(1)
    n, dim = 12, 2
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, 1) + 0.01 * rng.standard_normal(n)
    g = 2 * x + 0.01 * rng.standard_normal((n, dim))
    gp = GaussianProcess(dim, True, "SqExp", "precon")
    gp.set_data(x, f, None, g, None)      # unknown noise -> varK numeric
    assert gp.spec.b_has_noisy_data
    gp.init_optz_surr(2)
    gp.set_hpara("optz", 0)
    mu = gp.eval_model(x)[0]
    np.testing.assert_allclose(mu, np.sum(x ** 2, 1), atol=0.1)
    assert float(gp.hp_vals.var_fval) > 0


@pytest.mark.parametrize("wellcond", ["rescale_origin", "rescale_eta_vary",
                                      "dflt_vmin", "dflt_vmax"])
def test_fit_rescaling_methods(wellcond):
    x, f, g = _sin_problem(n=8)
    gp = GaussianProcess(1, True, "SqExp", wellcond)
    assert gp.b_use_data_scl
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)
    mu, sig = gp.eval_model(x)[:2]
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(sig))
    # the rescale fixed-point loop ends on an *estimated* theta for the final
    # scaling (reference OptzLkd.py:172-179), so interpolation is approximate;
    # dflt_vmax packs all points into unit max-distance, where the condition
    # constraint legitimately forces an over-smoothed fit -- skip that check
    if wellcond == "dflt_vmin":
        np.testing.assert_allclose(mu, f, atol=1e-3)
    elif wellcond != "dflt_vmax":
        np.testing.assert_allclose(mu, f, atol=0.1)
    # gradient maps back to the init frame correctly (dflt_vmax converges to
    # a near-degenerate fit with varK ~ 1e14 where the FD itself is noisy)
    xq = np.array([[4.3]])
    mu_q, _, dmu_q, _, _, _ = gp.eval_model(xq, calc_grad=True)
    eps = 1e-5
    mu_p = gp.eval_model(xq + eps)[0]
    mu_m = gp.eval_model(xq - eps)[0]
    # FD noise scales with the fit's varK; the cond-limited methods converge
    # to extreme hyperparameters where central differences lose digits
    rtol = 2e-2 if wellcond == "dflt_vmax" else 1e-3
    np.testing.assert_allclose(dmu_q[0, 0], (mu_p[0] - mu_m[0]) / (2 * eps),
                               rtol=rtol, atol=1e-6)


def test_history_checkpoint_roundtrip(tmp_path):
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "precon",
                         path_data_surr=str(tmp_path / "surr"))
    gp.init_optz_surr(4)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)
    gp.set_hpara("optz", 1)
    gp.export_data_surr(file2save=str(tmp_path / "surr.npz"))

    gp2 = GaussianProcess(1, True, "SqExp", "precon")
    gp2.init_optz_surr(4)
    gp2.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp2.load_data_surr(path=str(tmp_path / "surr.npz"))
    np.testing.assert_allclose(gp2.history.hp_theta[:2], gp.history.hp_theta[:2])
    gp2.set_hpara("stored", 1)
    mu1 = gp.eval_model(x)[0]
    mu2 = gp2.eval_model(x)[0]
    np.testing.assert_allclose(mu1, mu2, rtol=1e-9)


def test_option_surface_by_attribute():
    """Reference-style config by attribute assignment."""
    gp = GaussianProcess(2, True, "SqExp", "precon")
    gp.cond_max_target = 1e8
    gp.optz_n_x0 = 3
    assert gp.cfg.cond_max_target == 1e8
    assert gp.cfg.optz_n_x0 == 3


def test_info_tables():
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)
    txt = gp.get_txt_info_surr()
    assert "theta_0" in txt and "cond" in txt.lower()


def test_hp_const_n_eval_path():
    """With n_eval <= hp_const_n_eval the initial hp are used unoptimized
    (GpHparaOptz.optz_hp, GpHparaOptz.py:152-157)."""
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(1)
    x = np.array([[1.0]])
    gp.set_data(x, np.array([2.0]), np.zeros(1), np.array([[0.5]]),
                np.zeros((1, 1)))
    gp.set_hpara("optz", 0)
    np.testing.assert_allclose(np.asarray(gp.hp_vals.theta),
                               [gp.cfg.hp_theta_init])


def test_lhs_multistart_mode():
    """lkd_optz_start_mtd='lhs' with several starts (the reference's
    optz_n_x0 path) through the vmapped fitter."""
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "precon",
                         lkd_optz_start_mtd="lhs", optz_n_x0=4)
    gp.init_optz_surr(2)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)
    mu = gp.eval_model(x)[0]
    np.testing.assert_allclose(mu, f, atol=1e-3)


def test_finish_optz_surr_truncates():
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(10)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0)
    gp.finish_optz_surr(1)
    assert gp.history.hp_theta.shape[0] == 1
    assert np.isfinite(gp.history.hp_theta[0, 0])


def test_cho_fail_telemetry_and_recovery():
    """Drive the vmapped fast path through the Cholesky-failure region and
    verify (a) the failure count reaches the history telemetry (the
    reference counts these, OptzLkd.py:240-259) and (b) the optimizer
    recovers: the restoring fallback objective pushes theta up until the
    factorization succeeds, and the returned hp has a good Cholesky.

    Rig: near-duplicate points with a ZERO nugget (cond_eta_set_mtd
    'dflt_eta', eta = 0) make Keta singular at small theta (correlation
    exp(-theta r^2) -> 1), while large theta decorrelates the points and
    factors fine -- so the LHS scan visits failing lanes but a feasible
    basin exists."""
    gp = GaussianProcess(1, True, "SqExp", "precon",
                         cond_eta_set_mtd="dflt_eta", cond_eta_dflt=0.0)
    x = np.array([[0.0], [1e-6], [2e-6]])
    f = np.array([1.0, 1.0, 1.0])
    g = np.array([[0.1], [0.1], [0.1]])
    gp.init_optz_surr(1)
    gp.set_data(x, f, np.zeros(3), g, np.zeros((3, 1)))
    gp.set_hpara("optz", 0)
    assert gp.history.optz_n_cho_fail[0] > 0
    _, ok = gp.calc_lkd_all(gp.hp_vals)
    assert ok


def test_time_chofac_recorded():
    x = np.linspace(0.0, 5.0, 6)[:, None]
    f = np.sin(x[:, 0])
    g = np.cos(x)
    gp = GaussianProcess(1, True, "SqExp", "precon")
    gp.init_optz_surr(1)
    gp.set_data(x, f, np.zeros(6), g, np.zeros((6, 1)))
    gp.set_hpara("optz", 0)
    assert np.isfinite(gp.history.time_chofac[0])
    assert gp.history.time_chofac[0] >= 0


@pytest.mark.parametrize("cond_norm", [2, "fro"])
@pytest.mark.parametrize("optz_mtd", ["slsqp", "trust-constr"])
def test_cond_norm_and_optimizer_dispatch(cond_norm, optz_mtd):
    """'fro' condition norm and the trust-constr optimizer through the
    constrained scipy driver (GpHparaCon.py:135-261, OptzLkd.py:211-222):
    the fit must succeed and the final cond (in the configured norm) must
    satisfy the constraint."""
    x, f, g = _sin_problem()
    gp = GaussianProcess(1, True, "SqExp", "base", optz_mtd=optz_mtd,
                         cond_norm=cond_norm, cond_max=1e8,
                         cond_max_target=1e8)
    gp.init_optz_surr(1)
    gp.set_data(x, f, np.zeros(8), g, np.zeros((8, 1)))
    gp.set_hpara("optz", 0, calc_cond=True)
    assert np.isfinite(gp.condK)
    assert gp.condK < 1.01 * 1e8
    mu = gp.eval_model(x)[0]
    np.testing.assert_allclose(mu, f, atol=1e-3)


def test_cond_fro_matches_numpy():
    """Frobenius cond oracle: ||A||_F ||A^-1||_F == np.linalg.cond(A, 'fro')."""
    import jax.numpy as jnp
    from gpgradpy_tpu.ops import linalg as L

    rng = np.random.default_rng(3)
    B = rng.standard_normal((7, 7))
    A = B @ B.T + 7 * np.eye(7)
    fac = L.cholesky_ok(jnp.asarray(A))
    got = float(L.cond_fro_w_chol(jnp.asarray(A), fac))
    np.testing.assert_allclose(got, np.linalg.cond(A, "fro"), rtol=1e-10)
