"""Surrogate prediction derivatives: FD oracles plus golden parity with the
reference eval_model (the strategy of unit_test/test_grad_surr.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import GpConfig, GpData, Hypers, make_data_spec
from gpgradpy_tpu.model import conditioning, likelihood, predict

KERNELS = ["SqExp", "Ma5f2", "RatQu"]


def _fit_state(ktype, wellcond, use_grad=True, dim=2, n=5, seed=0):
    cfg = GpConfig(dim=dim, use_grad=use_grad, kernel_type=ktype,
                   wellcond_mtd=wellcond)
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1)
    g = 2 * x
    spec = make_data_spec(dim, use_grad, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)) if use_grad else None)
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n),
                  grad=jnp.asarray(g) if use_grad else None,
                  std_grad=jnp.zeros((n, dim)) if use_grad else None)
    eta = conditioning.calc_etaK(cfg, n)
    alpha = 2.0 if ktype == "RatQu" else None
    hp = Hypers(theta=jnp.asarray(rng.uniform(0.6, 1.5, dim)),
                kernel=None if alpha is None else jnp.asarray(alpha))
    hp = likelihood.closed_form_hp(cfg, spec, data, hp, eta)
    state = predict.setup_eval(cfg, spec, data, hp, eta)
    return cfg, spec, data, state, eta


@pytest.mark.parametrize("ktype", KERNELS)
@pytest.mark.parametrize("wellcond", ["base", "precon"])
@pytest.mark.parametrize("use_grad", [True, False])
def test_predict_grad_hess_fd(ktype, wellcond, use_grad):
    cfg, spec, data, state, _ = _fit_state(ktype, wellcond, use_grad)
    xq = jnp.asarray([[0.31, -0.47], [0.05, 0.6]])

    mu, sig, dmu, dsig, d2mu, d2sig = predict.eval_model(
        cfg, spec, data, state, xq, calc_grad=True, calc_hess=True)
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(sig))

    eps = 1e-5

    def f_at(pts):
        m, s = predict.eval_model(cfg, spec, data, state, pts)[:2]
        return np.asarray(m), np.asarray(s)

    for q in range(xq.shape[0]):
        for d in range(2):
            e = jnp.zeros_like(xq).at[q, d].set(eps)
            mp, sp = f_at(xq + e)
            mm, sm = f_at(xq - e)
            np.testing.assert_allclose(dmu[q, d], (mp[q] - mm[q]) / (2 * eps),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(dsig[q, d], (sp[q] - sm[q]) / (2 * eps),
                                       rtol=1e-4, atol=1e-7)
        # Hessian via FD of the gradient
        for d in range(2):
            e = jnp.zeros_like(xq).at[q, d].set(eps)
            _, _, dmup, dsigp, _, _ = predict.eval_model(
                cfg, spec, data, state, xq + e, calc_grad=True)
            _, _, dmum, dsigm, _, _ = predict.eval_model(
                cfg, spec, data, state, xq - e, calc_grad=True)
            np.testing.assert_allclose(
                d2mu[q, d, :], (dmup[q] - dmum[q]) / (2 * eps),
                rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(
                d2sig[q, d, :], (dsigp[q] - dsigm[q]) / (2 * eps),
                rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("ktype", KERNELS)
def test_eval_model_var_consistency(ktype):
    cfg, spec, data, state, _ = _fit_state(ktype, "precon")
    xq = jnp.asarray([[0.2, -0.3]])
    mu, sig, dmu, dsig, _, _ = predict.eval_model(
        cfg, spec, data, state, xq, calc_grad=True)
    sig2, dsig2, d2sig2 = predict.eval_model_var(
        cfg, spec, data, state, xq, calc_grad=True, calc_hess=True)
    np.testing.assert_allclose(sig2, np.asarray(sig) ** 2, rtol=1e-10)
    np.testing.assert_allclose(dsig2, 2 * np.asarray(sig)[:, None] * dsig,
                               rtol=1e-8, atol=1e-12)
    assert d2sig2.shape == (1, 2, 2)


@pytest.fixture(scope="module")
def ref_gp_class():
    import sys
    sys.path.insert(0, "tests")
    from ref_shim import load_reference
    GP = load_reference()
    if GP is None:
        pytest.skip("reference library unavailable")
    return GP


@pytest.mark.parametrize("ktype", KERNELS)
@pytest.mark.parametrize("wellcond", ["base", "precon"])
def test_golden_predict_vs_reference(ref_gp_class, ktype, wellcond):
    dim, n = 2, 5
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1)
    g = 2 * x
    theta = np.array([1.2, 0.7])
    alpha = 2.0 if ktype == "RatQu" else None

    # --- reference
    gp = ref_gp_class(dim, True, ktype, wellcond)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    hp_ref = gp.make_hp_class(beta=None, theta=theta, kernel=alpha, varK=None)
    lkd_ref, ok = gp.calc_lkd_all(hp_ref, calc_lkd=True, calc_grad=False)
    assert ok
    hp_ref.beta = lkd_ref.hp_beta
    hp_ref.varK = lkd_ref.hp_varK
    gp.set_hpara("set", 0, hp_vals=hp_ref)
    xq = np.array([[0.31, -0.47], [0.05, 0.6], [-0.8, 0.1]])
    mu_r, sig_r, dmu_r, dsig_r = gp.eval_model(xq, calc_grad=True)[:4]
    # reference Hessian: one point per call
    d2mu_r, d2sig_r = gp.eval_model(xq[:1], calc_grad=True, calc_hess=True)[4:]

    # --- ours
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type=ktype,
                   wellcond_mtd=wellcond)
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f), std_fval=jnp.zeros(n),
                  grad=jnp.asarray(g), std_grad=jnp.zeros((n, dim)))
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray(theta),
                kernel=None if alpha is None else jnp.asarray(alpha))
    hp = likelihood.closed_form_hp(cfg, spec, data, hp, eta)
    state = predict.setup_eval(cfg, spec, data, hp, eta)
    mu, sig, dmu, dsig, d2mu, d2sig = predict.eval_model(
        cfg, spec, data, state, jnp.asarray(xq), calc_grad=True, calc_hess=True)

    np.testing.assert_allclose(mu, mu_r, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sig, sig_r, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(dmu, dmu_r, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(dsig, dsig_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(d2mu[:1], d2mu_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(d2sig[:1], d2sig_r, rtol=1e-6, atol=1e-9)
