"""Shape-bucketing correctness: a padded dataset must give EXACTLY the same
likelihood, hyperparameter gradient, fit, and predictions as the unpadded
one (padding points are structurally masked)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import (GaussianProcess, GpConfig, GpData, HpInfo, Hypers,
                          make_data_spec)
from gpgradpy_tpu.model import conditioning, likelihood

KERNELS = ["SqExp", "Ma5f2", "RatQu"]


def _data(n=6, dim=2, seed=0, n_pad=0, noise=False):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    std = None if noise else np.zeros(n)
    stdg = None if noise else np.zeros((n, dim))
    spec = make_data_spec(dim, True, n, std_fval=std, std_grad=stdg,
                          n_pad_eval=n_pad)
    if n_pad:
        x = np.concatenate([x, np.tile(x[:1], (n_pad, 1))])
        f = np.concatenate([f, np.zeros(n_pad)])
        if std is not None:
            std = np.concatenate([std, np.zeros(n_pad)])
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f),
                  std_fval=None if std is None else jnp.asarray(std),
                  grad=jnp.asarray(g),
                  std_grad=None if stdg is None else jnp.asarray(stdg))
    return spec, data


@pytest.mark.parametrize("ktype", KERNELS)
@pytest.mark.parametrize("noise", [False, True])
@pytest.mark.parametrize("wellcond", ["base", "precon"])
def test_padded_mll_identical(ktype, noise, wellcond):
    cfg = GpConfig(dim=2, use_grad=True, kernel_type=ktype,
                   wellcond_mtd=wellcond)
    spec0, data0 = _data(noise=noise)
    spec1, data1 = _data(noise=noise, n_pad=3)
    info = HpInfo(dim=2, has_kernel=cfg.kernel_has_hp,
                  has_varK=spec0.b_has_noisy_data,
                  has_var_fval=spec0.b_optz_var_fval,
                  has_var_fgrad=spec0.b_optz_var_fgrad)
    eta = conditioning.calc_etaK(cfg, 6)
    vec = jnp.asarray(np.log10(np.concatenate(
        [[0.9, 1.4],
         [2.0] if cfg.kernel_has_hp else [],
         [0.8, 0.01, 0.02] if spec0.b_has_noisy_data else []])))

    v0, g0, lkd0 = likelihood.neg_mll_and_grad(cfg, spec0, info, data0, vec, eta)
    v1, g1, lkd1 = likelihood.neg_mll_and_grad(cfg, spec1, info, data1, vec, eta)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(lkd0.beta), np.asarray(lkd1.beta),
                               rtol=1e-9)
    np.testing.assert_allclose(float(lkd0.varK), float(lkd1.varK), rtol=1e-9)


def test_padded_facade_fit_and_predict():
    """Facade with pad_n_eval_multiple: fit + predictions identical to the
    unpadded facade and the compiled program is shared across sizes in the
    same bucket."""
    n = 6
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, 2))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    xq = rng.uniform(-0.5, 0.5, (4, 2))

    gp0 = GaussianProcess(2, True, "SqExp", "precon")
    gp0.init_optz_surr(2)
    gp0.set_data(x, f, np.zeros(n), g, np.zeros((n, 2)))
    gp0.set_hpara("optz", 0)
    mu0, sig0, dmu0, dsig0, d2mu0, d2sig0 = gp0.eval_model(
        xq, calc_grad=True, calc_hess=True)

    gp1 = GaussianProcess(2, True, "SqExp", "precon", pad_n_eval_multiple=8)
    gp1.init_optz_surr(2)
    gp1.set_data(x, f, np.zeros(n), g, np.zeros((n, 2)))
    assert gp1.spec.n_pad_eval == 2
    gp1.set_hpara("optz", 0)
    # optimizer trajectories agree only to line-search rounding; predictions
    # are compared at the SAME hyperparameters below
    np.testing.assert_allclose(np.asarray(gp0.hp_vals.theta),
                               np.asarray(gp1.hp_vals.theta), rtol=1e-3)
    gp1.set_hpara("set", 0, hp_vals=gp1.make_hp_class(
        theta=np.asarray(gp0.hp_vals.theta)))
    mu1, sig1, dmu1, dsig1, d2mu1, d2sig1 = gp1.eval_model(
        xq, calc_grad=True, calc_hess=True)
    # sigma terms involve the 1 - k'K^-1 k cancellation, which amplifies the
    # last-bit reduction-order differences of the padded matrix.  The mean is
    # affected too (K^-1 (y - m) reduction order): the contract is agreement
    # to ~kappa(K) * eps ~ 1e-10 * 1e6, not to f64 round-off
    np.testing.assert_allclose(mu0, mu1, rtol=1e-6)
    np.testing.assert_allclose(sig0, sig1, rtol=1e-4, atol=1e-12)
    np.testing.assert_allclose(dmu0, dmu1, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dsig0, dsig1, rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(d2mu0, d2mu1, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(d2sig0, d2sig1, rtol=1e-2, atol=1e-7)

    # growing within the bucket keeps the same DataSpec shape signature
    n2 = 7
    x2 = rng.uniform(-1, 1, (n2, 2))
    f2 = np.sum(x2 ** 2, 1)
    g2 = 2 * x2
    gp1.set_data(x2, f2, np.zeros(n2), g2, np.zeros((n2, 2)))
    assert gp1.spec.n_eval_tot == 8
    gp1.set_hpara("optz", 1)
    assert np.isfinite(gp1.history.ln_lkd[1])


@pytest.mark.parametrize("wellcond", ["rescale_origin", "dflt_vmin"])
def test_padded_rescale_frame(wellcond):
    """Shape bucketing through a rescaling frame: padding is applied AFTER
    the frame transform (api._refresh_core_data), so at the SAME
    hyperparameters the padded facade must reproduce the unpadded MLL and
    predictions (the frame itself depends only on the unpadded x_eval).
    This is the contract behind bucketing the BO rescale-method traces."""
    n = 6
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (n, 2))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    xq = rng.uniform(-0.5, 0.5, (4, 2))

    gps = []
    for pad in (1, 8):
        gp = GaussianProcess(2, True, "SqExp", wellcond,
                             pad_n_eval_multiple=pad)
        gp.init_optz_surr(2)
        gp.set_data(x, f, np.zeros(n), g, np.zeros((n, 2)))
        gps.append(gp)
    gp0, gp1 = gps
    assert gp1.spec.n_pad_eval == 2
    # identical frames: the rescale transform must ignore the padding
    np.testing.assert_allclose(np.asarray(gp0.DataScl.xvec_scale),
                               np.asarray(gp1.DataScl.xvec_scale), rtol=0)

    hp = gp0.make_hp_class(theta=np.asarray([0.9, 1.4]))
    lkd0, _ = gp0.calc_lkd_all(hp, calc_cond=True)
    lkd1, _ = gp1.calc_lkd_all(hp, calc_cond=True)
    np.testing.assert_allclose(float(lkd0.ln_lkd), float(lkd1.ln_lkd),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(lkd0.beta), np.asarray(lkd1.beta),
                               rtol=1e-9)
    # padded rows add (1+eta) eigenvalues INSIDE the spectrum: spectral cond
    # is unchanged up to round-off
    np.testing.assert_allclose(float(lkd0.cond), float(lkd1.cond), rtol=1e-6)

    for gp in gps:
        gp.set_custom_hp(theta=np.asarray([0.9, 1.4]))
        gp.set_hpara("current", 0)
    mu0, sig0, *_ = gp0.eval_model(xq)
    mu1, sig1, *_ = gp1.eval_model(xq)
    np.testing.assert_allclose(mu0, mu1, rtol=1e-6)
    np.testing.assert_allclose(sig0, sig1, rtol=1e-4, atol=1e-12)

    # the padded facade also runs the full rescale fixed-point fit loop
    gp1.set_hpara("optz", 1)
    assert np.isfinite(gp1.history.ln_lkd[1])
