"""MLL value/gradient correctness.

- Finite-difference oracle on the hyperparameter gradient of the MLL across
  kernels x conditioning methods x noise regimes (the reference's
  unit_test/test_grad_lkd.py strategy, driven through one harness).
- Golden-value parity against the reference library itself (executed in place
  through tests/ref_shim.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import (GpConfig, GpData, HpInfo, Hypers, make_data_spec,
                          hp_vec_to_hypers, hypers_to_hp_vec)
from gpgradpy_tpu.model import conditioning, likelihood

KERNELS = ["SqExp", "Ma5f2", "RatQu"]
WELLCOND = ["base", "precon"]


def _make_problem(dim=2, n=5, noise=None, seed=0, partial_grad=False):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1) + 0.1 * rng.standard_normal(n)
    g = 2 * x + 0.1 * rng.standard_normal((n, dim))

    if noise == "known":
        std_f = np.full(n, 0.05)
        std_g = np.full((n, dim), 0.05)
    elif noise == "unknown":
        std_f = None
        std_g = None
    else:  # noise-free
        std_f = np.zeros(n)
        std_g = np.zeros((n, dim))

    bvec = None
    if partial_grad:
        bvec = np.ones(n, bool)
        bvec[-1] = False
        g = g[bvec]
        if std_g is not None:
            std_g = std_g[bvec]

    spec = make_data_spec(dim, True, n, std_fval=std_f, std_grad=std_g,
                          bvec_use_grad=bvec)
    data = GpData(
        x=jnp.asarray(x), fval=jnp.asarray(f),
        std_fval=None if std_f is None else jnp.asarray(std_f),
        grad=jnp.asarray(g),
        std_grad=None if std_g is None else jnp.asarray(std_g))
    return spec, data


def _hp_info(cfg, spec):
    return HpInfo(dim=cfg.dim,
                  has_kernel=cfg.kernel_has_hp,
                  has_varK=spec.b_has_noisy_data,
                  has_var_fval=spec.b_optz_var_fval,
                  has_var_fgrad=spec.b_optz_var_fgrad)


def _hp_vec0(cfg, info, seed=1):
    rng = np.random.default_rng(seed)
    vec = []
    if info.has_theta:
        vec += list(np.log10(rng.uniform(0.5, 2.0, cfg.dim)))
    if info.has_kernel:
        vec += [np.log10(2.0)]
    if info.has_varK:
        vec += [np.log10(0.8)]
    if info.has_var_fval:
        vec += [np.log10(0.01)]
    if info.has_var_fgrad:
        vec += [np.log10(0.02)]
    return jnp.asarray(vec)


@pytest.mark.parametrize("ktype", KERNELS)
@pytest.mark.parametrize("wellcond", WELLCOND)
@pytest.mark.parametrize("noise", [None, "known", "unknown"])
def test_mll_grad_fd(ktype, wellcond, noise):
    cfg = GpConfig(dim=2, use_grad=True, kernel_type=ktype,
                   wellcond_mtd=wellcond)
    spec, data = _make_problem(noise=noise)
    info = _hp_info(cfg, spec)
    eta = conditioning.calc_etaK(cfg, spec.n_eval)
    vec0 = _hp_vec0(cfg, info)

    val, grad, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data, vec0, eta)
    assert np.isfinite(val)

    eps = 1e-6
    for i in range(info.n_hp):
        e = jnp.zeros_like(vec0).at[i].set(eps)
        vp, _ = likelihood.neg_mll(cfg, spec, info, data, vec0 + e, eta)
        vm, _ = likelihood.neg_mll(cfg, spec, info, data, vec0 - e, eta)
        fd = (vp - vm) / (2 * eps)
        np.testing.assert_allclose(grad[i], fd, rtol=2e-5, atol=1e-7,
                                   err_msg=f"hp index {i}")


@pytest.mark.parametrize("ktype", KERNELS)
def test_mll_grad_fd_partial_gradients(ktype):
    """Partial-gradient mask (bvec_use_grad[-1]=False), noise-free, precon."""
    cfg = GpConfig(dim=2, use_grad=True, kernel_type=ktype,
                   wellcond_mtd="precon")
    spec, data = _make_problem(partial_grad=True)
    assert spec.n_grad == spec.n_eval - 1
    info = _hp_info(cfg, spec)
    eta = conditioning.calc_etaK(cfg, spec.n_eval)
    vec0 = _hp_vec0(cfg, info)

    val, grad, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data, vec0, eta)
    eps = 1e-6
    for i in range(info.n_hp):
        e = jnp.zeros_like(vec0).at[i].set(eps)
        vp, _ = likelihood.neg_mll(cfg, spec, info, data, vec0 + e, eta)
        vm, _ = likelihood.neg_mll(cfg, spec, info, data, vec0 - e, eta)
        np.testing.assert_allclose(grad[i], (vp - vm) / (2 * eps),
                                   rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Golden parity against the reference library
# ---------------------------------------------------------------------------

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
def test_golden_mll_noise_free(ref_gp_class, ktype, wellcond):
    dim, n = 2, 5
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1)
    g = 2 * x
    theta = np.array([1.2, 0.7])
    alpha = 2.0 if ktype == "RatQu" else None

    gp = ref_gp_class(dim, True, ktype, wellcond)
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    hp_ref = gp.make_hp_class(beta=None, theta=theta,
                              kernel=alpha, varK=None)
    lkd_ref, ok = gp.calc_lkd_all(hp_ref, calc_lkd=True, calc_cond=True,
                                  calc_grad=False)
    assert ok

    cfg = GpConfig(dim=dim, use_grad=True, kernel_type=ktype,
                   wellcond_mtd=wellcond)
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n, dim)))
    eta = conditioning.calc_etaK(cfg, n)
    np.testing.assert_allclose(eta, gp._etaK, rtol=1e-12)

    hp = Hypers(theta=jnp.asarray(theta),
                kernel=None if alpha is None else jnp.asarray(alpha))
    lkd = likelihood.calc_lkd(cfg, spec, data, hp, eta, calc_cond=True)

    np.testing.assert_allclose(lkd.ln_lkd, lkd_ref.ln_lkd, rtol=1e-10)
    np.testing.assert_allclose(lkd.varK, lkd_ref.hp_varK, rtol=1e-9)
    np.testing.assert_allclose(lkd.beta, lkd_ref.hp_beta, rtol=1e-9)
    np.testing.assert_allclose(lkd.cond, lkd_ref.cond, rtol=1e-5)


@pytest.mark.parametrize("ktype", ["SqExp", "Ma5f2"])
def test_golden_mll_noisy(ref_gp_class, ktype):
    """Unknown-noise regime: varK/var_fval/var_fgrad numeric hps."""
    dim, n = 2, 6
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1) + 0.05 * rng.standard_normal(n)
    g = 2 * x + 0.05 * rng.standard_normal((n, dim))
    theta = np.array([0.9, 1.4])

    gp = ref_gp_class(dim, True, ktype, "precon")
    gp.set_data(x, f, None, g, None)
    hp_ref = gp.make_hp_class(beta=None, theta=theta, kernel=None, varK=0.8,
                              var_fval=0.01, var_fgrad=0.02)
    lkd_ref, ok = gp.calc_lkd_all(hp_ref, calc_lkd=True, calc_grad=False)
    assert ok

    cfg = GpConfig(dim=dim, use_grad=True, kernel_type=ktype,
                   wellcond_mtd="precon")
    spec = make_data_spec(dim, True, n)
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f), std_fval=None,
                  grad=jnp.asarray(g), std_grad=None)
    assert spec.b_has_noisy_data
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray(theta), varK=jnp.asarray(0.8),
                var_fval=jnp.asarray(0.01), var_fgrad=jnp.asarray(0.02))
    lkd = likelihood.calc_lkd(cfg, spec, data, hp, eta)

    np.testing.assert_allclose(lkd.ln_lkd, lkd_ref.ln_lkd, rtol=1e-10)
    np.testing.assert_allclose(lkd.beta, lkd_ref.hp_beta, rtol=1e-9)


@pytest.mark.parametrize("ktype", KERNELS)
def test_golden_mll_grad_vs_reference_adjoint(ref_gp_class, ktype):
    """Our jax.grad MLL gradient vs the reference's hand-coded adjoint."""
    dim, n = 2, 5
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (n, dim))
    f = np.sum(x ** 2, axis=1)
    g = 2 * x
    theta = np.array([1.1, 0.6])
    alpha = 2.0 if ktype == "RatQu" else None

    gp = ref_gp_class(dim, True, ktype, "precon")
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, dim)))
    log_vec = np.log10(np.concatenate([theta, [] if alpha is None else [alpha]]))
    val_ref, grad_ref = gp.calc_store_likelihood(log_vec, calc_grad=True)[:2]

    cfg = GpConfig(dim=dim, use_grad=True, kernel_type=ktype,
                   wellcond_mtd="precon")
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n, dim)))
    info = HpInfo(dim=dim, has_kernel=alpha is not None)
    eta = conditioning.calc_etaK(cfg, n)
    val, grad, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data,
                                               jnp.asarray(log_vec), eta)
    np.testing.assert_allclose(-val, val_ref, rtol=1e-10)
    np.testing.assert_allclose(-grad, grad_ref, rtol=1e-7, atol=1e-10)


def test_hp_vec_roundtrip():
    info = HpInfo(dim=3, has_kernel=True, has_varK=True, has_var_fval=True)
    vec = jnp.asarray(np.log10([0.5, 1.0, 2.0, 3.0, 0.7, 0.01]))
    hp = hp_vec_to_hypers(info, vec)
    np.testing.assert_allclose(hp.theta, [0.5, 1.0, 2.0])
    np.testing.assert_allclose(hp.kernel, 3.0)
    np.testing.assert_allclose(hp.varK, 0.7)
    np.testing.assert_allclose(hp.var_fval, 0.01)
    assert hp.var_fgrad is None
    back = hypers_to_hp_vec(info, hp)
    np.testing.assert_allclose(back, vec)
