"""Mixed-precision refined prediction (cfg.n_refine_predict).

The mode assembles the covariance in f64, factorizes in f32, and runs
iterative refinement on every predict-path solve (ops/linalg.refine_solve,
model/predict._ops_solve).  Oracle: the full-f64 path on bit-identical
(f32-representable) inputs — refined f32 must recover it to ~1e-8 while the
plain f32 path is off by ~cond * eps_f32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import GaussianProcess
from gpgradpy_tpu.ops import linalg


def test_refine_solve_unit():
    rng = np.random.default_rng(0)
    n = 80
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(-6, 0, n)              # cond 1e6
    M = (Q * w) @ Q.T
    M = 0.5 * (M + M.T)
    b = rng.standard_normal(n)
    x_exact = np.linalg.solve(M, b)

    fac32 = linalg.cholesky_ok(jnp.asarray(M, jnp.float32))
    x_plain = np.asarray(linalg.cho_solve(fac32, jnp.asarray(b, jnp.float32)))
    x_ref = np.asarray(linalg.refine_solve(fac32, jnp.asarray(M),
                                           jnp.asarray(b), 3))

    err_plain = np.linalg.norm(x_plain - x_exact) / np.linalg.norm(x_exact)
    err_ref = np.linalg.norm(x_ref - x_exact) / np.linalg.norm(x_exact)
    assert err_ref < 1e-9
    assert err_ref < 1e-4 * err_plain


def _make_problem(d=2, n=24, seed=0):
    rng = np.random.default_rng(seed)
    # f32-representable inputs so f64/f32 paths see bit-identical data
    x = np.float32(rng.uniform(-2, 2, (n, d))).astype(np.float64)
    a = 10.0
    f = np.sum((1 - x[:, :-1]) ** 2 + a * (x[:, 1:] - x[:, :-1] ** 2) ** 2, 1)
    g = np.zeros_like(x)
    g[:, :-1] = -2 * (1 - x[:, :-1]) - 4 * a * x[:, :-1] * (x[:, 1:] - x[:, :-1] ** 2)
    g[:, 1:] += 2 * a * (x[:, 1:] - x[:, :-1] ** 2)
    f = np.float32(f).astype(np.float64)
    g = np.float32(g).astype(np.float64)
    return x, f, g


def _fit_eval(dtype, n_refine, xq):
    x, f, g = _make_problem()
    gp = GaussianProcess(2, True, "SqExp", wellcond_mtd="precon",
                         dtype=dtype, n_refine_predict=n_refine,
                         cond_max_target=1e6)
    gp.set_data(x, f, np.zeros_like(f), g, np.zeros_like(g))
    hp = gp.make_hp_class(beta=None, theta=np.array([30.0, 30.0]),
                          kernel=None, varK=None)
    gp.set_hpara("set", 0, hp_vals=hp)
    gp.setup_eval_model()
    mu, sig, dmu, dsig, _, _ = gp.eval_model(xq, calc_grad=True)
    return (np.asarray(mu), np.asarray(sig), np.asarray(dmu),
            np.asarray(dsig))


def test_refined_predict_recovers_f64():
    rng = np.random.default_rng(3)
    xq = np.float32(rng.uniform(-2, 2, (16, 2))).astype(np.float64)

    exact = _fit_eval("float64", 0, xq)
    plain = _fit_eval("float32", 0, xq)
    refined = _fit_eval("float32", 2, xq)

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)

    for k, name in enumerate(("mu", "sig", "dmu", "dsig")):
        e_plain = rel(plain[k], exact[k])
        e_ref = rel(refined[k], exact[k])
        assert e_ref < 1e-6, (name, e_ref)
        # refinement must beat plain f32 wherever f32 visibly struggles
        if e_plain > 1e-5:
            assert e_ref < 0.01 * e_plain, (name, e_plain, e_ref)
