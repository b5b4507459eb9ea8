"""solver='dense_dist': the distributed blocked Cholesky as the facade's
mid-n direct fit branch (SURVEY 5.7; reference anchor: the factorization at
the heart of every fit, Kernel.py:128-140).

Checks, on the virtual 8-device CPU mesh:
- the custom-VJP distributed factorization matches jnp.linalg.cholesky in
  value AND pullback,
- the MLL value/gradient with the mesh-routed factorization equals the
  dense path to f64 round-off,
- a facade fit at solver='dense_dist' lands on the dense fit's
  hyperparameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import GaussianProcess, GpConfig, GpData, HpInfo, \
    make_data_spec
from gpgradpy_tpu.model import conditioning, likelihood
from gpgradpy_tpu.ops import linalg
from gpgradpy_tpu.parallel.sharded_matvec import make_data_mesh

pytestmark = pytest.mark.heavy


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    return jnp.asarray(B @ B.T / n + np.eye(n))


def test_chol_dist_value_and_vjp():
    mesh = make_data_mesh()
    n = 8 * 16 * 2          # two blocks per device
    A = _spd(n)
    L_ref = jnp.linalg.cholesky(A)
    fac = linalg.cholesky_ok_dist(A, mesh, block=16)
    assert bool(fac.ok)
    np.testing.assert_allclose(np.asarray(fac.L), np.asarray(L_ref),
                               rtol=1e-9, atol=1e-10)

    C = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)))

    def loss_dist(A):
        return jnp.sum(linalg.cholesky_ok_dist(A, mesh, block=16).L * C)

    def loss_ref(A):
        return jnp.sum(jnp.linalg.cholesky(A) * C)

    g_d = jax.grad(loss_dist)(A)
    g_r = jax.grad(loss_ref)(A)
    # the symmetric part is what flows into any symmetric upstream
    # construction (K -> M is elementwise symmetric); compare those
    sym = lambda M: 0.5 * (M + M.T)
    np.testing.assert_allclose(np.asarray(sym(g_d)), np.asarray(sym(g_r)),
                               rtol=1e-7, atol=1e-9)


def _problem(n_eval=32, dim=3, seed=0):
    from gpgradpy_tpu.bo.problems import rosenbrock
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, (n_eval, dim))
    f, g = rosenbrock(x)
    return x, f, g


def test_mll_grad_mesh_vs_dense():
    mesh = make_data_mesh()
    dim, n_eval = 3, 32       # n_data = 128 = 8 devices x block 16
    x, f, g = _problem(n_eval, dim)
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", dtype="float64",
                   dist_chol_block=16)
    spec = make_data_spec(dim, True, n_eval, std_fval=np.zeros(n_eval),
                          std_grad=np.zeros((n_eval, dim)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n_eval), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n_eval, dim)))
    info = HpInfo(dim=dim)
    eta = conditioning.calc_etaK(cfg, n_eval)
    v = jnp.asarray(np.log10(np.full(info.n_hp, 0.7)))

    val_d, g_d, lkd_d = likelihood.neg_mll_and_grad(cfg, spec, info, data,
                                                    v, eta)
    val_m, g_m, lkd_m = likelihood.neg_mll_and_grad(cfg, spec, info, data,
                                                    v, eta, mesh=mesh)
    assert bool(lkd_m.ok)
    np.testing.assert_allclose(float(val_m), float(val_d), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_d), rtol=1e-8,
                               atol=1e-12)


def test_facade_fit_dense_dist_matches_dense():
    dim, n_eval = 3, 32       # n_data = 128 = 8 devices x block 16
    x, f, g = _problem(n_eval, dim)

    def fit(solver):
        gp = GaussianProcess(dim, True, "SqExp", "precon", dtype="float64",
                             solver=solver, dist_chol_block=16,
                             cond_norm="fro")
        gp.init_optz_surr(2)
        gp.set_data(x, f, np.zeros(n_eval), g, np.zeros((n_eval, dim)))
        gp.set_hpara("optz", 0)
        return gp

    gp_d = fit("dense")
    gp_m = fit("dense_dist")
    th_d = np.asarray(gp_d.hp_vals.theta)
    th_m = np.asarray(gp_m.hp_vals.theta)
    np.testing.assert_allclose(th_m, th_d, rtol=1e-5)
    # same posterior surface
    xq = np.random.default_rng(9).uniform(-1.5, 1.5, (6, dim))
    mu_d = gp_d.eval_model(xq)[0]
    mu_m = gp_m.eval_model(xq)[0]
    np.testing.assert_allclose(mu_m, mu_d, rtol=1e-6, atol=1e-10)


def test_facade_fit_dense_dist_autopad():
    """Arbitrary n_eval: set_data auto-pads onto the mesh.size *
    dist_chol_block grid (round-5 productionization -- the caller no longer
    sizes data by hand) and the fit matches the dense path on the same
    unpadded data."""
    dim, n_eval = 3, 27      # 27 evals * 4 rows = 108: NOT on the 128 grid
    x, f, g = _problem(n_eval, dim)

    def fit(solver):
        gp = GaussianProcess(dim, True, "SqExp", "precon", dtype="float64",
                             solver=solver, dist_chol_block=16,
                             cond_norm="fro")
        gp.init_optz_surr(2)
        gp.set_data(x, f, np.zeros(n_eval), g, np.zeros((n_eval, dim)))
        gp.set_hpara("optz", 0)
        return gp

    gp_m = fit("dense_dist")
    # 8 devices x block 16 = grid of 128 rows; 27*4 = 108 real rows pad to it
    assert gp_m.spec.n_eval == n_eval
    assert gp_m.spec.n_data_tot % (8 * 16) == 0
    gp_d = fit("dense")
    th_d = np.asarray(gp_d.hp_vals.theta)
    th_m = np.asarray(gp_m.hp_vals.theta)
    np.testing.assert_allclose(th_m, th_d, rtol=1e-5)
    xq = np.random.default_rng(11).uniform(-1.5, 1.5, (5, dim))
    np.testing.assert_allclose(gp_m.eval_model(xq)[0], gp_d.eval_model(xq)[0],
                               rtol=1e-6, atol=1e-10)
