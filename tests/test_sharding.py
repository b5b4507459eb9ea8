"""Sharding equivalence: the multistart fit and batched likelihood produce
identical results whether the starts/chain axis is sharded over the 8-device
CPU mesh or run on one device (the single-device-vs-sharded check from
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.heavy  # compile-heavy; -m "not heavy" fast loop

from gpgradpy_tpu import GpConfig, GpData, HpInfo, make_data_spec
from gpgradpy_tpu.fit import multistart
from gpgradpy_tpu.model import conditioning
from gpgradpy_tpu.parallel import mesh as pmesh


def _problem():
    cfg = GpConfig(dim=2, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon")
    rng = np.random.default_rng(0)
    n = 6
    x = rng.uniform(-1, 1, (n, 2))
    f = np.sum(x ** 2, 1)
    g = 2 * x
    spec = make_data_spec(2, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, 2)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f), std_fval=jnp.zeros(n),
                  grad=jnp.asarray(g), std_grad=jnp.zeros((n, 2)))
    info = HpInfo(dim=2)
    eta = conditioning.calc_etaK(cfg, n)
    return cfg, spec, info, data, eta


def test_sharded_multistart_fit_matches_single_device():
    assert jax.device_count() >= 8
    cfg, spec, info, data, eta = _problem()
    n_starts = 16
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-3, 1, (n_starts, info.n_hp)))
    lb = jnp.full(info.n_hp, -6.0)
    ub = jnp.full(info.n_hp, 4.0)

    solver = multistart._jit_solver(cfg, spec, info, 50, 1e-12)
    res_single = solver(x0, lb, ub, data, eta)

    mesh = pmesh.make_mesh(8)
    x0_sharded = jax.device_put(x0, NamedSharding(mesh, P(pmesh.CHAIN_AXIS)))
    res_sharded = solver(x0_sharded, lb, ub, data, eta)

    # per-lane trajectories are not bitwise layout-invariant (partitioned
    # reductions round differently and the optimizer sits on knife edges);
    # what must agree is the selected best objective
    f_s = np.asarray(res_single.f)
    f_h = np.asarray(res_sharded.f)
    np.testing.assert_allclose(np.min(f_s), np.min(f_h), rtol=1e-8)
    # and the overwhelming majority of lanes should match exactly
    assert np.mean(np.isclose(f_s, f_h, rtol=1e-8)) >= 0.75


def test_sharded_batch_nll_matches_single_device():
    cfg, spec, info, data, eta = _problem()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(-3, 1, (24, info.n_hp)))
    fn = multistart._jit_batch_nll(cfg, spec, info)
    vals_single = fn(x0, data, eta)

    mesh = pmesh.make_mesh(8)
    x0_sharded = jax.device_put(x0, NamedSharding(mesh, P(pmesh.CHAIN_AXIS)))
    vals_sharded = fn(x0_sharded, data, eta)
    np.testing.assert_allclose(np.asarray(vals_single),
                               np.asarray(vals_sharded), rtol=1e-12)


def test_sharded_matvec_matches_dense():
    """Row-parallel covariance matvec over the 8-device mesh equals the
    dense Keta @ v, and a distributed CG solve through it converges."""
    from gpgradpy_tpu.ops import iterative, kernels, rtensor
    from gpgradpy_tpu.parallel import sharded_matvec as sm

    rng = np.random.default_rng(0)
    n, dim = 32, 3                       # n divisible by 8 devices
    x = jnp.asarray(rng.uniform(-2, 2, (n, dim)))
    theta = jnp.asarray(rng.uniform(0.3, 1.5, dim))
    K = kernels.kern_grad("SqExp", rtensor.calc_rtensor(x, x), theta)
    eta = 1e-6
    pvec2 = jnp.diagonal(K)
    Keta = K + eta * jnp.diag(pvec2)
    n_data = K.shape[0]

    v = jnp.asarray(rng.standard_normal(n_data))
    V_pm = sm.blocked_to_pointmajor(v, n, dim)
    p2_pm = sm.blocked_to_pointmajor(pvec2, n, dim)

    mesh = sm.make_data_mesh(8)
    x_s, V_s, p2_s = sm.shard_points(mesh, x, V_pm, p2_pm)
    out_pm = sm.kern_matvec_sharded("SqExp", mesh, x_s, theta, None, V_s,
                                    eta=eta, pvec2_pm=p2_s)
    got = sm.pointmajor_to_blocked(out_pm)
    np.testing.assert_allclose(got, Keta @ v, rtol=1e-9, atol=1e-11)

    # distributed CG: the matvec runs sharded, the CG dot products reduce
    # over the sharded axis (GSPMD inserts the collectives)
    def mv(Vcols):
        cols = []
        for j in range(Vcols.shape[1]):
            pm = sm.blocked_to_pointmajor(Vcols[:, j], n, dim)
            pm = sm.shard_points(mesh, pm)
            out = sm.kern_matvec_sharded("SqExp", mesh, x_s, theta, None, pm,
                                         eta=eta, pvec2_pm=p2_s)
            cols.append(sm.pointmajor_to_blocked(out))
        return jnp.stack(cols, axis=1)

    B = jnp.asarray(rng.standard_normal((n_data, 2)))
    res = iterative.mbcg(mv, B, max_iters=400, tol=1e-12,
                         M_inv_diag=1.0 / jnp.diagonal(Keta))
    want = jnp.linalg.solve(Keta, B)
    np.testing.assert_allclose(res.X, want, rtol=1e-6, atol=1e-8)


def test_distributed_iterative_mll_matches_dense():
    """The distributed large-n MLL (point axis sharded over the 8-device
    mesh, matvecs via shard_map all_gather) agrees with the dense MLL:
    beta/varK tightly (CG is deterministic), SLQ logdet within Monte-Carlo
    error (the probe draw is layout-permuted vs the single-device path)."""
    from gpgradpy_tpu.model import likelihood, likelihood_iter
    from gpgradpy_tpu.parallel import sharded_matvec as sm
    from gpgradpy_tpu.types import Hypers

    rng = np.random.default_rng(0)
    n, dim = 40, 3                      # n divisible by the 8-device mesh
    xx = rng.uniform(-2, 2, (n, dim))
    f = np.sum(xx ** 2, 1)
    g = 2 * xx
    # cond target 1e4: CG converges in ~100 iterations, keeping the
    # 8-virtual-device run affordable on the 2-core test box (the
    # layout/collective equivalence being tested is conditioning-independent)
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e4)
    spec = make_data_spec(dim, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, dim)))
    data = GpData(x=jnp.asarray(xx), fval=jnp.asarray(f),
                  std_fval=jnp.zeros(n), grad=jnp.asarray(g),
                  std_grad=jnp.zeros((n, dim)))
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.7, 1.1, 0.4]))

    mesh = sm.make_data_mesh()
    assert mesh.size == 8

    dense = likelihood.calc_lkd(cfg, spec, data, hp, eta)
    dist = likelihood_iter.calc_lkd_iterative(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=32,
        max_cg_iters=300, mesh=mesh)
    assert float(dist.cg_resid) < 1e-8
    np.testing.assert_allclose(float(dist.varK), float(dense.varK), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.beta), np.asarray(dense.beta),
                               rtol=1e-5)
    assert abs(float(dist.ln_lkd) - float(dense.ln_lkd)) < 0.05 * spec.n_data

    # gradient path through the sharded matvec
    from gpgradpy_tpu.types import HpInfo as _HpInfo, hypers_to_hp_vec
    info = _HpInfo(dim=dim)
    vec = hypers_to_hp_vec(info, hp)
    _, gd, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data, vec, eta)
    gd_theta = np.asarray(gd) / (np.asarray(hp.theta) * np.log(10))
    _, gtheta, _ = likelihood_iter.neg_mll_iterative_and_grad(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=32,
        max_cg_iters=300, mesh=mesh)
    np.testing.assert_allclose(np.asarray(gtheta), gd_theta, rtol=0.25)


def test_pm_layout_roundtrip():
    from gpgradpy_tpu.parallel import sharded_matvec as sm
    rng = np.random.default_rng(3)
    n, dim, m = 8, 3, 5
    M = jnp.asarray(rng.standard_normal((n * (1 + dim), m)))
    v = jnp.asarray(rng.standard_normal(n * (1 + dim)))
    np.testing.assert_array_equal(
        sm.pm_to_blocked_mat(sm.blocked_to_pm_mat(M, n, dim), n, dim), M)
    np.testing.assert_array_equal(
        sm.pm_to_blocked_mat(sm.blocked_to_pm_mat(v, n, dim), n, dim), v)


@pytest.mark.slow
def test_distributed_noisy_iterative_mll():
    """Noisy-regime distributed MLL: sharded matvec path agrees with the
    dense noisy MLL on beta and (coarsely) the value."""
    from gpgradpy_tpu.model import likelihood, likelihood_iter
    from gpgradpy_tpu.parallel import sharded_matvec as sm
    from gpgradpy_tpu.types import Hypers

    rng = np.random.default_rng(1)
    n, dim = 24, 2
    xx = rng.uniform(-2, 2, (n, dim))
    f = np.sum(xx ** 2, 1) + 0.01 * rng.standard_normal(n)
    g = 2 * xx + 0.01 * rng.standard_normal((n, dim))
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e4)
    spec = make_data_spec(dim, True, n, std_fval=None, std_grad=None)
    data = GpData(x=jnp.asarray(xx), fval=jnp.asarray(f), std_fval=None,
                  grad=jnp.asarray(g), std_grad=None)
    eta = conditioning.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.8, 1.2]), varK=jnp.asarray(2.0),
                var_fval=jnp.asarray(1e-3), var_fgrad=jnp.asarray(2e-3))

    mesh = sm.make_data_mesh()
    dense = likelihood.calc_lkd(cfg, spec, data, hp, eta)
    dist = likelihood_iter.calc_lkd_iterative_noisy(
        cfg, spec, data, hp, eta, jax.random.PRNGKey(0), n_probes=32,
        max_cg_iters=300, mesh=mesh)
    assert float(dist.cg_resid) < 1e-8
    np.testing.assert_allclose(np.asarray(dist.beta), np.asarray(dense.beta),
                               rtol=1e-5)
    assert abs(float(dist.ln_lkd) - float(dense.ln_lkd)) < 0.05 * spec.n_data


def test_distributed_predict_matches_dense():
    """Sharded-training-axis predict (cross-cov per shard + distributed CG)
    equals the dense predict."""
    from gpgradpy_tpu.model import conditioning as cond_m
    from gpgradpy_tpu.model import predict, predict_iter
    from gpgradpy_tpu.model.likelihood import closed_form_hp
    from gpgradpy_tpu.parallel import sharded_matvec as sm
    from gpgradpy_tpu.types import Hypers

    rng = np.random.default_rng(2)
    n, dim = 24, 2
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
    eta = cond_m.calc_etaK(cfg, n)
    hp = Hypers(theta=jnp.asarray([0.8, 1.2]))
    xq = jnp.asarray(rng.uniform(-2, 2, (5, dim)))

    hp_full = closed_form_hp(cfg, spec, data, hp, eta)
    state = predict.setup_eval(cfg, spec, data, hp_full, eta)
    mu_d, sig_d, *_ = predict.eval_model(cfg, spec, data, state, xq)

    mesh = sm.make_data_mesh()
    mu_s, sig_s, *_ , res = predict_iter.predict_iterative(
        cfg, spec, data, hp, eta, xq, max_cg_iters=300, mesh=mesh)
    assert float(jnp.max(res.residnorm)) < 1e-8
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_d),
                               rtol=1e-4, atol=1e-8)
