"""Sharding equivalence: the multistart fit and batched likelihood produce
identical results whether the starts/chain axis is sharded over the 8-device
CPU mesh or run on one device (the single-device-vs-sharded check from
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

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
