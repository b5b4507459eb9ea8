"""Inference engines: NUTS statistical correctness, GP hyperparameter
posterior sanity, VI and SMC against known targets, and sharded-vs-single
device equivalence of the chain layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu import GpConfig, GpData, HpInfo, make_data_spec
from gpgradpy_tpu.fit import multistart
from gpgradpy_tpu.inference import nuts, smc, vi
from gpgradpy_tpu.model import conditioning
from gpgradpy_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.heavy  # compile-heavy; -m "not heavy" fast loop


def _gauss_target(dim=2):
    cov = jnp.asarray([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.linalg.inv(cov)

    def logp(z):
        return -0.5 * z @ prec @ z

    return logp, np.asarray(cov)


def test_nuts_recovers_gaussian():
    logp, cov = _gauss_target()
    n_chains = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2))
    run = jax.jit(jax.vmap(lambda z, k: nuts.run_nuts(
        logp, z, k, n_warmup=300, n_samples=500, max_depth=6)))
    zs, diag = run(z0, keys)
    s = np.asarray(zs).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)
    assert float(np.mean(diag["diverging"])) < 0.01
    assert 0.6 < float(np.mean(diag["accept_prob"])) <= 1.0


def test_nuts_f32_state_f64_logp():
    """f32 chain state with a log-density that returns f64 (the TPU bench
    configuration inside an x64 process): the tree-builder must pin its
    scalar bookkeeping to the state dtype or the while_loop carry breaks
    (bench.py --nuts regression)."""
    def logp(z):
        return -0.5 * jnp.sum(z.astype(jnp.float64) ** 2)

    z0 = jnp.zeros(3, jnp.float32)
    zs, diag = nuts.run_nuts(logp, z0, jax.random.PRNGKey(0), n_warmup=32,
                             n_samples=32, max_depth=4)
    assert np.all(np.isfinite(np.asarray(zs)))
    assert float(np.mean(diag["diverging"])) < 0.5


def test_nuts_gp_hyperparameter_posterior():
    """Posterior over log10(theta) on a 1-D GP: chains must concentrate
    around the MAP estimate."""
    cfg = GpConfig(dim=1, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon")
    rng = np.random.default_rng(0)
    n = 8
    x = np.linspace(2.5, 7.5, n)[:, None]
    f = np.sin(x[:, 0]) + np.sin(10 * x[:, 0] / 3)
    g = (np.cos(x[:, 0]) + (10 / 3) * np.cos(10 * x[:, 0] / 3))[:, None]
    spec = make_data_spec(1, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, 1)))
    data = GpData(x=jnp.asarray(x), fval=jnp.asarray(f), std_fval=jnp.zeros(n),
                  grad=jnp.asarray(g), std_grad=jnp.zeros((n, 1)))
    info = HpInfo(dim=1)
    eta = conditioning.calc_etaK(cfg, n)

    # MAP for comparison
    fit = multistart.fit_map(cfg, spec, info, data, eta)
    map_log_theta = float(fit.hp_vec[0])

    lb, ub = np.array([-4.0]), np.array([2.0])
    logpost, z_to_hp, hp_to_z = nuts.make_gp_logpost(cfg, spec, info, data,
                                                     eta, lb, ub)
    n_chains = 4
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    z0 = jnp.zeros((n_chains, 1))
    run = jax.jit(jax.vmap(lambda z, k: nuts.run_nuts(
        logpost, z, k, n_warmup=200, n_samples=300, max_depth=8)))
    zs, diag = run(z0, keys)
    hp_samples = np.asarray(jax.vmap(jax.vmap(z_to_hp))(zs)).reshape(-1)
    # posterior mode near the MAP
    assert abs(np.median(hp_samples) - map_log_theta) < 0.5
    assert float(np.mean(diag["diverging"])) < 0.05


def test_advi_gaussian():
    logp, cov = _gauss_target()
    res = vi.run_advi(logp, jnp.zeros(2), jax.random.PRNGKey(0),
                      n_steps=1500, learning_rate=3e-2)
    np.testing.assert_allclose(np.asarray(res.mu), [0, 0], atol=0.1)
    # mean-field optimum for a Gaussian: variances -> 1 / diag(precision)
    prec = np.linalg.inv(cov)
    np.testing.assert_allclose(np.exp(2 * np.asarray(res.log_sigma)),
                               1.0 / np.diag(prec), rtol=0.25)
    assert res.elbo_trace[-1] > res.elbo_trace[0]


def test_smc_gaussian():
    logp, cov = _gauss_target()

    def prior_sample(key, n):
        return 3.0 * jax.random.normal(key, (n, 2))

    res = smc.run_smc(logp, prior_sample, jax.random.PRNGKey(0),
                      n_particles=1024, n_stages=16, n_mcmc=8, rw_scale=0.6)
    w = np.asarray(jax.nn.softmax(res.log_weights))
    s = np.asarray(res.particles)
    mean = (w[:, None] * s).sum(0)
    np.testing.assert_allclose(mean, [0, 0], atol=0.25)
    c = np.cov(s.T, aweights=w)
    np.testing.assert_allclose(c, cov, atol=0.5)


def test_nuts_sharded_over_mesh():
    """8 virtual CPU devices: sharded chains run and pooled adaptation
    matches the single-device pooled result statistically."""
    assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
    logp, cov = _gauss_target()
    m = pmesh.make_mesh(8)
    n_chains = 16
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2))
    zs, diag = pmesh.run_nuts_sharded(logp, z0, keys, m, n_warmup=200,
                                      n_samples=300, max_depth=6)
    s = np.asarray(zs).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.2)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.4)
    # pooled step size: identical across all chains
    steps = np.asarray(diag["step_size"]).reshape(-1)
    np.testing.assert_allclose(steps, steps[0], rtol=1e-6)


def test_diagnostics_rhat_ess():
    """R-hat ~ 1 and healthy ESS for iid chains; R-hat >> 1 for disjoint
    chains."""
    from gpgradpy_tpu.inference import diagnostics
    rng = np.random.default_rng(0)
    good = jnp.asarray(rng.standard_normal((4, 500, 2)))
    rhat = diagnostics.split_rhat(good)
    assert np.all(np.asarray(rhat) < 1.05)
    ess = diagnostics.effective_sample_size(good)
    assert np.all(np.asarray(ess) > 500)

    bad = jnp.asarray(rng.standard_normal((4, 500, 1))
                      + np.arange(4)[:, None, None] * 10.0)
    rhat_bad = diagnostics.split_rhat(bad)
    assert np.all(np.asarray(rhat_bad) > 2.0)


def test_nuts_checkpointed_resume(tmp_path):
    """Segmented NUTS with checkpoint: a resumed run continues from the
    stored chain states (no warmup) and produces valid samples."""
    logp, cov = _gauss_target()
    n_chains = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2))
    ckpt = str(tmp_path / "chains.npz")

    zs1, state1 = nuts.run_nuts_checkpointed(
        logp, z0, keys, ckpt, n_warmup=100, n_samples=60, segment=30,
        max_depth=6)
    assert zs1.shape == (n_chains, 60, 2)

    # resume: skips warmup, continues from the stored state
    zs2, state2 = nuts.run_nuts_checkpointed(
        logp, z0, keys, ckpt, n_warmup=100, n_samples=30, segment=30,
        max_depth=6, resume=True)
    assert zs2.shape == (n_chains, 30, 2)
    s = np.concatenate([zs1, zs2], axis=1).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.4)
