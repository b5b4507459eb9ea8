"""Bayesian-optimization loop: acquisition correctness, convergence on the
1-D demo problem, and trace npz schema compatibility with the reference's
PltOptzResults loader."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu.bo import acquisition, loop, problems


def test_rosenbrock_gradient():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, 4))
    f, g = problems.rosenbrock(x)
    eps = 1e-6
    for i in range(3):
        for d in range(4):
            xp = x.copy(); xp[i, d] += eps
            xm = x.copy(); xm[i, d] -= eps
            fd = (problems.rosenbrock(xp)[0][i] - problems.rosenbrock(xm)[0][i]) / (2 * eps)
            np.testing.assert_allclose(g[i, d], fd, rtol=1e-5, atol=1e-8)
    # minimum at ones
    f1, g1 = problems.rosenbrock(np.ones((1, 4)))
    np.testing.assert_allclose(f1, 0.0, atol=1e-14)
    np.testing.assert_allclose(g1, 0.0, atol=1e-12)


def test_acquisition_gradients():
    mu = jnp.asarray([0.5, -0.2])
    sig = jnp.asarray([0.3, 0.8])
    dmu = jnp.asarray([[0.1, 0.2], [0.3, -0.1]])
    dsig = jnp.asarray([[0.05, -0.02], [0.02, 0.04]])

    a, da = acquisition.ucb(mu, sig, dmu, dsig, beta=2.0)
    np.testing.assert_allclose(a, mu - 2 * sig)
    np.testing.assert_allclose(da, dmu - 2 * dsig)

    a, da = acquisition.expected_improvement(mu, sig, 0.1, dmu, dsig)
    # FD check in mu/sig space chained through constant dmu/dsig
    eps = 1e-6
    for i in range(2):
        ap = acquisition.expected_improvement(mu.at[i].add(eps), sig, 0.1)[0]
        am = acquisition.expected_improvement(mu.at[i].add(-eps), sig, 0.1)[0]
        dadmu = (ap[i] - am[i]) / (2 * eps)
        ap = acquisition.expected_improvement(mu, sig.at[i].add(eps), 0.1)[0]
        am = acquisition.expected_improvement(mu, sig.at[i].add(-eps), 0.1)[0]
        dadsig = (ap[i] - am[i]) / (2 * eps)
        want = dadmu * dmu[i] + dadsig * dsig[i]
        np.testing.assert_allclose(da[i], want, rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_bo_sin1d_converges():
    """10 BO iterations on sin(x)+sin(10x/3) over [2.5, 7.5] must locate the
    global minimum region (x* ~ 5.146, f* ~ -1.90)."""
    trace = loop.run_bo(problems.sin_1d, [2.5], [7.5], n_iter=10, n_init=4,
                        acq="ei", seed=0)
    assert np.nanmin(trace.merit_all) < -1.85
    best_x = trace.x_all[np.nanargmin(trace.merit_all), 0]
    assert abs(best_x - 5.1457) < 0.2


def test_bo_trace_schema(tmp_path):
    """The written npz must load through the reference PltOptzResults
    semantics (merit_wo_noise_all / opt_wo_noise_all keys, (n_x0, n_iter))."""
    out = loop.run_bo_multistart(problems.sin_1d, [2.5], [7.5], n_iter=3,
                                 n_x0=2, n_init=3,
                                 save_path=str(tmp_path / "trace.npz"))
    data = np.load(tmp_path / "trace.npz")
    for key in ("x0_all", "merit_all", "opt_all", "fsb_all",
                "merit_wo_noise_all", "opt_wo_noise_all", "fsb_wo_noise_all"):
        assert key in data
    assert data["merit_all"].shape == (2, 6)
    assert data["x0_all"].shape == (2, 6, 1)
    assert np.all(np.isfinite(data["merit_all"]))


@pytest.mark.slow
def test_constrained_bo():
    """Constrained BO: minimize sum(x^2) s.t. x_0 >= 0.5 (i.e. 0.5 - x_0 <= 0)
    over [-1, 1]^2; optimum at (0.5, 0) with f = 0.25."""
    def obj(x):
        x = np.atleast_2d(x)
        return np.sum(x ** 2, 1), 2 * x

    def con(x):
        x = np.atleast_2d(x)
        c = 0.5 - x[:, 0]
        g = np.zeros_like(x)
        g[:, 0] = -1.0
        return c, g

    trace = loop.run_bo_constrained(obj, [con], [-1, -1], [1, 1], n_iter=12,
                                    n_init=8, seed=0)
    feas = trace.fsb_all > 0.5
    assert feas.any()
    best_feas = np.nanmin(trace.merit_all[feas])
    assert best_feas < 0.30, best_feas  # optimum 0.25
