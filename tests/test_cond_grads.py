"""Hand-derived condition-number VJPs vs plain autodiff of the naive
formulations (the reference hand-derives both gradients,
GpHparaCon.py:161-261; here the closed forms are the custom VJPs of
ops/linalg.cond_eigh / cond_fro_w_chol and this test pins them against
reverse-mode through the un-customized math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu.ops import linalg


def _spd(n, seed, spread=4.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(0.0, spread, n)
    return Q @ np.diag(w) @ Q.T


def _cond_fro_naive(theta, X):
    """cond_fro of A(theta) = exp-kernel gram + theta[1]*I, no custom VJP."""
    n = X.shape[0]
    r2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    A = jnp.exp(-theta[0] * r2) + theta[1] * jnp.eye(n)
    L = jnp.linalg.cholesky(A)
    A_inv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(n))
    return jnp.linalg.norm(A, "fro") * jnp.linalg.norm(A_inv, "fro")


def _cond_fro_custom(theta, X):
    n = X.shape[0]
    r2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    A = jnp.exp(-theta[0] * r2) + theta[1] * jnp.eye(n)
    fac = linalg.cholesky_ok(A)
    return linalg.cond_fro_w_chol(A, fac)


def _cond_2_naive(theta, X):
    n = X.shape[0]
    r2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    A = jnp.exp(-theta[0] * r2) + theta[1] * jnp.eye(n)
    w = jnp.linalg.eigvalsh(A)
    return w[-1] / jnp.maximum(w[0], jnp.finfo(A.dtype).tiny)


def _cond_2_custom(theta, X):
    n = X.shape[0]
    r2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    A = jnp.exp(-theta[0] * r2) + theta[1] * jnp.eye(n)
    return linalg.cond_eigh(A)


@pytest.mark.parametrize("n", [12, 33])
def test_cond_fro_value_and_grad_vs_autodiff(n):
    rng = np.random.default_rng(n)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    theta = jnp.asarray([0.8, 1e-3])
    v_naive, g_naive = jax.value_and_grad(_cond_fro_naive)(theta, X)
    v_cust, g_cust = jax.value_and_grad(_cond_fro_custom)(theta, X)
    np.testing.assert_allclose(v_cust, v_naive, rtol=1e-12)
    np.testing.assert_allclose(g_cust, g_naive, rtol=1e-8)


@pytest.mark.parametrize("n", [12, 33])
def test_cond_eigh_value_and_grad_vs_autodiff(n):
    rng = np.random.default_rng(100 + n)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    theta = jnp.asarray([0.8, 1e-3])
    v_naive, g_naive = jax.value_and_grad(_cond_2_naive)(theta, X)
    v_cust, g_cust = jax.value_and_grad(_cond_2_custom)(theta, X)
    np.testing.assert_allclose(v_cust, v_naive, rtol=1e-12)
    np.testing.assert_allclose(g_cust, g_naive, rtol=1e-7, atol=1e-10)


def test_cond_eigh_grad_fd():
    """FD oracle directly on the custom VJP (independent of jax eigh vjp)."""
    n = 9
    A0 = jnp.asarray(_spd(n, 3, spread=3.0))
    D = jnp.asarray(_spd(n, 4, spread=0.5))  # symmetric direction
    g = jax.grad(lambda A: linalg.cond_eigh(A))(A0)
    eps = 1e-6
    fd = (linalg.cond_eigh(A0 + eps * D) - linalg.cond_eigh(A0 - eps * D)) \
        / (2 * eps)
    np.testing.assert_allclose(jnp.sum(g * D), fd, rtol=1e-5)


def test_cond_fro_grad_fd():
    n = 9
    A0 = jnp.asarray(_spd(n, 5, spread=3.0))
    D = jnp.asarray(_spd(n, 6, spread=0.5))

    def f(A):
        return linalg.cond_fro_w_chol(A, linalg.cholesky_ok(A))

    g = jax.grad(f)(A0)
    eps = 1e-6
    fd = (f(A0 + eps * D) - f(A0 - eps * D)) / (2 * eps)
    np.testing.assert_allclose(jnp.sum(g * D), fd, rtol=1e-5)
