"""Kernel-block correctness: every block of the gradient-enhanced covariance
equals the corresponding derivative of the scalar kernel.

This is the reference's own oracle strategy (unit_test/test_Kfull.py) driven
through one parametrized harness, with the scalar-kernel autodiff as the
derivative oracle (exact, no FD tolerance juggling) plus an FD cross-check of
the oracle itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu.ops import kernels, rtensor

KERNELS = ["SqExp", "Ma5f2", "RatQu"]
ALPHA = {"SqExp": None, "Ma5f2": None, "RatQu": 2.0}


def _setup(dim=2, n1=4, n2=3, seed=0):
    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.uniform(-1, 1, (n1, dim)))
    x2 = jnp.asarray(rng.uniform(-1, 1, (n2, dim)))
    theta = jnp.asarray(rng.uniform(0.5, 2.0, dim))
    return x1, x2, theta


def _oracle_full(ktype, x1, x2, theta, alpha):
    """Build the grad-enhanced matrix from autodiff of the scalar kernel."""
    dim = x1.shape[1]

    def k(a, b):
        return kernels.scalar_kernel(ktype, a, b, theta, alpha)

    k_x1 = jax.grad(k, argnums=0)
    k_x1x2 = jax.jacfwd(k_x1, argnums=1)

    kb = jax.vmap(jax.vmap(k, (None, 0)), (0, None))(x1, x2)
    g1 = jax.vmap(jax.vmap(k_x1, (None, 0)), (0, None))(x1, x2)   # (n1,n2,d)
    g2 = jax.vmap(jax.vmap(jax.grad(k, argnums=1), (None, 0)), (0, None))(x1, x2)
    gg = jax.vmap(jax.vmap(k_x1x2, (None, 0)), (0, None))(x1, x2)  # (n1,n2,d,d)

    n1, n2 = kb.shape
    top = jnp.concatenate([kb] + [g2[:, :, b] for b in range(dim)], axis=1)
    rows = [top]
    for a in range(dim):
        row = jnp.concatenate([g1[:, :, a]] + [gg[:, :, a, b] for b in range(dim)],
                              axis=1)
        rows.append(row)
    return jnp.concatenate(rows, axis=0)


@pytest.mark.parametrize("ktype", KERNELS)
def test_kern_grad_matches_autodiff_oracle(ktype):
    x1, x2, theta = _setup()
    R = rtensor.calc_rtensor(x1, x2)
    got = kernels.kern_grad(ktype, R, theta, ALPHA[ktype])
    want = _oracle_full(ktype, x1, x2, theta, ALPHA[ktype])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("ktype", KERNELS)
def test_kern_grad_symmetric_psd_on_same_points(ktype):
    x1, _, theta = _setup(n1=5)
    R = rtensor.calc_rtensor(x1, x1)
    K = kernels.kern_grad(ktype, R, theta, ALPHA[ktype])
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(np.asarray(K))
    assert w.min() > -1e-8, f"min eig {w.min()}"


@pytest.mark.parametrize("ktype", KERNELS)
def test_base_kernel_finite_difference(ktype):
    """FD cross-check of the scalar kernel's first x-derivative."""
    x1, x2, theta = _setup(n1=1, n2=1, seed=3)
    a, b = x1[0], x2[0]
    eps = 1e-6
    for d in range(a.shape[0]):
        e = jnp.zeros_like(a).at[d].set(eps)
        fd = (kernels.scalar_kernel(ktype, a + e, b, theta, ALPHA[ktype])
              - kernels.scalar_kernel(ktype, a - e, b, theta, ALPHA[ktype])) / (2 * eps)
        ad = jax.grad(kernels.scalar_kernel, argnums=1)(ktype, a, b, theta, ALPHA[ktype])
        np.testing.assert_allclose(fd, ad[d], rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("ktype", KERNELS)
def test_partial_gradient_selection(ktype):
    """bvec_use_grad semantics: selecting gradient rows/cols equals slicing
    the full matrix (reference KernelSqExpGradMod, KernelSqExp.py:318-410)."""
    x1, x2, theta = _setup(n1=4, n2=3)
    R = rtensor.calc_rtensor(x1, x2)
    dim, n1, n2 = R.shape
    idx1 = np.array([0, 2], dtype=np.int32)
    idx2 = np.array([1], dtype=np.int32)
    full = kernels.kern_grad(ktype, R, theta, ALPHA[ktype])
    part = kernels.kern_grad(ktype, R, theta, ALPHA[ktype], idx_g1=idx1, idx_g2=idx2)

    keep_rows = list(range(n1)) + [n1 + a * n1 + i for a in range(dim) for i in idx1]
    keep_cols = list(range(n2)) + [n2 + b * n2 + j for b in range(dim) for j in idx2]
    np.testing.assert_allclose(part, np.asarray(full)[np.ix_(keep_rows, keep_cols)],
                               atol=1e-14)


@pytest.mark.parametrize("ktype", KERNELS)
def test_theta_gradient_on_diagonal_is_finite(ktype):
    """The Matern sqrt guard: d(sum K)/d(theta) must be finite with
    coincident points (r = 0) in the matrix."""
    x1, _, theta = _setup(n1=3)
    R = rtensor.calc_rtensor(x1, x1)

    def f(th):
        return jnp.sum(kernels.kern_grad(ktype, R, th, ALPHA[ktype]) ** 2)

    g = jax.grad(f)(theta)
    assert np.all(np.isfinite(np.asarray(g)))

    # FD check of the theta-gradient (includes diagonal entries)
    eps = 1e-7
    for d in range(theta.shape[0]):
        e = jnp.zeros_like(theta).at[d].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        np.testing.assert_allclose(fd, g[d], rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("ktype", KERNELS)
def test_kern_hess_x_matches_autodiff(ktype):
    """kern_hess_x (3rd derivatives in grad cols) vs autodiff oracle."""
    dim = 2
    x1, x2, theta = _setup(dim=dim, n1=1, n2=3, seed=5)
    alpha = ALPHA[ktype]
    R = rtensor.calc_rtensor(x1, x2)
    got = kernels.kern_hess_x(ktype, R, theta, alpha, use_grad=True)
    # oracle: d/dx1_k of row-block i, for value and grad columns
    xq = x1[0]

    def row_fn(z):
        Rz = rtensor.calc_rtensor(z[None, :], x2)
        return kernels.kern_grad(ktype, Rz, theta, alpha)  # (1+d, n2*(1+d))

    J = jax.jacfwd(row_fn)(xq)  # (1+d, n2*(1+d), d)
    # got[k, i*n1 + 0, :] should equal d/dx1_k of grad-row i = J[1+i, :, k]
    n2 = x2.shape[0]
    for k in range(dim):
        for i in range(dim):
            np.testing.assert_allclose(got[k, i, :], J[1 + i, :, k],
                                       rtol=1e-9, atol=1e-10)


def test_rtensor_and_data_vec():
    x1, x2, _ = _setup(dim=3, n1=4, n2=2)
    R = rtensor.calc_rtensor(x1, x2)
    assert R.shape == (3, 4, 2)
    np.testing.assert_allclose(R[1, 2, 1], x1[2, 1] - x2[1, 1])

    fval = jnp.arange(4.0)
    grad = jnp.arange(12.0).reshape(4, 3)
    v = rtensor.make_data_vec(fval, grad)
    # Fortran-order flattening: all d/dx1 entries first
    np.testing.assert_allclose(v[4:8], grad[:, 0])
    f2, g2 = rtensor.split_data_vec(v, 4, 4, 3)
    np.testing.assert_allclose(g2, grad)
