"""Polynomial mean functions with closed-form GLS coefficients.

TPU-native rewrite of /root/reference/gpgradpy/src/eval/GpMeanFun.py.
Both the constant ('poly_ord_0') and linear ('poly_ord_1') bases are
implemented (the reference scaffolds but disables the linear basis,
GpMeanFun.py:199-204).

The generalized-least-squares coefficients under the GP prior,
    beta = (V^T K^-1 V)^-1 V^T K^-1 y        (GpMeanFun.py:102-107)
are computed with differentiable solves, so their hyperparameter gradient
(the reference's hand-coded adjoint, GpMeanFun.py:114-117) comes from
``jax.grad`` for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import linalg


def n_beta_coeff(mean_fun_type: str, dim: int) -> int:
    if mean_fun_type == "poly_ord_0":
        return 1
    if mean_fun_type == "poly_ord_1":
        return 1 + dim
    raise ValueError(f"mean_fun_type = {mean_fun_type} not available")


def calc_vand(mean_fun_type: str, x: jnp.ndarray):
    """Vandermonde matrix (n, n_beta) and its x-gradient (dim, n, n_beta)
    (GpMeanFun.py:124-170)."""
    n, dim = x.shape
    nb = n_beta_coeff(mean_fun_type, dim)
    vand = jnp.ones((n, 1), dtype=x.dtype)
    vand_grad = jnp.zeros((dim, n, nb), dtype=x.dtype)
    if nb > 1:
        vand = jnp.concatenate([vand, x], axis=1)
        eye = jnp.eye(dim, dtype=x.dtype)
        vand_grad = vand_grad.at[:, :, 1:].set(
            jnp.broadcast_to(eye[:, None, :], (dim, n, dim)))
    return vand, vand_grad


def calc_aug_vand(mean_fun_type: str, x: jnp.ndarray, use_grad: bool,
                  idx_grad=None):
    """Augmented Vandermonde: basis rows followed by basis-gradient rows
    grouped by coordinate (GpMeanFun.py:172-191), matching the data-vector
    layout."""
    vand, vand_grad = calc_vand(mean_fun_type, x)
    if not use_grad:
        return vand
    if idx_grad is not None:
        vand_grad = vand_grad[:, idx_grad, :]
    d, g, nb = vand_grad.shape
    return jnp.concatenate([vand, vand_grad.reshape(d * g, nb)], axis=0)


def eval_mean_fun(mean_fun_type: str, x: jnp.ndarray, beta: jnp.ndarray):
    """Mean value (n,), gradient (n, dim) and Hessian (n, dim, dim)
    (GpMeanFun.py:14-67)."""
    n, dim = x.shape
    vand, vand_grad = calc_vand(mean_fun_type, x)
    mval = vand @ beta
    mgrad = jnp.einsum("dnb,b->nd", vand_grad, beta)
    mhess = jnp.zeros((n, dim, dim), dtype=x.dtype)
    return mval, mgrad, mhess


def _spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cholesky-based solve of the small SPD normal-equations matrix.
    (jnp.linalg.solve lowers to LuDecomposition, which the TPU backend only
    implements for f32 -- Cholesky works for f64 too.)"""
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)


def gls_beta(vand_aug: jnp.ndarray, fac: linalg.CholFac, data_vec: jnp.ndarray):
    """beta = (V^T K^-1 V)^-1 V^T K^-1 y with Cholesky solves, plus the fitted
    mean vector V beta (GpMeanFun.py:98-108)."""
    invK_V = linalg.cho_solve(fac, vand_aug)
    A = vand_aug.T @ invK_V
    beta = _spd_solve(A, invK_V.T @ data_vec)
    return beta, vand_aug @ beta


def gls_beta_precon(vand_aug: jnp.ndarray, fac: linalg.CholFac,
                    pvec: jnp.ndarray, data_vec: jnp.ndarray):
    """GLS beta where K^-1 b = P^-1 M^-1 P^-1 b (preconditioned factor)."""
    Vp = vand_aug / pvec[:, None]
    invM_Vp = linalg.cho_solve(fac, Vp)
    A = Vp.T @ invM_Vp
    beta = _spd_solve(A, invM_Vp.T @ (data_vec / pvec))
    return beta, vand_aug @ beta
