"""Pairwise-difference tensors and data-vector packing.

TPU-native equivalents of the reference numeric utilities
(/root/reference/gpgradpy/src/base/CommonFun.py:16-173): vectorized XLA ops
instead of numba loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def calc_rtensor(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """R[d, i, j] = x1[i, d] - x2[j, d].

    Mirrors CommonFun.calc_Rtensor (CommonFun.py:58) as a single broadcasted
    subtract (XLA fuses this into downstream consumers).
    """
    return jnp.transpose(x1[:, None, :] - x2[None, :, :], (2, 0, 1))


def calc_dist_min(x: jnp.ndarray) -> jnp.ndarray:
    """Minimum pairwise Euclidean distance (CommonFun.py:16)."""
    n = x.shape[0]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.diag(jnp.full(n, jnp.inf, dtype=x.dtype))
    return jnp.sqrt(jnp.min(d2))


def calc_dist_max(x: jnp.ndarray) -> jnp.ndarray:
    """Maximum pairwise Euclidean distance (CommonFun.py:37)."""
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.max(d2))


def make_data_vec(fval: jnp.ndarray, fgrad=None) -> jnp.ndarray:
    """Stack [f; vec(grad f)] with grad flattened in Fortran order
    (column-major, i.e. grouped by coordinate dimension), matching
    CommonFun.make_data_vec (CommonFun.py:152) and the block layout of the
    gradient-enhanced covariance matrix."""
    fval = jnp.atleast_1d(fval)
    if fgrad is None:
        return fval
    return jnp.concatenate([fval, fgrad.T.reshape(-1)])


def split_data_vec(vec: jnp.ndarray, n_eval: int, n_grad: int, dim: int):
    """Inverse of make_data_vec."""
    fval = vec[:n_eval]
    if n_grad == 0:
        return fval, None
    fgrad = vec[n_eval:].reshape(dim, n_grad).T
    return fval, fgrad
