"""Radial kernels and gradient-enhanced covariance blocks, TPU-first.

Design
------
All three kernel families of the reference (squared exponential, Matern-5/2,
rational quadratic) are *radial*: ``k(x1, x2) = phi(W)`` with the weighted
squared distance ``W = sum_i theta_i * (x1_i - x2_i)**2``.  Every block of the
gradient-enhanced covariance matrix then has a single generic formula in terms
of the scalar derivatives ``phi' = d phi / dW`` etc.:

    K[val,  val ]          = phi
    K[d/dx1_a, val]        =  2 theta_a R_a phi'
    K[val,  d/dx2_b]       = -2 theta_b R_b phi'
    K[d/dx1_a, d/dx2_b]    = -2 theta_a delta_ab phi' - 4 theta_a theta_b R_a R_b phi''

with ``R_a = x1_a - x2_a``.  The third x-derivative (needed for surrogate
Hessians) is likewise generic:

    d/dx1_k [K[d/dx1_i, val]]      = 4 th_i th_k R_i R_k phi'' + 2 th_i d_ik phi'
    d/dx1_k [K[d/dx1_i, d/dx2_j]]  = -8 th_i th_j th_k phi''' R_i R_j R_k
                                     - 4 th_i th_k phi'' (d_ij R_k + d_kj R_i)
                                     - 4 th_i th_j phi'' d_ik R_j

This replaces the ~2100 lines of hand-unrolled numba loops in the reference
(/root/reference/gpgradpy/src/kernel/KernelSqExp.py, KernelMatern5f2.py,
KernelRatQuad.py) with one vectorized assembly that XLA fuses and tiles onto
the MXU/VPU.  Correctness of each block is verified against finite differences
of the base kernel in tests/test_kernels.py (the reference's own test oracle,
unit_test/test_Kfull.py).

Derivatives with respect to the hyperparameters (theta, alpha) are obtained by
``jax.grad`` through these formulas -- the Matern sqrt at W=0 is guarded with
the standard double-``where`` trick so autodiff is exact on the diagonal.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

_SQRT5 = 5.0 ** 0.5


# ---------------------------------------------------------------------------
# phi(W) and its derivatives per kernel family
# ---------------------------------------------------------------------------

def _phi_sq_exp(W, alpha):
    """phi = exp(-W).  Reference: KernelSqExp.py:18-46."""
    phi = jnp.exp(-W)
    return phi, -phi, phi, -phi


def _phi_matern52(W, alpha):
    """phi = (1 + sqrt(5) nu + 5/3 nu^2) exp(-sqrt(5) nu), nu = sqrt(W).

    Reference: KernelMatern5f2.py:18-52.  phi''' ~ 1/nu as W -> 0; it is only
    ever multiplied by odd products of R which vanish there, so it is guarded
    to 0 on the diagonal (the true limit of every term that uses it).
    """
    pos = W > 0.0
    w_safe = jnp.where(pos, W, 1.0)
    nu = jnp.where(pos, jnp.sqrt(w_safe), 0.0)
    e = jnp.exp(-_SQRT5 * nu)
    phi = (1.0 + _SQRT5 * nu + (5.0 / 3.0) * W) * e
    phi1 = -(5.0 / 6.0) * (1.0 + _SQRT5 * nu) * e
    phi2 = (25.0 / 12.0) * e
    inv_nu = jnp.where(pos, 1.0 / jnp.where(pos, nu, 1.0), 0.0)
    phi3 = -(25.0 * _SQRT5 / 24.0) * e * inv_nu
    return phi, phi1, phi2, phi3


def _phi_rat_quad(W, alpha):
    """phi = (1 + W/alpha)^(-alpha).  Reference: KernelRatQuad.py:18-50."""
    B = 1.0 + W / alpha
    phi = B ** (-alpha)
    phi1 = -(B ** (-alpha - 1.0))
    phi2 = (1.0 + 1.0 / alpha) * B ** (-alpha - 2.0)
    phi3 = -(1.0 + 1.0 / alpha) * (1.0 + 2.0 / alpha) * B ** (-alpha - 3.0)
    return phi, phi1, phi2, phi3


_PHI = {"SqExp": _phi_sq_exp, "Ma5f2": _phi_matern52, "RatQu": _phi_rat_quad}


# ---------------------------------------------------------------------------
# gamma <-> theta (preconditioner scale = sqrt of grad-grad diagonal)
# ---------------------------------------------------------------------------

def theta2gamma(kernel_type: str, theta):
    """sqrt of the grad-grad block diagonal of the correlation matrix.

    Reference: KernelSqExp.py:581, KernelMatern5f2.py:655, KernelRatQuad.py:853.
    Equals sqrt(-2 phi'(0) * theta) for each family.
    """
    if kernel_type == "Ma5f2":
        return jnp.sqrt((5.0 / 3.0) * theta)
    return jnp.sqrt(2.0 * theta)


def gamma2theta(kernel_type: str, gamma):
    if kernel_type == "Ma5f2":
        return (3.0 / 5.0) * gamma ** 2
    return 0.5 * gamma ** 2


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _weighted_sqdist(R, theta):
    return jnp.einsum("d,dij->ij", theta, R * R)


def kern_base(kernel_type: str, R, theta, alpha=None):
    """Gradient-free kernel matrix, shape (n1, n2)."""
    phi, *_ = _PHI[kernel_type](_weighted_sqdist(R, theta), alpha)
    return phi


def kern_block_tensor(kernel_type: str, R, theta, alpha=None):
    """Full block tensor G of shape (1+d, 1+d, n1, n2).

    G[0, 0] is the base kernel; G[a, 0] the derivative w.r.t. x1_{a-1};
    G[0, b] w.r.t. x2_{b-1}; G[a, b] the mixed second derivative.
    """
    dim, n1, n2 = R.shape
    W = _weighted_sqdist(R, theta)
    phi, phi1, phi2, _ = _PHI[kernel_type](W, alpha)

    thR = theta[:, None, None] * R                      # (d, n1, n2)
    g_row = 2.0 * thR * phi1                             # (d, n1, n2): d/dx1_a
    g_col = -2.0 * thR * phi1                            # (d, n1, n2): d/dx2_b
    # mixed: -2 th_a d_ab phi' - 4 th_a th_b R_a R_b phi''
    gg = -4.0 * thR[:, None] * thR[None, :] * phi2       # (d, d, n1, n2)
    gg = gg + jnp.eye(dim, dtype=R.dtype)[:, :, None, None] * (
        -2.0 * theta[:, None, None, None] * phi1[None, None]
    )

    top = jnp.concatenate([phi[None], g_col], axis=0)    # (1+d, n1, n2)
    bot = jnp.concatenate([g_row[:, None], gg], axis=1)  # (d, 1+d, n1, n2)
    return jnp.concatenate([top[None], bot], axis=0)     # (1+d, 1+d, n1, n2)


def _flatten_blocks(G, idx_g1, idx_g2):
    """(1+d, 1+d, n1, n2) block tensor -> (n1 + g1*d, n2 + g2*d) matrix.

    Row/col layout matches the reference (values first, then gradient blocks
    grouped by coordinate dimension; KernelSqExp.py:381-410).  ``idx_g1`` /
    ``idx_g2`` are static integer index arrays selecting which points
    contribute gradient rows/cols (the reference's ``bvec_use_grad``).
    """
    dim = G.shape[0] - 1
    top_blocks = [G[0, 0]]
    for b in range(1, dim + 1):
        blk = G[0, b]
        if idx_g2 is not None:
            blk = blk[:, idx_g2]
        top_blocks.append(blk)
    rows = [jnp.concatenate(top_blocks, axis=1)]
    for a in range(1, dim + 1):
        row_blocks = []
        blk0 = G[a, 0]
        if idx_g1 is not None:
            blk0 = blk0[idx_g1, :]
        row_blocks.append(blk0)
        for b in range(1, dim + 1):
            blk = G[a, b]
            if idx_g1 is not None:
                blk = blk[idx_g1, :]
            if idx_g2 is not None:
                blk = blk[:, idx_g2]
            row_blocks.append(blk)
        rows.append(jnp.concatenate(row_blocks, axis=1))
    return jnp.concatenate(rows, axis=0)


def kern_grad(kernel_type: str, R, theta, alpha=None,
              idx_g1: Optional[jnp.ndarray] = None,
              idx_g2: Optional[jnp.ndarray] = None):
    """Gradient-enhanced kernel matrix, shape (n1 + g1*dim, n2 + g2*dim).

    Reference: the per-kernel ``calc_KernGrad`` numba assemblies
    (e.g. KernelSqExp.py:322-410).
    """
    G = kern_block_tensor(kernel_type, R, theta, alpha)
    return _flatten_blocks(G, idx_g1, idx_g2)


def kern_mat(kernel_type: str, R, theta, alpha=None, use_grad: bool = True,
             idx_g1=None, idx_g2=None):
    """Dispatch: grad-enhanced or base kernel matrix (Kernel.py:115-126)."""
    if use_grad:
        return kern_grad(kernel_type, R, theta, alpha, idx_g1, idx_g2)
    return kern_base(kernel_type, R, theta, alpha)


def kern_hess_x(kernel_type: str, R, theta, alpha=None, use_grad: bool = True,
                idx_g2=None):
    """Second derivative of the (grad-enhanced) cross-kernel w.r.t. the first
    argument x1, for surrogate Hessians.

    Returns shape (dim, n1*dim, n2*(1+dim)) when ``use_grad`` (third
    derivatives in the gradient columns), else (dim, n1*dim, n2).  Mirrors the
    reference's ``calc_KernGrad_grad_x`` / ``calc_KernBase_hess_x``
    (KernelSqExp.py:49-88, 186-238).
    """
    dim, n1, n2 = R.shape
    W = _weighted_sqdist(R, theta)
    phi, phi1, phi2, phi3 = _PHI[kernel_type](W, alpha)

    thR = theta[:, None, None] * R                       # (d, n1, n2)
    eye = jnp.eye(dim, dtype=R.dtype)

    # value columns: d2 k / dx1_i dx1_k = 4 th_i th_k R_i R_k phi'' + 2 th_i d_ik phi'
    val_cols = (4.0 * thR[None, :] * thR[:, None] * phi2
                + 2.0 * theta[None, :, None, None] * eye[:, :, None, None] * phi1)
    # shape (k, i, n1, n2) -> rows grouped by i: (k, i*n1, n2)
    val_cols = val_cols.transpose(0, 1, 2, 3).reshape(dim, dim * n1, n2)

    if not use_grad:
        return val_cols

    # gradient columns: d3 k / dx1_i dx1_k dx2_j
    #   = -8 th_i th_j th_k phi''' R_i R_j R_k
    #     - 4 th_i th_k phi'' (d_ij R_k + d_kj R_i)
    #     - 4 th_i th_j phi'' d_ik R_j
    # axes below: (k, i, j, n1, n2)
    Tk = thR[:, None, None]
    Ti = thR[None, :, None]
    Tj = thR[None, None, :]
    d_ij = eye[None, :, :, None, None]
    d_kj = eye[:, None, :, None, None]
    d_ik = eye[:, :, None, None, None]
    th = theta
    term_ij = -4.0 * d_ij * (th[None, :, None, None, None] * Tk) * phi2
    term_kj = -4.0 * d_kj * (th[:, None, None, None, None] * Ti) * phi2
    term_ik = -4.0 * d_ik * (th[:, None, None, None, None] * Tj) * phi2
    grad_cols = -8.0 * Ti * Tj * Tk * phi3 + term_ij + term_kj + term_ik
    if idx_g2 is not None:
        grad_cols = grad_cols[:, :, :, :, idx_g2]
    n2g = grad_cols.shape[-1]
    # columns grouped by j: (k, i*n1, j*n2g)
    grad_cols = grad_cols.transpose(0, 1, 3, 2, 4).reshape(dim, dim * n1, dim * n2g)
    return jnp.concatenate([val_cols, grad_cols], axis=2)


# ---------------------------------------------------------------------------
# Scalar-kernel autodiff oracle (tests only)
# ---------------------------------------------------------------------------

def scalar_kernel(kernel_type: str, x1, x2, theta, alpha=None):
    """k(x1, x2) as a scalar function of two points -- the autodiff oracle
    used by the test-suite to validate every closed-form block."""
    r = x1 - x2
    W = jnp.sum(theta * r * r)
    phi, *_ = _PHI[kernel_type](W, alpha)
    return phi
