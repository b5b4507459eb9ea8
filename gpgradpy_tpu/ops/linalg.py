"""Dense linear algebra for the GP core: Cholesky with a success flag,
triangular solves, log-determinant, and condition numbers.

Replaces the reference's scipy.linalg.cho_factor/cho_solve usage
(/root/reference/gpgradpy/src/kernel/Kernel.py:247-305) with XLA
``lax.linalg`` primitives.  Cholesky failure cannot raise inside ``jit``;
instead XLA returns NaNs, which we detect and expose as a boolean ``ok`` flag
so callers can implement the reference's condition-number fallback
(CalcLkd.py:308-311) with ``jnp.where``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class CholFac(NamedTuple):
    """Lower-triangular Cholesky factor with validity flag."""
    L: jnp.ndarray
    ok: jnp.ndarray  # scalar bool


def cholesky_ok(A: jnp.ndarray) -> CholFac:
    L = jnp.linalg.cholesky(A)
    d = jnp.diagonal(L)
    ok = jnp.all(jnp.isfinite(d)) & jnp.all(d > 0.0)
    # sanitize so downstream solves of a failed factor stay finite
    L = jnp.where(ok, L, jnp.eye(A.shape[0], dtype=A.dtype))
    return CholFac(L, ok)


def cho_solve(fac: CholFac, b: jnp.ndarray) -> jnp.ndarray:
    y = solve_triangular(fac.L, b, lower=True)
    return solve_triangular(fac.L, y, lower=True, trans=1)


def logdet_from_chol(fac: CholFac) -> jnp.ndarray:
    """log det A = 2 sum log diag(L)  (CalcLkd.py:354)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(fac.L)))


def solve_from_chol(fac: CholFac, b):
    return cho_solve(fac, b)


def refine_solve(fac: CholFac, M: jnp.ndarray, b: jnp.ndarray,
                 n_iter: int) -> jnp.ndarray:
    """Mixed-precision iterative refinement of ``M x = b``.

    ``fac`` is a (lower-precision, typically f32) Cholesky factor of ``M``;
    residual corrections are carried in the precision of ``M``/``b``
    (typically f64).  Each iteration contracts the error by
    ~cond(M)*eps_low, so with cond(M) <= ~1e6 two iterations reach ~eps_high
    accuracy while the O(n^3) factorization stays in the fast low precision
    (only O(n^2) residual matvecs run in high precision — the TPU-friendly
    way to close the f32-vs-f64 quality gap)."""
    lo = fac.L.dtype
    hi = jnp.promote_types(M.dtype, b.dtype)
    x = cho_solve(fac, b.astype(lo)).astype(hi)
    for _ in range(int(n_iter)):
        r = b - M @ x
        x = x + cho_solve(fac, r.astype(lo)).astype(hi)
    return x


@lru_cache(maxsize=16)
def _chol_dist_fn(mesh, block: int):
    """Distributed-forward Cholesky with an analytic (single-device) pullback.

    Forward: the right-looking blocked factorization of parallel/chol_dist.py
    runs O(n^3 / n_dev) flops per device over the mesh; the factor comes back
    as one logical (row-sharded) array.  Backward: reverse-differentiating
    the fori_loop factorization is impossible, so the standard Cholesky
    pullback  Abar = L^-T Phi(L^T Lbar) L^-1  (Phi = tril with halved
    diagonal; the same closed form XLA's native cholesky VJP uses) is applied
    to the SAVED factor with two triangular solves -- O(n^3) on one device,
    exactly the cost the dense path's VJP already pays, so swapping the
    forward factorization for the distributed one never regresses the
    gradient path.  (A sharded triangular-solve pullback is the documented
    extension, parallel/chol_dist.py module docstring.)
    """
    from ..parallel.chol_dist import cholesky_dist

    @jax.custom_vjp
    def f(A):
        L, _ = cholesky_dist(mesh, A, block=block)
        return L

    def fwd(A):
        L = f(A)
        return L, L

    def bwd(L, Lbar):
        # HIGHEST precision: the TPU default matmul runs bf16-input passes,
        # which at the production f32/cond-1e6 operating point corrupts the
        # pullback enough to stall L-BFGS (see chol_dist.py trailing update)
        W = jnp.tril(jnp.matmul(L.T, Lbar,
                                precision=jax.lax.Precision.HIGHEST))
        W = W - 0.5 * jnp.diag(jnp.diagonal(W))
        Y = solve_triangular(L, W, lower=True, trans=1)        # L^T Y = Phi
        Abar = solve_triangular(L, Y.T, lower=True, trans=1).T  # Y L^-1
        # the primal input is symmetric by construction; hand back the
        # symmetrized pullback so either (i,j)/(j,i) routing upstream sees
        # the same sensitivity (matches jnp.linalg.cholesky to ~eps, see
        # tests/test_dense_dist.py)
        return (0.5 * (Abar + Abar.T),)

    f.defvjp(fwd, bwd)
    return f


def cholesky_ok_dist(A: jnp.ndarray, mesh, block: int = 64) -> CholFac:
    """``cholesky_ok`` with the factorization distributed over ``mesh``
    (parallel/chol_dist.py) -- the mid-n direct branch of SURVEY 5.7.
    Same contract: sanitized factor + ok flag, differentiable.

    GRADIENT CONTRACT: the custom VJP returns the SYMMETRIZED pullback
    (dA symmetric), which is correct only when A is constructed
    elementwise-symmetrically from the differentiated inputs -- true of
    every covariance assembly here (K(xi,xj) = K(xj,xi) elementwise).  A
    caller building A asymmetrically (A + tril(B), say) would get silently
    wrong gradients; use jnp.linalg.cholesky for such inputs."""
    L = _chol_dist_fn(mesh, int(block))(A)
    d = jnp.diagonal(L)
    ok = jnp.all(jnp.isfinite(d)) & jnp.all(d > 0.0)
    L = jnp.where(ok, L, jnp.eye(A.shape[0], dtype=A.dtype))
    return CholFac(L, ok)


@jax.custom_vjp
def cond_eigh(A: jnp.ndarray) -> jnp.ndarray:
    """Spectral (L2) condition number of a symmetric matrix via eigh.

    Custom VJP: the adjoint is the reference's closed form
    (GpHparaCon.py:179-194, cond_l2_w_grad below)
        d cond / dA = (v_max v_max^T - cond * v_min v_min^T) / eig_min,
    two rank-1 outer products on the eigenvectors the forward already
    computes -- instead of reverse-differentiating THROUGH eigh (extra
    O(n^3) eigenvector-sensitivity products, fragile for clustered
    eigenvalues).  For a degenerate extremal eigenvalue this picks the same
    subgradient the reference does.  When the min eigenvalue is clamped at
    tiny the cond is locally constant in it and that term's cotangent is
    zeroed."""
    w = jnp.linalg.eigvalsh(A)
    w_min = jnp.maximum(w[0], jnp.finfo(A.dtype).tiny)
    return w[-1] / w_min


def _cond_eigh_fwd(A):
    w, V = jnp.linalg.eigh(A)
    tiny = jnp.finfo(A.dtype).tiny
    w_min = jnp.maximum(w[0], tiny)
    return w[-1] / w_min, (w, V)


def _cond_eigh_bwd(res, g):
    w, V = res
    tiny = jnp.finfo(V.dtype).tiny
    w_min = jnp.maximum(w[0], tiny)
    active = (w[0] > tiny).astype(V.dtype)
    v_min = V[:, 0]
    v_max = V[:, -1]
    dA = g * (jnp.outer(v_max, v_max) / w_min
              - active * (w[-1] / (w_min * w_min))
              * jnp.outer(v_min, v_min))
    return (dA,)


cond_eigh.defvjp(_cond_eigh_fwd, _cond_eigh_bwd)


def cond_l2_w_grad(A: jnp.ndarray):
    """L2 condition number and its adjoint matrix d(cond)/dA.

    Eigenvector formula from the reference (GpHparaCon.py:179-194):
      d cond / dA = (v_max v_max^T - cond * v_min v_min^T) / eig_min
    The caller contracts the adjoint with dA/d(hp).
    """
    w, V = jnp.linalg.eigh(A)
    eig_min = w[0]
    eig_max = w[-1]
    eig_min_mod = jnp.maximum(eig_min, 1e-16)
    cond = eig_max / jnp.maximum(eig_min, jnp.finfo(A.dtype).tiny)
    v_min = V[:, 0]
    v_max = V[:, -1]
    adj = (jnp.outer(v_max, v_max) - cond * jnp.outer(v_min, v_min)) / eig_min_mod
    return cond, adj


def cond_fro_w_chol(A: jnp.ndarray, fac: CholFac):
    """Frobenius-norm condition number (GpHparaCon.py:237-246).

    Gradients come from plain reverse-mode through the cho_solve: a
    hand-derived symmetric adjoint (b/a*A - a/b*A^-3, two GEMMs on the
    saved inverse) was measured SLOWER than XLA's autodiff of the n-RHS
    triangular solves at n=572 f64 CPU (0.96 vs 0.70 s/eval), so it was
    deliberately not kept -- unlike the spectral cond_eigh above, where
    the closed-form rank-1 adjoint wins 2x."""
    n = A.shape[0]
    A_inv = cho_solve(fac, jnp.eye(n, dtype=A.dtype))
    return jnp.linalg.norm(A, "fro") * jnp.linalg.norm(A_inv, "fro")
