"""Matrix-free iterative linear algebra for large-n gradient-enhanced GPs.

The reference (and our dense path) is O(n_data^2) memory / O(n_data^3)
Cholesky, which caps n_eval at a few hundred (SURVEY.md section 5.7).  This
module is the scaling axis: the covariance is never materialized -- matvecs
assemble kernel row-tiles on the fly (O(n_data * block) memory), solves use
batched conjugate gradients with the same diagonal preconditioner that cures
the conditioning, and log-determinants come from stochastic Lanczos
quadrature on the CG tridiagonals (the BBMM/mBCG approach of Gardner et al.
2018, adapted to the preconditioned gradient-enhanced covariance).

All loops are ``lax``-structured so the whole MLL estimate jits; the row-tile
loop is a ``lax.map`` over point blocks and shards over a mesh axis by
construction (each tile touches only its rows).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import kernels, rtensor


# ---------------------------------------------------------------------------
# Matrix-free gradient-enhanced covariance matvec
# ---------------------------------------------------------------------------

def kern_matvec(kernel_type: str, x: jnp.ndarray, theta, alpha,
                v: jnp.ndarray, row_block: int = 256,
                noise_over_varK: Optional[jnp.ndarray] = None,
                eta: float = 0.0, pvec: Optional[jnp.ndarray] = None):
    """(Keta v) without materializing Keta, for the full-gradient square case.

    Keta = K + diag(noise/varK) + eta * P^2 with P = diag(pvec) (pass
    pvec=None for the 'base' method, i.e. P = I).  ``v`` may be a matrix
    (n_data, m).  Rows are processed in point-blocks of ``row_block``.
    """
    n, dim = x.shape
    n_data = n * (1 + dim)
    v2 = v if v.ndim == 2 else v[:, None]

    nb = -(-n // row_block)
    n_pad = nb * row_block - n
    x_pad = jnp.pad(x, ((0, n_pad), (0, 0)))

    def tile(i):
        xi = jax.lax.dynamic_slice_in_dim(x_pad, i * row_block, row_block, 0)
        R = rtensor.calc_rtensor(xi, x)          # (d, B, n)
        G = kernels.kern_block_tensor(kernel_type, R, theta, alpha)
        # rows of the blocked matrix for this point tile: value rows first
        # (block a=0), then gradient rows per dim.  Columns span all blocks.
        # out[a] = sum_b G[a, b] @ v_b  where v_b = v2[b*n:(b+1)*n]
        vb = v2.reshape(1 + dim, n, -1)
        out = jnp.einsum("abBn,bnm->aBm", G, vb)  # (1+d, B, m)
        return out

    outs = jax.lax.map(tile, jnp.arange(nb))      # (nb, 1+d, B, m)
    outs = outs.transpose(1, 0, 2, 3).reshape(1 + dim, nb * row_block, -1)
    Kv = outs[:, :n, :].reshape(n_data, -1)

    if noise_over_varK is not None:
        Kv = Kv + noise_over_varK[:, None] * v2
    if eta != 0.0 or not isinstance(eta, float):
        p2 = jnp.ones(n_data, v2.dtype) if pvec is None else pvec ** 2
        Kv = Kv + eta * p2[:, None] * v2
    return Kv if v.ndim == 2 else Kv[:, 0]


# ---------------------------------------------------------------------------
# Batched preconditioned CG with Lanczos coefficient capture (mBCG)
# ---------------------------------------------------------------------------

class MbcgResult(NamedTuple):
    X: jnp.ndarray            # solutions (n, m)
    alphas: jnp.ndarray       # (iters, m) CG step sizes
    betas: jnp.ndarray        # (iters, m) CG direction updates
    residnorm: jnp.ndarray    # (m,) final relative residual norms
    n_iter: jnp.ndarray


def mbcg(matvec: Callable, B: jnp.ndarray, max_iters: int = 100,
         tol: float = 1e-10, M_inv_diag: Optional[jnp.ndarray] = None
         ) -> MbcgResult:
    """Modified batched CG: solves A X = B for all columns simultaneously and
    records the (alpha, beta) recurrences that define the Lanczos tridiagonal
    of each column (used by SLQ for logdet)."""
    n, m = B.shape
    Minv = (jnp.ones(n, B.dtype) if M_inv_diag is None else M_inv_diag)

    b_norm = jnp.linalg.norm(B, axis=0)
    b_norm = jnp.where(b_norm == 0, 1.0, b_norm)

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = Minv[:, None] * R0
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)

    class S(NamedTuple):
        k: jnp.ndarray
        X: jnp.ndarray
        R: jnp.ndarray
        P: jnp.ndarray
        rz: jnp.ndarray
        alphas: jnp.ndarray
        betas: jnp.ndarray
        done: jnp.ndarray

    def body(s: S) -> S:
        Ap = matvec(s.P)
        pAp = jnp.sum(s.P * Ap, axis=0)
        alpha = s.rz / jnp.where(pAp == 0, 1.0, pAp)
        alpha = jnp.where(s.done, 0.0, alpha)
        X = s.X + alpha[None, :] * s.P
        R = s.R - alpha[None, :] * Ap
        Z = Minv[:, None] * R
        rz_new = jnp.sum(R * Z, axis=0)
        beta = rz_new / jnp.where(s.rz == 0, 1.0, s.rz)
        beta = jnp.where(s.done, 0.0, beta)
        P = Z + beta[None, :] * s.P
        res = jnp.linalg.norm(R, axis=0) / b_norm
        done = s.done | (res < tol)
        return S(k=s.k + 1, X=X, R=R, P=P, rz=rz_new,
                 alphas=s.alphas.at[s.k].set(alpha),
                 betas=s.betas.at[s.k].set(beta),
                 done=done)

    def cond(s: S):
        return (s.k < max_iters) & (~jnp.all(s.done))

    init = S(k=jnp.asarray(0), X=X0, R=R0, P=P0, rz=rz0,
             alphas=jnp.zeros((max_iters, m), B.dtype),
             betas=jnp.zeros((max_iters, m), B.dtype),
             done=jnp.zeros(m, bool))
    s = jax.lax.while_loop(cond, body, init)
    res = jnp.linalg.norm(s.R, axis=0) / b_norm
    return MbcgResult(X=s.X, alphas=s.alphas, betas=s.betas, residnorm=res,
                      n_iter=s.k)


def lanczos_tridiag_from_cg(alphas: jnp.ndarray, betas: jnp.ndarray):
    """Lanczos T matrices from the CG (alpha, beta) recurrences.

    T[0,0] = 1/alpha_0;  T[i,i] = 1/alpha_i + beta_{i-1}/alpha_{i-1};
    T[i,i-1] = T[i-1,i] = sqrt(beta_{i-1})/alpha_{i-1}.
    alphas/betas have shape (iters, m); returns (m, iters, iters).
    """
    iters, m = alphas.shape
    a = alphas.T  # (m, iters)
    b = betas.T
    safe_a = jnp.where(a == 0, 1.0, a)
    diag0 = 1.0 / safe_a
    diag_shift = jnp.concatenate(
        [jnp.zeros((m, 1), a.dtype), b[:, :-1] / safe_a[:, :-1]], axis=1)
    diag = diag0 + diag_shift
    off = jnp.sqrt(jnp.maximum(b[:, :-1], 0.0)) / safe_a[:, :-1]
    # mask entries beyond each column's active iterations (alpha == 0)
    active = a != 0
    diag = jnp.where(active, diag, 1.0)   # eigenvalue 1 contributes log 1 = 0
    off = jnp.where(active[:, :-1] & active[:, 1:], off, 0.0)

    T = (jax.vmap(jnp.diag)(diag)
         + jax.vmap(lambda o: jnp.diag(o, 1))(off)
         + jax.vmap(lambda o: jnp.diag(o, -1))(off))
    return T


def slq_logdet(matvec: Callable, n: int, key: jax.Array,
               n_probes: int = 16, max_iters: int = 64,
               scale_diag: Optional[jnp.ndarray] = None,
               dtype=jnp.float64):
    """Stochastic Lanczos quadrature estimate of log det A for SPD A.

    E_z[z^T log(A) z] with Rademacher probes, evaluated from the eigendecomp
    of the CG-Lanczos tridiagonals.  With ``scale_diag`` = diag(A) the
    quadrature runs on the SYMMETRICALLY scaled system
        A_hat = D^-1/2 A D^-1/2,  D = diag(scale_diag),
    which is well-conditioned for the gradient-enhanced covariance (this is
    the 'precon' trick as an iterative-solver preconditioner), and
        log det A = log det A_hat + sum log scale_diag.
    """
    z = jax.random.rademacher(key, (n, n_probes), dtype=dtype)
    if scale_diag is not None:
        d_isqrt = 1.0 / jnp.sqrt(scale_diag)

        def mv_hat(V):
            return d_isqrt[:, None] * matvec(d_isqrt[:, None] * V)
    else:
        mv_hat = matvec

    res = mbcg(mv_hat, z, max_iters=max_iters)
    T = lanczos_tridiag_from_cg(res.alphas, res.betas)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 1e-30)
    # quadrature weights = first components squared of T's eigenvectors
    w = evecs[:, 0, :] ** 2
    # z_i^T log(A_hat) z_i  ~  ||z_i||^2 sum_j w_j log(lambda_j); ||z||^2 = n
    est = n * jnp.sum(w * jnp.log(evals), axis=1)
    logdet = jnp.mean(est)
    if scale_diag is not None:
        logdet = logdet + jnp.sum(jnp.log(scale_diag))
    return logdet, res
