"""Central covariance assembly: kernel matrix + noise + conditioning + Cholesky.

Differentiable, jit-safe rewrite of the reference's
``Kernel.calc_all_K_w_chofac`` (/root/reference/gpgradpy/src/kernel/Kernel.py:140-307).

With the 'precon' method the regularized covariance is
    Keta = K + diag(noise)/varK + eta * P^2,   P = diag(p),
    p = sqrt(diag(K + diag(noise)/varK)),
factorized via the well-conditioned correlation matrix
    M = P^-1 (K + diag(noise)/varK) P^-1 + eta I,   Keta = P M P,
so solves are ``P^-1 M^-1 P^-1 b`` and log det Keta = log det M + 2 sum log p
(the reference's Cholesky-factor trick, Kernel.py:251-252).  With 'base' (and
the rescaling methods) P = I and Keta = K + diag(noise)/varK + eta I.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import GpConfig
from ..ops import kernels, linalg, rtensor
from ..types import DataSpec, GpData, Hypers


class KetaOps(NamedTuple):
    """Factorized regularized covariance (correlation scale, varK excluded)."""
    fac: linalg.CholFac     # Cholesky factor of the inner matrix M
    pvec: jnp.ndarray       # preconditioner diagonal (ones when not precon)
    logdet: jnp.ndarray     # log det Keta (including the P transform)
    etaK: jnp.ndarray       # nugget actually applied
    M: jnp.ndarray          # the factorized (well-conditioned) matrix
    ok: jnp.ndarray         # Cholesky success flag

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Keta^-1 b."""
        pb = (b.T / self.pvec).T
        y = linalg.cho_solve(self.fac, pb)
        return (y.T / self.pvec).T


def calc_noise_vec(spec: DataSpec, data: GpData, hp: Hypers) -> jnp.ndarray:
    """Per-datum noise variance vector, length n_data_tot
    (reference Kernel.calc_noise_vec, Kernel.py:309-357); padding entries
    get zero noise (they are structurally masked anyway)."""
    dtype = data.x.dtype
    if spec.b_fval_zero and spec.b_fgrad_zero:
        return jnp.zeros(spec.n_data_tot, dtype=dtype)

    if spec.known_eps_fval:
        nv_val = data.std_fval.astype(dtype) ** 2
    else:
        var_fval = hp.var_fval if hp.var_fval is not None else 0.0
        nv_val = jnp.full(spec.n_eval_tot, 1.0, dtype=dtype) * var_fval
        if spec.n_pad_eval:
            pad_m = jnp.asarray(spec.pad_mask()[:spec.n_eval_tot], dtype)
            nv_val = nv_val * pad_m

    if not spec.use_grad:
        return nv_val

    if spec.known_eps_fgrad:
        nv_grad = (data.std_grad.astype(dtype) ** 2).T.reshape(-1)
    else:
        var_fgrad = hp.var_fgrad if hp.var_fgrad is not None else 0.0
        nv_grad = jnp.full(spec.n_grad * spec.dim, 1.0, dtype=dtype) * var_fgrad

    return jnp.concatenate([nv_val, nv_grad])


@lru_cache(maxsize=16)
def _pallas_kern_ad(kernel_type: str):
    """Pallas forward assembly with an XLA closed-form backward: jax.grad of
    the MLL differentiates through the covariance, and pallas_call has no
    automatic transpose, so the VJP falls back to the (equally correct)
    vectorized closed-form assembly of ops/kernels.py."""
    from ..ops import pallas_assembly

    @jax.custom_vjp
    def f(x, theta, alpha):
        return pallas_assembly.kern_grad_pallas(kernel_type, x, x, theta,
                                                alpha)

    def fwd(x, theta, alpha):
        return f(x, theta, alpha), (x, theta, alpha)

    def bwd(res, g):
        x, theta, alpha = res
        # theta-cotangent: fused Pallas contraction (reads Gbar once; never
        # materializes the (d, N, N) dK tensor).  x/alpha cotangents via the
        # XLA closed-form VJP -- neither is requested by the MLL autodiff
        # (x is data, alpha only exists for RatQuad), so XLA dead-code
        # eliminates them unless actually used.
        theta_bar = pallas_assembly.kern_grad_pallas_vjp_theta(
            kernel_type, x, x, theta, alpha, g)

        def ref(x, theta, alpha):
            R = rtensor.calc_rtensor(x, x)
            return kernels.kern_grad(kernel_type, R, theta, alpha)
        _, vjp = jax.vjp(ref, x, theta, alpha)
        x_bar, _, alpha_bar = vjp(g)
        return x_bar, theta_bar, alpha_bar

    f.defvjp(fwd, bwd)
    return f


def calc_kern(cfg: GpConfig, spec: DataSpec, x: jnp.ndarray, hp: Hypers):
    """The (gradient-enhanced) kernel matrix for the training inputs.

    With ``cfg.use_pallas`` (TPU, full gradient set) the tiled Pallas
    assembly produces the matrix with a single HBM write; otherwise the
    vectorized XLA closed forms.  The Pallas path only engages where it
    measurably wins (v5e, latency-cancelled, auto tile, per-tile branch
    dispatch: n_data=8192 641 GB/s vs 127 XLA; 4096 671 vs 214; 2048 485
    vs 227; at n_data<=1024 XLA's fused dense assembly is faster (374 vs
    157) and the extra Mosaic compile through the remote tunnel is pure
    overhead)."""
    idx = spec.idx_grad_arr
    n_data_full = x.shape[0] * (spec.dim + 1)
    if (cfg.use_pallas and cfg.use_grad and idx is None
            and n_data_full >= 2048
            and x.dtype != jnp.float64
            and jax.default_backend() != "cpu"):
        alpha = hp.kernel if hp.kernel is not None else jnp.asarray(0.0, x.dtype)
        return _pallas_kern_ad(cfg.kernel_type)(x, hp.theta, alpha)
    R = rtensor.calc_rtensor(x, x)
    return kernels.kern_mat(cfg.kernel_type, R, hp.theta, hp.kernel,
                            use_grad=cfg.use_grad, idx_g1=idx, idx_g2=idx)


def assemble_keta(cfg: GpConfig, spec: DataSpec, data: GpData, hp: Hypers,
                  eta_const: float, varK: Optional[jnp.ndarray] = None,
                  Kern: Optional[jnp.ndarray] = None,
                  factor_dtype=None, mesh=None) -> KetaOps:
    """Assemble and factorize the regularized covariance (correlation scale).

    ``varK`` scales the noise term only (Kern_w_noise = K + diag(noise)/varK,
    Kernel.py:218); in the noise-free regime pass varK=1 (the reference's
    ``calc_Kern_w_chofac``, Kernel.py:128-138).

    ``factor_dtype`` (e.g. jnp.float32) factorizes a downcast copy of M while
    keeping M itself in the assembly precision — the mixed-precision mode
    where solves go through ``linalg.refine_solve`` against the full-precision
    M (see predict._ops_solve).

    ``mesh`` (a 1-D device mesh) routes the factorization through the
    distributed blocked Cholesky (parallel/chol_dist.py, O(n^3/n_dev) per
    device) -- the mid-n direct branch of SURVEY 5.7, engaged by the facade's
    solver='dense_dist'.  Requires n_data divisible by
    mesh.size * cfg.dist_chol_block (use pad_n_eval_multiple).
    """
    def _chol(M):
        if mesh is not None:
            return linalg.cholesky_ok_dist(M, mesh,
                                           block=cfg.dist_chol_block)
        return linalg.cholesky_ok(M)

    if Kern is None:
        Kern = calc_kern(cfg, spec, data.x, hp)
    n_data = Kern.shape[0]

    # structural masking of padded points: identity rows/cols in the kernel
    pad_mask = spec.pad_mask()
    if pad_mask is not None:
        m = jnp.asarray(pad_mask, Kern.dtype)
        Kern = Kern * (m[:, None] * m[None, :]) + jnp.diag(1.0 - m)

    noise = calc_noise_vec(spec, data, hp)
    varK_eff = 1.0 if varK is None else varK
    Kw = Kern + jnp.diag(noise / varK_eff)

    if cfg.wellcond_mtd == "precon":
        pvec = jnp.sqrt(jnp.diagonal(Kw))
        Kcor = Kw / (pvec[:, None] * pvec[None, :])
        if cfg.cond_eta_is_const:
            etaK = jnp.asarray(eta_const, dtype=Kern.dtype)
        else:
            etaK = (jnp.max(jnp.sum(jnp.abs(Kcor), axis=1))
                    / (cfg.cond_max_target - 1.0))
        M = Kcor + etaK * jnp.eye(n_data, dtype=Kern.dtype)
        fac = _chol(M if factor_dtype is None
                    else M.astype(factor_dtype))
        logdet = (linalg.logdet_from_chol(fac).astype(M.dtype)
                  + 2.0 * jnp.sum(jnp.log(pvec)))
    else:
        pvec = jnp.ones(n_data, dtype=Kern.dtype)
        if cfg.cond_eta_is_const:
            etaK = jnp.asarray(eta_const, dtype=Kern.dtype)
        else:
            etaK = (jnp.max(jnp.sum(jnp.abs(Kern), axis=1))
                    / (cfg.cond_max_target - 1.0))
        M = Kw + etaK * jnp.eye(n_data, dtype=Kern.dtype)
        fac = _chol(M if factor_dtype is None
                    else M.astype(factor_dtype))
        logdet = linalg.logdet_from_chol(fac).astype(M.dtype)

    if pad_mask is not None:
        # padded diagonal entries contribute log(1 + eta) each; remove them
        # so logdet is exactly that of the unpadded Keta
        logdet = logdet - spec.n_pad_eval * jnp.log1p(etaK)

    return KetaOps(fac=fac, pvec=pvec, logdet=logdet, etaK=etaK, M=M,
                   ok=fac.ok)


def calc_cond(ops: KetaOps, norm=2) -> jnp.ndarray:
    """Condition number of the factorized matrix M -- for 'precon' this is
    cond(Kcov_precon) (Kernel.py:240); otherwise cond(Kcov) up to the varK
    scale (which cancels in either norm).

    ``norm`` dispatches like the reference (GpHparaCon.calc_cond_w_grad,
    GpHparaCon.py:135-155): 2 -> spectral via eigh; 'fro' -> Frobenius via
    Cholesky solves (cheaper; no eigendecomposition).  Gradients of either
    come from autodiff of this value (the reference hand-derives both,
    GpHparaCon.py:161-261)."""
    if norm == "fro":
        return linalg.cond_fro_w_chol(ops.M, ops.fac)
    assert norm == 2, f"cond_norm must be 2 or 'fro', got {norm!r}"
    return linalg.cond_eigh(ops.M)
