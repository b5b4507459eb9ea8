"""Posterior prediction: mean, standard deviation and their first/second
derivatives at query points.

Rewrite of /root/reference/gpgradpy/src/eval/GpEvalModel.py with the closed
forms fully vectorized over the query batch -- including the Hessians, which
the reference restricts to one point per call (GpEvalModel.py:356-382).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import GpConfig
from ..ops import kernels, rtensor
from ..types import DataSpec, GpData, Hypers
from . import assembly, likelihood, mean


class EvalState(NamedTuple):
    """Cached quantities for surrogate evaluation (GpEvalModel.py:17-57)."""
    ops: assembly.KetaOps      # varK-normalized factorization
    invK_fdiff: jnp.ndarray    # Keta^-1 (y - m)
    hp: Hypers                 # with beta and varK filled in
    cond: jnp.ndarray


def _predict_dtype(cfg: GpConfig):
    """The precision the predict path runs in: f64 when the config says so or
    when mixed-precision refinement is on (both need jax_enable_x64)."""
    if cfg.dtype == "float64" or cfg.n_refine_predict:
        return jnp.float64
    return jnp.float32


from ..types import cast_float_tree as _cast_tree  # noqa: E402


def _ops_solve(cfg: GpConfig, ops: assembly.KetaOps, b: jnp.ndarray):
    """Keta^-1 b, with mixed-precision iterative refinement when the factor
    was taken in a lower precision than M (cfg.n_refine_predict > 0)."""
    from ..ops import linalg
    if cfg.n_refine_predict and ops.fac.L.dtype != ops.M.dtype:
        pb = (b.T / ops.pvec).T
        y = linalg.refine_solve(ops.fac, ops.M, pb, cfg.n_refine_predict)
        return (y.T / ops.pvec).T
    return ops.solve(b)


def setup_eval(cfg: GpConfig, spec: DataSpec, data: GpData, hp: Hypers,
               eta_const: float, calc_cond: bool = False) -> EvalState:
    """Factorize the varK-normalized covariance and cache Keta^-1 (y - m).

    With ``cfg.n_refine_predict > 0`` the covariance is assembled in f64 and
    factorized in f32; every predict-path solve then runs mixed-precision
    iterative refinement (requires jax_enable_x64).  With ``cfg.dtype ==
    'float64'`` any f32 inputs are promoted so a facade whose fit ran in f32
    can still evaluate the model at full precision (the polish mode)."""
    dt = _predict_dtype(cfg)
    data, hp = _cast_tree(data, dt), _cast_tree(hp, dt)
    factor_dtype = jnp.float32 if cfg.n_refine_predict else None
    ops = assembly.assemble_keta(cfg, spec, data, hp, eta_const,
                                 varK=hp.varK if spec.b_has_noisy_data else None,
                                 factor_dtype=factor_dtype)
    data_vec = likelihood.make_data_vec(spec, data)
    vand = mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad,
                              spec.idx_grad_arr)
    pad_mask = spec.pad_mask()
    if pad_mask is not None:
        mv = jnp.asarray(pad_mask, vand.dtype)
        vand = vand * mv[:, None]
        data_vec = data_vec * mv
    mean_vec = vand @ hp.beta
    invK_fdiff = _ops_solve(cfg, ops, data_vec - mean_vec)
    cond = (assembly.calc_cond(ops, cfg.cond_norm) if calc_cond
            else jnp.asarray(jnp.nan))
    return EvalState(ops=ops, invK_fdiff=invK_fdiff, hp=hp, cond=cond)


def _cross_cov(cfg: GpConfig, spec: DataSpec, x_train, xq, hp: Hypers):
    """Kyx (n_data, nx) and dKxy_dx (nx*dim, n_data): cross covariance of the
    training data (values + used gradients) with the query points and with
    the query-point derivatives (GpEvalModel.py:133-148).

    Deliberately XLA-only: a Pallas cross-covariance was built and measured
    (v5e, n_data=2048, batch 2048 queries with gradients, latency-cancelled:
    1.46 ms/predict vs 1.32 XLA) -- the predict is MXU/triangular-solve
    bound, not assembly bound, so XLA's fused assembly already feeds the
    solves at full rate and the opaque pallas_call only blocks fusion.  The
    rectangular (x1 != x2) Pallas assembly itself remains supported and
    tested (tests/test_pallas.py cross case) for callers that want the bare
    block matrix at scale."""
    R = rtensor.calc_rtensor(x_train, xq)
    G = kernels.kern_block_tensor(cfg.kernel_type, R, hp.theta, hp.kernel)
    dim = spec.dim
    idx = spec.idx_grad_arr

    def rows(col_block):
        blk = G[:, col_block]              # (1+d, n_train, nx)
        parts = [blk[0]]
        if spec.use_grad:
            for a in range(1, dim + 1):
                b = blk[a]
                if idx is not None:
                    b = b[idx, :]
                parts.append(b)
        return jnp.concatenate(parts, axis=0)   # (n_data, nx)

    Kyx = rows(0)
    dK_list = [rows(b) for b in range(1, dim + 1)]     # each (n_data, nx)
    dKxy_dx = jnp.concatenate([d.T for d in dK_list], axis=0)  # (nx*d, n_data)

    pad_mask = spec.pad_mask()
    if pad_mask is not None:
        mv = jnp.asarray(pad_mask, Kyx.dtype)
        Kyx = Kyx * mv[:, None]
        dKxy_dx = dKxy_dx * mv[None, :]
    return Kyx, dKxy_dx


def eval_model(cfg: GpConfig, spec: DataSpec, data: GpData, state: EvalState,
               xq: jnp.ndarray, calc_grad: bool = False,
               calc_hess: bool = False):
    """Returns (mu, sig, dmudx, dsigdx, d2mudx2, d2sigdx2) at the query
    points xq of shape (nx, dim); derivative outputs are None unless
    requested (GpEvalModel.eval_model, GpEvalModel.py:59-198)."""
    hp = state.hp
    nx, dim = xq.shape
    dt = _predict_dtype(cfg)
    data, xq, hp = _cast_tree(data, dt), _cast_tree(xq, dt), _cast_tree(hp, dt)
    varK = hp.varK
    sigK = jnp.sqrt(varK)

    Kyx, dKxy_dx = _cross_cov(cfg, spec, data.x, xq, hp)
    Kxy_invK = _ops_solve(cfg, state.ops, Kyx).T           # (nx, n_data)

    mval, mgrad, mhess = mean.eval_mean_fun(cfg.mean_fun_type, xq, hp.beta)

    mu = mval + Kyx.T @ state.invK_fdiff
    sig2_wo = 1.0 - jnp.sum(Kyx.T * Kxy_invK, axis=1)
    sig2_wo = jnp.maximum(sig2_wo, 0.0)                    # clip (GpEvalModel.py:165)
    sig = jnp.sqrt(sig2_wo) * sigK

    dmudx = dsigdx = d2mudx2 = d2sigdx2 = None
    if calc_grad:
        # (nx*d,) rows ordered b*nx + q  ->  (nx, d) Fortran-order reshape
        dmu_vec = dKxy_dx @ state.invK_fdiff
        dmudx = dmu_vec.reshape(dim, nx).T + mgrad

        tiled = jnp.tile(Kxy_invK, (dim, 1))               # (nx*d, n_data)
        term2 = jnp.sum(dKxy_dx * tiled, axis=1)           # (nx*d,)
        inv_sig = jnp.where(sig > 0, 1.0 / jnp.where(sig > 0, sig, 1.0), 0.0)
        dsigdx = -(inv_sig[:, None]) * term2.reshape(dim, nx).T * varK

    if calc_hess:
        Rq = rtensor.calc_rtensor(xq, data.x)
        H = kernels.kern_hess_x(cfg.kernel_type, Rq, hp.theta, hp.kernel,
                                use_grad=spec.use_grad,
                                idx_g2=spec.idx_grad_arr)  # (d, nx*d, n_data)
        # d2mu[q, k, i] = sum_m H[k, i*nx+q, m] invK_fdiff[m]
        Hv = H @ state.invK_fdiff                          # (d, nx*d)
        d2mudx2 = Hv.reshape(dim, dim, nx).transpose(2, 0, 1) + mhess

        # d2sig2[q, k, i] = -2 varK (H[k, i*nx+q, :] . Kxy_invK[q]
        #                            + dKxy_dx[k*nx+q] . Keta^-1 dKxy_dx[i*nx+q])
        Ht = H.reshape(dim, dim, nx, spec.n_data_tot)      # (k, i, q, m)
        term1 = jnp.einsum("kiqm,qm->qki", Ht, Kxy_invK)
        solve_dK = _ops_solve(cfg, state.ops, dKxy_dx.T)   # (n_data, nx*d)
        D = dKxy_dx.reshape(dim, nx, spec.n_data_tot)      # (k, q, m)
        S = solve_dK.T.reshape(dim, nx, spec.n_data_tot)   # (i, q, m)
        term2h = jnp.einsum("kqm,iqm->qki", D, S)
        d2sig2 = -2.0 * varK * (term1 + term2h)

        if dsigdx is None:
            raise ValueError("calc_hess requires calc_grad")
        sig_mod = jnp.where(sig == 0, jnp.nan, sig)
        outer = dsigdx[:, :, None] * dsigdx[:, None, :]
        d2sigdx2 = (d2sig2 - 2.0 * outer) / (2.0 * sig_mod[:, None, None])

    return mu, sig, dmudx, dsigdx, d2mudx2, d2sigdx2


def eval_model_var(cfg: GpConfig, spec: DataSpec, data: GpData,
                   state: EvalState, xq: jnp.ndarray,
                   calc_grad: bool = False, calc_hess: bool = False):
    """Variance (not std) and its derivatives (GpEvalModel.eval_model_var,
    GpEvalModel.py:200-317); unlike the reference, the Hessian is implemented."""
    hp = state.hp
    nx, dim = xq.shape
    dt = _predict_dtype(cfg)
    data, xq, hp = _cast_tree(data, dt), _cast_tree(xq, dt), _cast_tree(hp, dt)
    varK = hp.varK

    Kyx, dKxy_dx = _cross_cov(cfg, spec, data.x, xq, hp)
    Kxy_invK = _ops_solve(cfg, state.ops, Kyx).T

    sig2 = varK * jnp.maximum(1.0 - jnp.sum(Kyx.T * Kxy_invK, axis=1), 0.0)

    dsig2dx = d2sig2dx2 = None
    if calc_grad:
        tiled = jnp.tile(Kxy_invK, (dim, 1))
        term2 = jnp.sum(dKxy_dx * tiled, axis=1)
        dsig2dx = -2.0 * term2.reshape(dim, nx).T * varK
    if calc_hess:
        Rq = rtensor.calc_rtensor(xq, data.x)
        H = kernels.kern_hess_x(cfg.kernel_type, Rq, hp.theta, hp.kernel,
                                use_grad=spec.use_grad,
                                idx_g2=spec.idx_grad_arr)
        Ht = H.reshape(dim, dim, nx, spec.n_data_tot)
        term1 = jnp.einsum("kiqm,qm->qki", Ht, Kxy_invK)
        solve_dK = _ops_solve(cfg, state.ops, dKxy_dx.T)
        D = dKxy_dx.reshape(dim, nx, spec.n_data_tot)
        S = solve_dK.T.reshape(dim, nx, spec.n_data_tot)
        term2h = jnp.einsum("kqm,iqm->qki", D, S)
        d2sig2dx2 = -2.0 * varK * (term1 + term2h)
    return sig2, dsig2dx, d2sig2dx2
