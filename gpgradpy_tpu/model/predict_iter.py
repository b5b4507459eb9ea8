"""Large-n posterior prediction without materializing the training
covariance: solves via batched CG against the matrix-free (optionally
point-axis-sharded) Keta matvec, cross-covariance assembled blockwise.

Completes the large-n story of SURVEY.md section 5.7 on the serving side:
``likelihood_iter`` fits the hyperparameters at scale, this module evaluates
mu/sigma (and their x-gradients) at scale.  Noise-free and noisy regimes,
full/partial/no gradients (the same masked full-layout trick as
likelihood_iter).  Dense path equivalent: model/predict.py
(GpEvalModel.py:59-198)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import GpConfig
from ..ops import iterative, kernels, rtensor
from ..types import DataSpec, GpData, Hypers
from . import mean
from .likelihood_iter import _gls, _iter_setup, _solver


def _cross_cov_full(cfg: GpConfig, spec: DataSpec, x_train: jnp.ndarray,
                    xq: jnp.ndarray, hp: Hypers, mesh=None,
                    calc_grad: bool = False):
    """Cross covariance in the FULL blocked layout: Kyx (n*(1+d), nx) rows =
    cov(training value/derivative rows, f(xq)); with ``calc_grad`` also
    dKxy_dx (nx*d, n*(1+d)) = cov(rows, df/dx_b(xq)) transposed, ordered
    b*nx + q (the dense predict._cross_cov convention).  Masking of missing
    gradient rows is the caller's job.  With ``mesh`` the training axis is
    sharded (no grad support there yet)."""
    dim = x_train.shape[1]
    nx = xq.shape[0]
    if mesh is not None:
        assert not calc_grad, "sharded cross-cov: mu/sig only"
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..parallel.sharded_matvec import DATA_AXIS

        def local(x_loc, xq_):
            R = rtensor.calc_rtensor(x_loc, xq_)
            G = kernels.kern_block_tensor(cfg.kernel_type, R, hp.theta,
                                          hp.kernel)
            blk = G[:, 0]                                  # (1+d, n_loc, nx)
            return blk.transpose(1, 0, 2).reshape(-1, nx)  # pm rows

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(DATA_AXIS), P(None, None)),
                       out_specs=P(DATA_AXIS), check_vma=False)
        return fn(x_train, xq), None

    R = rtensor.calc_rtensor(x_train, xq)
    G = kernels.kern_block_tensor(cfg.kernel_type, R, hp.theta, hp.kernel)
    n = x_train.shape[0]
    Kyx = G[:, 0].reshape((1 + dim) * n, nx)               # blocked rows
    dKxy_dx = None
    if calc_grad:
        dK = [G[:, b].reshape((1 + dim) * n, nx) for b in range(1, dim + 1)]
        dKxy_dx = jnp.concatenate([d.T for d in dK], axis=0)
    return Kyx, dKxy_dx


class IterEvalState(NamedTuple):
    """Device-resident serving state of the iterative predict path: the
    residual solve is done once at setup; each eval only solves for the
    query cross-covariance columns (sig) or none at all (mu-only)."""
    hp: Hypers                 # with beta/varK filled in
    alpha: jnp.ndarray         # Keta'^-1 (y - V beta), working layout
    cg_resid: jnp.ndarray
    cg_iters: jnp.ndarray


def setup_eval_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                         hp: Hypers, eta_const: float,
                         max_cg_iters: int = 256, cg_tol: float = 1e-10,
                         row_block: int = 256, mesh=None) -> IterEvalState:
    """Matrix-free analog of predict.setup_eval: one batched CG for the
    residual solve (and GLS beta/varK if hp doesn't carry them yet)."""
    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)
    beta, r, alpha, res = _gls(pieces, solve, beta_known=hp.beta)
    varK = hp.varK
    if varK is None:
        assert not spec.b_has_noisy_data
        varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / spec.n_data)
    return IterEvalState(hp=hp._replace(beta=beta, varK=varK), alpha=alpha,
                         cg_resid=jnp.max(res.residnorm), cg_iters=res.n_iter)


def eval_model_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                         state: IterEvalState, eta_const: float,
                         xq: jnp.ndarray, calc_sig: bool = True,
                         calc_grad: bool = False,
                         max_cg_iters: int = 256, cg_tol: float = 1e-10,
                         row_block: int = 256, mesh=None):
    """(mu, sig, dmudx, dsigdx) at query points xq (nx, dim) -- the
    matrix-free analog of predict.eval_model.  sig costs one batched CG over
    the nx cross-covariance columns; mu alone costs only the cross-cov
    assembly and a matvec against the cached alpha."""
    hp = state.hp
    nx, dim = xq.shape
    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)

    Kyx, dKxy_dx = _cross_cov_full(cfg, spec, data.x, xq, hp, mesh=mesh,
                                   calc_grad=calc_grad)
    if pieces.mask is not None:
        Kyx = Kyx * pieces.mask[:, None]
        if dKxy_dx is not None:
            dKxy_dx = dKxy_dx * pieces.mask[None, :]

    mval, mgrad, _ = mean.eval_mean_fun(cfg.mean_fun_type, xq, hp.beta)
    mu = mval + Kyx.T @ state.alpha
    varK = hp.varK
    sigK = jnp.sqrt(varK)

    sig = dmudx = dsigdx = None
    if calc_grad:
        dmudx = (dKxy_dx @ state.alpha).reshape(dim, nx).T + mgrad

    if calc_sig:
        solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)
        invK_Kyx, _ = solve(Kyx)
        sig2_wo = jnp.maximum(1.0 - jnp.sum(Kyx * invK_Kyx, axis=0), 0.0)
        sig = jnp.sqrt(sig2_wo) * sigK
        if calc_grad:
            # d sig/dx = -varK (dKxy . Keta^-1 Kyx) / sig  (predict.py)
            term2 = jnp.sum(dKxy_dx * jnp.tile(invK_Kyx.T, (dim, 1)), axis=1)
            inv_sig = jnp.where(sig > 0, 1.0 / jnp.where(sig > 0, sig, 1.0),
                                0.0)
            dsigdx = -(inv_sig[:, None]) * term2.reshape(dim, nx).T * varK
    return mu, sig, dmudx, dsigdx


def predict_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                      hp: Hypers, eta_const: float, xq: jnp.ndarray,
                      max_cg_iters: int = 256, cg_tol: float = 1e-10,
                      row_block: int = 256, mesh=None, calc_sig: bool = True):
    """One-shot posterior (mu, sig, beta, varK, res) at query points xq.

    beta/varK come from the same GLS-through-CG as the iterative MLL; the
    query solves batch into one extra mbcg call.  With ``mesh`` the
    training-point axis stays sharded end-to-end (cross-covariance rows
    assembled per shard; contractions reduce over the mesh automatically).
    For repeated serving use setup_eval_iterative + eval_model_iterative."""
    n_data = spec.n_data
    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)

    Kyx, _ = _cross_cov_full(cfg, spec, data.x, xq, hp, mesh=mesh)
    if pieces.mask is not None:
        Kyx = Kyx * pieces.mask[:, None]

    data_vec, vand = pieces.data_vec, pieces.vand
    nb = vand.shape[1]
    rhs = jnp.concatenate([data_vec[:, None], vand,
                           Kyx if calc_sig else Kyx[:, :0]], axis=1)
    sols, res = solve(rhs)
    invK_y = sols[:, 0]
    invK_V = sols[:, 1:1 + nb]
    A = vand.T @ invK_V
    beta = mean._spd_solve(A, invK_V.T @ data_vec)
    r = data_vec - vand @ beta
    alpha = invK_y - invK_V @ beta
    if spec.b_has_noisy_data:
        varK = hp.varK
    else:
        varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / n_data)

    mval, _, _ = mean.eval_mean_fun(cfg.mean_fun_type, xq, beta)
    mu = mval + Kyx.T @ alpha

    sig = None
    if calc_sig:
        invK_Kyx = sols[:, 1 + nb:]
        sig2_wo = 1.0 - jnp.sum(Kyx * invK_Kyx, axis=0)
        sig = jnp.sqrt(jnp.maximum(sig2_wo, 0.0) * varK)
    return mu, sig, beta, varK, res
