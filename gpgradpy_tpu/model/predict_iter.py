"""Large-n posterior prediction without materializing the training
covariance: solves via batched CG against the matrix-free (optionally
point-axis-sharded) Keta matvec, cross-covariance assembled blockwise.

Completes the large-n story of SURVEY.md section 5.7 on the serving side:
``likelihood_iter`` fits the hyperparameters at scale, this module evaluates
mu/sigma at scale.  Noise-free full-gradient square case (the reference's
headline configuration); dense path equivalent: model/predict.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GpConfig
from ..ops import iterative, kernels, rtensor
from ..types import DataSpec, GpData, Hypers
from . import likelihood, mean
from .likelihood_iter import _keta_diag, _pm_base_diag


def _nf_setup(cfg: GpConfig, spec: DataSpec, data: GpData, hp: Hypers,
              eta_const: float, row_block: int, mesh):
    """(mv, diag, data_vec, vand) for the noise-free regime, in the blocked
    (mesh=None) or point-major sharded layout (same pieces as
    likelihood_iter.calc_lkd_iterative)."""
    dtype = data.x.dtype
    theta = hp.theta
    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        base = _pm_base_diag(cfg, spec.n_eval, theta, dtype)
        if cfg.wellcond_mtd == "precon":
            diag = base * (1.0 + eta_const)
            pvec2_pm = base
        else:
            diag = base + eta_const
            pvec2_pm = None

        def mv(V):
            return sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, theta, hp.kernel, V,
                eta=eta_const, pvec2_pm=pvec2_pm)

        conv = lambda v: sm.blocked_to_pm_mat(v, spec.n_eval, spec.dim)
    else:
        if cfg.wellcond_mtd == "precon":
            diag = _keta_diag(cfg, spec, hp, eta_const,
                              jnp.zeros(spec.n_data, dtype), dtype)
            pvec = jnp.sqrt(diag / (1.0 + eta_const))
        else:
            gamma2 = kernels.theta2gamma(cfg.kernel_type, theta) ** 2
            diag = (jnp.concatenate([jnp.ones(spec.n_eval, dtype),
                                     jnp.repeat(gamma2.astype(dtype),
                                                spec.n_eval)]) + eta_const)
            pvec = None

        def mv(V):
            return iterative.kern_matvec(cfg.kernel_type, data.x, theta,
                                         hp.kernel, V, row_block=row_block,
                                         eta=eta_const, pvec=pvec)

        conv = lambda v: v
    data_vec = conv(likelihood.make_data_vec(spec, data))
    vand = conv(mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad))
    return mv, diag, data_vec, vand, conv


def _cross_cov_sharded(cfg: GpConfig, mesh, x_train: jnp.ndarray,
                      xq: jnp.ndarray, hp: Hypers) -> jnp.ndarray:
    """Kyx (n*(1+d), nx) in the point-major layout with the training-point
    axis sharded: each device assembles only its rows (query block = values).
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ..parallel.sharded_matvec import DATA_AXIS

    dim = x_train.shape[1]
    nx = xq.shape[0]

    def local(x_loc, xq_):
        R = rtensor.calc_rtensor(x_loc, xq_)
        G = kernels.kern_block_tensor(cfg.kernel_type, R, hp.theta,
                                      hp.kernel)
        blk = G[:, 0]                                  # (1+d, n_loc, nx)
        return blk.transpose(1, 0, 2).reshape(-1, nx)  # pm rows

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(None, None)),
                   out_specs=P(DATA_AXIS), check_rep=False)
    return fn(x_train, xq)


def predict_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                      hp: Hypers, eta_const: float, xq: jnp.ndarray,
                      max_cg_iters: int = 256, cg_tol: float = 1e-10,
                      row_block: int = 256, mesh=None, calc_sig: bool = True):
    """Posterior (mu, sig) at query points xq of shape (nx, dim).

    beta/varK come from the same GLS-through-CG as the iterative MLL; the
    query solves batch into one extra mbcg call.  With ``mesh`` the
    training-point axis stays sharded end-to-end (cross-covariance rows
    assembled per shard; contractions reduce over the mesh automatically).
    """
    assert not spec.b_has_noisy_data
    assert spec.idx_grad_arr is None and spec.n_pad_eval == 0
    nx = xq.shape[0]
    n_data = spec.n_data

    mv, diag, data_vec, vand, _ = _nf_setup(cfg, spec, data, hp, eta_const,
                                            row_block, mesh)
    d_isqrt = 1.0 / jnp.sqrt(diag)

    def solve(B):
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(lambda V: d_isqrt[:, None] * mv(d_isqrt[:, None] * V),
                             Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X, res

    if mesh is not None:
        Kyx = _cross_cov_sharded(cfg, mesh, data.x, xq, hp)
    else:
        from .predict import _cross_cov
        Kyx, _ = _cross_cov(cfg, spec, data.x, xq, hp)

    rhs = jnp.concatenate([data_vec[:, None], vand,
                           Kyx if calc_sig else Kyx[:, :0]], axis=1)
    sols, res = solve(rhs)
    nb = vand.shape[1]
    invK_y = sols[:, 0]
    invK_V = sols[:, 1:1 + nb]
    A = vand.T @ invK_V
    beta = mean._spd_solve(A, invK_V.T @ data_vec)
    r = data_vec - vand @ beta
    alpha = invK_y - invK_V @ beta
    varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / n_data)

    mval, _, _ = mean.eval_mean_fun(cfg.mean_fun_type, xq, beta)
    mu = mval + Kyx.T @ alpha

    sig = None
    if calc_sig:
        invK_Kyx = sols[:, 1 + nb:]
        sig2_wo = 1.0 - jnp.sum(Kyx * invK_Kyx, axis=0)
        sig = jnp.sqrt(jnp.maximum(sig2_wo, 0.0) * varK)
    return mu, sig, beta, varK, res
