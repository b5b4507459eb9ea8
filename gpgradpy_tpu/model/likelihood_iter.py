"""Large-n marginal log-likelihood: matrix-free CG solves + stochastic
Lanczos log-determinant, with determinant-free hyperparameter gradients.

This is the scaling path for n_data beyond the dense-Cholesky regime
(SURVEY.md section 5.7): the covariance is never materialized (O(n_data *
block) memory), solves are preconditioned CG on the symmetrically scaled
system (the 'precon' trick as an iterative preconditioner), and gradients
use the standard estimator
    d ln L / d theta = -1/2 [ n * d varK/d theta / varK + tr(K^-1 dK) ],
    d varK/d theta  = -alpha^T (dK/d theta) alpha / n,
    tr(K^-1 dK)    ~= mean_i u_i^T (dK/d theta) z_i,   u_i = K^-1 z_i,
with the quadratic forms differentiated by autodiff through the matrix-free
matvec (alpha, u_i, z_i treated as constants; beta and varK are profiled
maximizers so their sensitivities vanish by the envelope theorem).  cf. the
BBMM/mBCG line of work (Gardner et al. 2018) and determinant-free Bayesian
GP gradients (PAPERS.md).

Coverage: noise-free (varK/beta profiled out) and noisy (varK and the noise
variances as numeric hyperparameters) regimes; full, PARTIAL
(spec.idx_grad), or NO gradients.  Internally everything runs in the FULL
blocked layout (n_eval * (1 + dim) rows) with missing gradient rows masked
to an identity block:
    Keta' = M Keta M + (I - M),   M = diag(mask),
so logdet Keta' = logdet of the active submatrix and solves of zero-padded
right-hand sides reproduce the compact-system solves exactly (the masked
rows carry rhs 0 -> solution 0).  This keeps every shape static and every
matvec a dense row-tile einsum -- no gathers inside the CG loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GpConfig
from ..ops import iterative, kernels
from ..types import DataSpec, GpData, Hypers
from . import likelihood, mean


def make_grad_mask(spec: DataSpec, dtype) -> Optional[jnp.ndarray]:
    """(n_eval*(1+dim),) blocked-layout mask: 1 on value rows and on the
    gradient rows of points in spec.idx_grad, 0 elsewhere.  None in the
    full-gradient square case (no masking needed)."""
    n = spec.n_eval
    if spec.use_grad and spec.n_grad == n:
        return None
    ind = np.zeros(n)
    if spec.use_grad:
        ind[list(spec.idx_grad)] = 1.0
    m = np.concatenate([np.ones(n), np.tile(ind, spec.dim)])
    return jnp.asarray(m, dtype)


def expand_to_full(spec: DataSpec, M: jnp.ndarray) -> jnp.ndarray:
    """Compact blocked layout (n_eval + n_grad*dim[, m]) -> full blocked
    layout (n_eval*(1+dim)[, m]) with zero rows at missing gradients."""
    n, d, g = spec.n_eval, spec.dim, spec.n_grad
    if spec.use_grad and g == n:
        return M
    vec = M.ndim == 1
    M2 = M[:, None] if vec else M
    vals = M2[:n]
    full = jnp.zeros((d, n, M2.shape[1]), M2.dtype)
    if g:
        idx = jnp.asarray(np.asarray(spec.idx_grad), jnp.int32)
        full = full.at[:, idx].set(M2[n:].reshape(d, g, -1))
    out = jnp.concatenate([vals, full.reshape(d * n, -1)], axis=0)
    return out[:, 0] if vec else out


class IterPieces(NamedTuple):
    """Masked matrix-free building blocks shared by the MLL and predict
    paths.  All vectors are in the full blocked layout (mesh=None) or the
    point-major flattened layout (mesh given); hp enters as a pytree so the
    gradient surrogates can differentiate through the matvec."""
    mv_hp: Callable            # (hp, V (N, m)) -> Keta'(hp) V
    diag_hp: Callable          # hp -> diag(Keta') (N,), 1 on masked rows
    data_vec: jnp.ndarray      # (N,)  zero on masked rows
    vand: jnp.ndarray          # (N, n_beta) zero rows at masked entries
    conv: Callable             # blocked-full -> working layout
    mask: Optional[jnp.ndarray]  # (N,) in the working layout, or None
    n_full: int                # N = n_eval * (1 + dim)


def _iter_setup(cfg: GpConfig, spec: DataSpec, data: GpData,
                eta_const: float, row_block: int, mesh=None) -> IterPieces:
    assert spec.n_pad_eval == 0, \
        "iterative path: disable shape-bucket padding (pad_n_eval_multiple)"
    from . import assembly

    dtype = data.x.dtype
    n, dim = spec.n_eval, spec.dim
    n_full = n * (1 + dim)
    noisy = spec.b_has_noisy_data

    mask_b = make_grad_mask(spec, dtype)

    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        conv = lambda v: sm.blocked_to_pm_mat(v, n, dim)
    else:
        conv = lambda v: v

    def base_diag(hp_):
        """diag(K) in the blocked full layout: value rows 1, gradient rows
        gamma_a^2 (ops/kernels.theta2gamma)."""
        gamma2 = kernels.theta2gamma(cfg.kernel_type, hp_.theta) ** 2
        return jnp.concatenate([jnp.ones(n, dtype),
                                jnp.repeat(gamma2.astype(dtype), n)])

    def extra_diag(hp_):
        """Diagonal ADD on top of K: noise/varK plus eta * P^2 (P = I under
        'base'; P^2 = diag(K + noise/varK) under 'precon' -- the
        preconditioner-factorization trick as a diagonal shift,
        assembly.py / Kernel.py:140).  Differentiable in hp_."""
        if noisy:
            nv = expand_to_full(
                spec, assembly.calc_noise_vec(spec, data, hp_).astype(dtype)
                / hp_.varK)
        else:
            nv = jnp.zeros(n_full, dtype)
        if cfg.wellcond_mtd == "precon":
            return nv + eta_const * (base_diag(hp_) + nv)
        return nv + eta_const

    mask = None if mask_b is None else conv(mask_b)

    def mv_hp(hp_, V):
        extra = conv(extra_diag(hp_))
        Vm = V if mask is None else mask[:, None] * V
        if mesh is not None:
            from ..parallel import sharded_matvec as sm
            out = sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, hp_.theta, hp_.kernel, Vm,
                eta=1.0, pvec2_pm=extra)
        else:
            out = iterative.kern_matvec(
                cfg.kernel_type, data.x, hp_.theta, hp_.kernel, Vm,
                row_block=row_block, noise_over_varK=extra, eta=0.0)
        if mask is not None:
            out = mask[:, None] * out + (1.0 - mask)[:, None] * V
        return out

    def diag_hp(hp_):
        d = base_diag(hp_) + extra_diag(hp_)
        if mask_b is not None:
            d = jnp.where(mask_b > 0, d, jnp.ones_like(d))
        return conv(d)

    data_vec = conv(expand_to_full(spec, likelihood.make_data_vec(spec, data)))
    vand = conv(expand_to_full(
        spec, mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad,
                                 spec.idx_grad_arr)))

    return IterPieces(mv_hp=mv_hp, diag_hp=diag_hp, data_vec=data_vec,
                       vand=vand, conv=conv, mask=mask, n_full=n_full)


def _solver(pieces: IterPieces, hp: Hypers, max_cg_iters: int, cg_tol: float):
    """CG solve closure on the symmetrically scaled system at fixed hp."""
    diag = pieces.diag_hp(hp)
    d_isqrt = 1.0 / jnp.sqrt(diag)

    def mv_hat(V):
        return d_isqrt[:, None] * pieces.mv_hp(hp, d_isqrt[:, None] * V)

    def solve(B):
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(mv_hat, Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X, res

    return solve, diag


def _gls(pieces: IterPieces, solve, beta_known=None):
    """GLS beta + residual solve in one batched CG: returns
    (beta, r, alpha = Keta'^-1 r, res)."""
    data_vec, vand = pieces.data_vec, pieces.vand
    if beta_known is not None:
        r = data_vec - vand @ beta_known
        sols, res = solve(r[:, None])
        return beta_known, r, sols[:, 0], res
    rhs = jnp.concatenate([data_vec[:, None], vand], axis=1)
    sols, res = solve(rhs)
    invK_y = sols[:, 0]
    invK_V = sols[:, 1:]
    A = vand.T @ invK_V
    beta = mean._spd_solve(A, invK_V.T @ data_vec)
    r = data_vec - vand @ beta
    alpha = invK_y - invK_V @ beta
    return beta, r, alpha, res


class IterLkdInfo(NamedTuple):
    ln_lkd: jnp.ndarray
    beta: jnp.ndarray
    varK: jnp.ndarray
    ln_det: jnp.ndarray
    cg_resid: jnp.ndarray
    cg_iters: jnp.ndarray


def calc_lkd_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                       hp: Hypers, eta_const: float, key: jax.Array,
                       n_probes: int = 16, max_cg_iters: int = 256,
                       cg_tol: float = 1e-10, row_block: int = 256,
                       mesh=None):
    """Noise-free MLL via CG + SLQ.  Returns IterLkdInfo.

    Full, partial (spec.idx_grad), or no gradients; 'precon' or 'base'
    conditioning with constant eta.  With ``mesh`` (a 1-axis jax Mesh) the
    matvec shards the point axis over the devices
    (parallel/sharded_matvec.kern_matvec_sharded_batch); mesh.size must
    divide n_eval.  The MLL value is layout-invariant up to float reduction
    order (every term is a dot product through the permutation-consistent
    matvec)."""
    assert not spec.b_has_noisy_data, "use calc_lkd_iterative_noisy"
    n_data = spec.n_data
    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, diag = _solver(pieces, hp, max_cg_iters, cg_tol)
    beta, r, alpha, res = _gls(pieces, solve)

    varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / n_data)

    key_z, = jax.random.split(key, 1)
    ln_det, slq_res = iterative.slq_logdet(
        lambda V: pieces.mv_hp(hp, V), pieces.n_full, key_z,
        n_probes=n_probes, max_iters=max_cg_iters, scale_diag=diag,
        dtype=data.x.dtype)

    ln_lkd = -(n_data * jnp.log(varK) + ln_det) / 2.0
    return IterLkdInfo(ln_lkd=ln_lkd, beta=beta, varK=varK, ln_det=ln_det,
                       cg_resid=jnp.max(res.residnorm), cg_iters=res.n_iter)


def neg_mll_iterative_and_grad(cfg: GpConfig, spec: DataSpec, data: GpData,
                               hp: Hypers, eta_const: float, key: jax.Array,
                               n_probes: int = 16, max_cg_iters: int = 256,
                               cg_tol: float = 1e-10, row_block: int = 256,
                               mesh=None):
    """(-ln L, d(-ln L)/d theta, IterLkdInfo) with determinant-free
    gradients: the quadratic-form surrogates are differentiated by autodiff
    through the matrix-free matvec (alpha, u_i, z_i constant)."""
    assert not spec.b_has_noisy_data
    dtype = data.x.dtype
    n_data = spec.n_data

    info = calc_lkd_iterative(cfg, spec, data, hp, eta_const, key,
                              n_probes=n_probes, max_cg_iters=max_cg_iters,
                              cg_tol=cg_tol, row_block=row_block, mesh=mesh)

    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)

    r = pieces.data_vec - pieces.vand @ info.beta
    alpha = jax.lax.stop_gradient(solve(r[:, None])[0][:, 0])

    key_z, = jax.random.split(key, 1)
    z = jax.random.rademacher(key_z, (pieces.n_full, n_probes), dtype=dtype)
    u = jax.lax.stop_gradient(solve(z)[0])

    def surrogate(theta_):
        hp_ = hp._replace(theta=theta_)
        # d/dtheta [alpha^T K(theta) alpha] = alpha^T dK alpha
        quad_alpha = jnp.dot(alpha, pieces.mv_hp(hp_, alpha[:, None])[:, 0])
        # d/dtheta [mean_i u_i^T K(theta) z_i] ~= tr(K^-1 dK); the masked
        # identity block is theta-independent and drops out of the grad
        trace_term = jnp.mean(jnp.sum(u * pieces.mv_hp(hp_, z), axis=0))
        # d(-lnL)/dtheta = 1/2 [ n * dvarK/varK + dlogdet ]
        return 0.5 * (-quad_alpha / info.varK + trace_term)

    grad_theta = jax.grad(surrogate)(hp.theta)
    return -info.ln_lkd, grad_theta, info


# ---------------------------------------------------------------------------
# Noisy regime (varK and the noise variances as numeric hyperparameters)
# ---------------------------------------------------------------------------

def calc_lkd_iterative_noisy(cfg: GpConfig, spec: DataSpec, data: GpData,
                             hp: Hypers, eta_const: float, key: jax.Array,
                             n_probes: int = 16, max_cg_iters: int = 256,
                             cg_tol: float = 1e-10, row_block: int = 256,
                             mesh=None):
    """Noisy-regime MLL via CG + SLQ (CalcLkd.calc_lkd_all_w_noise,
    CalcLkd.py:185-266, as a matrix-free estimate):
    -2 ln L = n ln varK + ln det Keta + r^T Keta^-1 r / varK."""
    assert spec.b_has_noisy_data
    n_data = spec.n_data
    varK = hp.varK

    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, diag = _solver(pieces, hp, max_cg_iters, cg_tol)
    beta, r, alpha, res = _gls(pieces, solve)

    quad = jnp.dot(r, alpha) / varK
    key_z, = jax.random.split(key, 1)
    ln_det, _ = iterative.slq_logdet(
        lambda V: pieces.mv_hp(hp, V), pieces.n_full, key_z,
        n_probes=n_probes, max_iters=max_cg_iters, scale_diag=diag,
        dtype=data.x.dtype)
    ln_det_Kcov = n_data * jnp.log(varK) + ln_det
    ln_lkd = -(ln_det_Kcov + quad) / 2.0
    return IterLkdInfo(ln_lkd=ln_lkd, beta=beta, varK=varK,
                       ln_det=ln_det_Kcov, cg_resid=jnp.max(res.residnorm),
                       cg_iters=res.n_iter)


def neg_mll_iterative_noisy_and_grad(cfg: GpConfig, spec: DataSpec,
                                     data: GpData, hp: Hypers,
                                     eta_const: float, key: jax.Array,
                                     n_probes: int = 16,
                                     max_cg_iters: int = 256,
                                     cg_tol: float = 1e-10,
                                     row_block: int = 256, mesh=None):
    """(-ln L, gradient pytree over the numeric hyperparameters, info) for
    the noisy regime, determinant-free:

      d(-lnL)/dhp = 1/2 [ n dln varK + tr(Keta^-1 dKeta)
                          + d( r^T Keta^-1 r / varK ) ],

    with tr(Keta^-1 dKeta) ~= mean_i u_i^T dKeta z_i (u = Keta^-1 z,
    Hutchinson) and the quadratic term via the EXACT surrogate
    (2 a^T r - a^T Keta(hp) a)/varK(hp) at a = stop_grad(Keta^-1 r) --
    its hp-derivative equals the true one at the solve point.  beta is the
    GLS maximizer so its sensitivity vanishes (envelope theorem)."""
    assert spec.b_has_noisy_data
    dtype = data.x.dtype
    n_data = spec.n_data

    info = calc_lkd_iterative_noisy(cfg, spec, data, hp, eta_const, key,
                                    n_probes=n_probes,
                                    max_cg_iters=max_cg_iters, cg_tol=cg_tol,
                                    row_block=row_block, mesh=mesh)

    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)

    r = pieces.data_vec - pieces.vand @ info.beta
    a = jax.lax.stop_gradient(solve(r[:, None])[0][:, 0])
    ar = jnp.dot(a, r)

    key_z, = jax.random.split(key, 1)
    z = jax.random.rademacher(key_z, (pieces.n_full, n_probes), dtype=dtype)
    u = jax.lax.stop_gradient(solve(z)[0])

    hp_flat, hp_tree = jax.tree_util.tree_flatten(hp)

    def surrogate(hp_leaves):
        hp_ = jax.tree_util.tree_unflatten(hp_tree, hp_leaves)
        trace_term = jnp.mean(jnp.sum(u * pieces.mv_hp(hp_, z), axis=0))
        quad_surr = (2.0 * ar - jnp.dot(a, pieces.mv_hp(hp_, a[:, None])[:, 0])) \
            / hp_.varK
        return 0.5 * (n_data * jnp.log(hp_.varK) + trace_term + quad_surr)

    grads = jax.grad(surrogate)(hp_flat)
    grad_hp = jax.tree_util.tree_unflatten(hp_tree, grads)
    return -info.ln_lkd, grad_hp, info


# ---------------------------------------------------------------------------
# Closed-form beta/varK through CG (facade hook, no SLQ)
# ---------------------------------------------------------------------------

def closed_form_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                          hp: Hypers, eta_const: float,
                          max_cg_iters: int = 256, cg_tol: float = 1e-10,
                          row_block: int = 256, mesh=None) -> Hypers:
    """Fill in beta (and varK in the noise-free regime) with their GLS/
    profiled maximizers via batched CG -- the matrix-free analog of
    likelihood.closed_form_hp (GpHparaOptz.py:220-230)."""
    pieces = _iter_setup(cfg, spec, data, eta_const, row_block, mesh)
    solve, _ = _solver(pieces, hp, max_cg_iters, cg_tol)
    beta, r, alpha, _ = _gls(pieces, solve)
    if spec.b_has_noisy_data:
        varK = hp.varK
    else:
        varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / spec.n_data)
    return hp._replace(beta=beta, varK=varK)
