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

Both regimes: noise-free (varK/beta profiled out) and noisy (varK and the
noise variances as numeric hyperparameters, calc_lkd_iterative_noisy).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import GpConfig
from ..ops import iterative, kernels, rtensor
from ..types import DataSpec, GpData, Hypers
from . import likelihood, mean


def _pm_base_diag(cfg: GpConfig, n: int, theta, dtype) -> jnp.ndarray:
    """Point-major flattened diagonal of K (per point: [1, gamma_1^2, ...,
    gamma_d^2]) -- the P^2 vector of the precon method in the distributed
    layout (parallel/sharded_matvec.py)."""
    gamma2 = kernels.theta2gamma(cfg.kernel_type, theta) ** 2
    per_pt = jnp.concatenate([jnp.ones(1, dtype), gamma2.astype(dtype)])
    return jnp.tile(per_pt, n)


class IterLkdInfo(NamedTuple):
    ln_lkd: jnp.ndarray
    beta: jnp.ndarray
    varK: jnp.ndarray
    ln_det: jnp.ndarray
    cg_resid: jnp.ndarray
    cg_iters: jnp.ndarray


def _keta_diag(cfg: GpConfig, spec: DataSpec, hp: Hypers, eta, noise,
               dtype):
    """Closed-form diagonal of Keta for the full-gradient square case:
    value entries 1, gradient entries gamma_a^2 (= -2 phi'(0) theta_a),
    plus noise and the eta * P^2 term."""
    n = spec.n_eval
    gamma2 = kernels.theta2gamma(cfg.kernel_type, hp.theta) ** 2
    base = jnp.concatenate([jnp.ones(n, dtype),
                            jnp.repeat(gamma2.astype(dtype), n)])
    d = base + noise
    return d + eta * d  # precon: P^2 = diag(K + noise); eta * P^2 on top


def calc_lkd_iterative(cfg: GpConfig, spec: DataSpec, data: GpData,
                       hp: Hypers, eta_const: float, key: jax.Array,
                       n_probes: int = 16, max_cg_iters: int = 256,
                       cg_tol: float = 1e-10, row_block: int = 256,
                       mesh=None):
    """Noise-free MLL via CG + SLQ.  Returns IterLkdInfo.

    Restrictions (current): use_grad with ALL gradients, no data rescaling,
    'precon' or 'base' conditioning with constant eta.

    With ``mesh`` (a 1-axis jax Mesh) the matvec shards the point axis over
    the devices (parallel/sharded_matvec.kern_matvec_sharded_batch) and all
    vectors live in the point-major layout; the mesh size must divide
    n_eval.  The MLL value is bitwise layout-invariant up to float reduction
    order (every term is a dot product through the permuted-consistent
    matvec).
    """
    assert not spec.b_has_noisy_data, "iterative path: noise-free regime only"
    assert spec.idx_grad_arr is None and spec.n_pad_eval == 0
    dtype = data.x.dtype
    n_data = spec.n_data
    theta = hp.theta
    eta = eta_const

    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        base = _pm_base_diag(cfg, spec.n_eval, theta, dtype)
        if cfg.wellcond_mtd == "precon":
            diag = base * (1.0 + eta_const)
            pvec2_pm = base
        else:
            diag = base + eta_const
            pvec2_pm = None

        def mv(theta_, V):
            return sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, theta_, hp.kernel, V,
                eta=eta, pvec2_pm=pvec2_pm)

        data_vec = sm.blocked_to_pm_mat(
            likelihood.make_data_vec(spec, data), spec.n_eval, spec.dim)
        vand = sm.blocked_to_pm_mat(
            mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad),
            spec.n_eval, spec.dim)
    else:
        noise = jnp.zeros(n_data, dtype)
        if cfg.wellcond_mtd == "precon":
            diag = _keta_diag(cfg, spec, hp, eta_const, noise, dtype)
            pvec2 = diag / (1.0 + eta_const)  # P^2 = diag(K+noise)
            pvec = jnp.sqrt(pvec2)
        else:
            gamma2 = kernels.theta2gamma(cfg.kernel_type, theta) ** 2
            diag = (jnp.concatenate([jnp.ones(spec.n_eval, dtype),
                                     jnp.repeat(gamma2.astype(dtype),
                                                spec.n_eval)])
                    + eta_const)
            pvec = None

        def mv(theta_, V):
            return iterative.kern_matvec(cfg.kernel_type, data.x, theta_,
                                         hp.kernel, V, row_block=row_block,
                                         eta=eta, pvec=pvec)

        data_vec = likelihood.make_data_vec(spec, data)
        vand = mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad)
    d_isqrt = 1.0 / jnp.sqrt(diag)

    def mv_hat(V):
        return d_isqrt[:, None] * mv(theta, d_isqrt[:, None] * V)

    def solve(B):
        """Keta^-1 B via CG on the scaled system."""
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(mv_hat, Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X, res

    # GLS beta and residual solve in one batched CG
    nb = vand.shape[1]
    rhs = jnp.concatenate([data_vec[:, None], vand], axis=1)
    sols, res = solve(rhs)
    invK_y = sols[:, 0]
    invK_V = sols[:, 1:]
    A = vand.T @ invK_V
    beta = mean._spd_solve(A, invK_V.T @ data_vec)
    r = data_vec - vand @ beta
    alpha = invK_y - invK_V @ beta          # Keta^-1 r

    varK = jnp.maximum(cfg.varK_min, jnp.dot(r, alpha) / n_data)

    # SLQ logdet + Hutchinson probes (reuse the probe solves for the grad)
    key_z, = jax.random.split(key, 1)
    ln_det, slq_res = iterative.slq_logdet(
        lambda V: mv(theta, V), n_data, key_z, n_probes=n_probes,
        max_iters=max_cg_iters, scale_diag=diag, dtype=dtype)

    ln_lkd = -(n_data * jnp.log(varK) + ln_det) / 2.0
    return IterLkdInfo(ln_lkd=ln_lkd, beta=beta, varK=varK, ln_det=ln_det,
                       cg_resid=jnp.max(res.residnorm),
                       cg_iters=res.n_iter)


def neg_mll_iterative_and_grad(cfg: GpConfig, spec: DataSpec, data: GpData,
                               hp: Hypers, eta_const: float, key: jax.Array,
                               n_probes: int = 16, max_cg_iters: int = 256,
                               cg_tol: float = 1e-10, row_block: int = 256,
                               mesh=None):
    """(-ln L, d(-ln L)/d theta) with determinant-free gradients.

    The value comes from calc_lkd_iterative; the theta-gradient differentiates
    the quadratic-form surrogates through the matrix-free matvec.  ``mesh``
    shards the matvecs over the point axis as in calc_lkd_iterative.
    """
    assert not spec.b_has_noisy_data
    dtype = data.x.dtype
    n_data = spec.n_data
    theta = hp.theta

    info = calc_lkd_iterative(cfg, spec, data, hp, eta_const, key,
                              n_probes=n_probes, max_cg_iters=max_cg_iters,
                              cg_tol=cg_tol, row_block=row_block, mesh=mesh)

    # recompute the solves needed for the gradient (constants under autodiff)
    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        base = _pm_base_diag(cfg, spec.n_eval, theta, dtype)
        diag = (base * (1.0 + eta_const) if cfg.wellcond_mtd == "precon"
                else base + eta_const)

        def mv_theta(theta_, V):
            # eta * P(theta)^2 depends on theta under 'precon'; that
            # dependence is part of dKeta/dtheta and flows through autodiff
            p2 = (_pm_base_diag(cfg, spec.n_eval, theta_, dtype)
                  if cfg.wellcond_mtd == "precon" else None)
            return sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, theta_, hp.kernel, V,
                eta=eta_const, pvec2_pm=p2)
    else:
        noise = jnp.zeros(n_data, dtype)
        if cfg.wellcond_mtd == "precon":
            diag = _keta_diag(cfg, spec, hp, eta_const, noise, dtype)
        else:
            gamma2 = kernels.theta2gamma(cfg.kernel_type, theta) ** 2
            diag = (jnp.concatenate([jnp.ones(spec.n_eval, dtype),
                                     jnp.repeat(gamma2.astype(dtype),
                                                spec.n_eval)]) + eta_const)

        def mv_theta(theta_, V):
            # NOTE: eta * P(theta)^2 depends on theta under 'precon'; that
            # dependence is part of dKeta/dtheta and flows through autodiff
            if cfg.wellcond_mtd == "precon":
                g2 = kernels.theta2gamma(cfg.kernel_type, theta_) ** 2
                p2 = jnp.concatenate([jnp.ones(spec.n_eval, dtype),
                                      jnp.repeat(g2.astype(dtype),
                                                 spec.n_eval)])
                pv = jnp.sqrt(p2)
            else:
                pv = None
            return iterative.kern_matvec(cfg.kernel_type, data.x, theta_,
                                         hp.kernel, V, row_block=row_block,
                                         eta=eta_const, pvec=pv)

    d_isqrt = 1.0 / jnp.sqrt(diag)

    def mv_hat(V):
        return d_isqrt[:, None] * mv_theta(theta, d_isqrt[:, None] * V)

    def solve(B):
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(mv_hat, Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X

    data_vec = likelihood.make_data_vec(spec, data)
    vand = mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad)
    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        data_vec = sm.blocked_to_pm_mat(data_vec, spec.n_eval, spec.dim)
        vand = sm.blocked_to_pm_mat(vand, spec.n_eval, spec.dim)
    r = data_vec - vand @ info.beta
    alpha = jax.lax.stop_gradient(solve(r[:, None])[:, 0])

    key_z, = jax.random.split(key, 1)
    z = jax.random.rademacher(key_z, (n_data, n_probes), dtype=dtype)
    u = jax.lax.stop_gradient(solve(z))

    def surrogate(theta_):
        # d/dtheta [alpha^T K(theta) alpha] = alpha^T dK alpha
        quad_alpha = jnp.dot(alpha, mv_theta(theta_, alpha[:, None])[:, 0])
        # d/dtheta [mean_i u_i^T K(theta) z_i] ~= tr(K^-1 dK)
        trace_term = jnp.mean(jnp.sum(u * mv_theta(theta_, z), axis=0))
        # d(-lnL)/dtheta = 1/2 [ n * dvarK/varK + dlogdet ]
        #                = 1/2 [ -quad_alpha' / varK + trace_term' ]
        return 0.5 * (-quad_alpha / info.varK + trace_term)

    grad_theta = jax.grad(surrogate)(theta)
    return -info.ln_lkd, grad_theta, info


# ---------------------------------------------------------------------------
# Noisy regime (varK and the noise variances as numeric hyperparameters)
# ---------------------------------------------------------------------------

def _blocked_base_diag(cfg: GpConfig, spec: DataSpec, theta, dtype):
    """diag(K) in the blocked layout: value entries 1, gradient entries
    gamma_a^2 (ops/kernels theta2gamma)."""
    gamma2 = kernels.theta2gamma(cfg.kernel_type, theta) ** 2
    return jnp.concatenate([jnp.ones(spec.n_eval, dtype),
                            jnp.repeat(gamma2.astype(dtype), spec.n_eval)])


def _noisy_pieces(cfg: GpConfig, spec: DataSpec, data: GpData, hp: Hypers,
                  eta_const: float, dtype, mesh=None):
    """(extra_diag, diag, layout converter) for the noisy regime:
    Keta = K + diag(noise)/varK + eta * P^2, P^2 = diag(K + noise/varK)
    ('precon'; P = I under 'base').  extra_diag is the total diagonal ADD on
    top of K; diag is diag(Keta) for the symmetric CG scaling.  All pieces
    are differentiable in (theta, varK, var_fval, var_fgrad)."""
    from . import assembly

    base = _blocked_base_diag(cfg, spec, hp.theta, dtype)
    noise = assembly.calc_noise_vec(spec, data, hp).astype(dtype)
    nv = noise / hp.varK
    if cfg.wellcond_mtd == "precon":
        p2 = base + nv
        extra = nv + eta_const * p2
    else:
        extra = nv + eta_const
    diag = base + extra
    if mesh is not None:
        from ..parallel import sharded_matvec as sm
        conv = lambda v: sm.blocked_to_pm_mat(v, spec.n_eval, spec.dim)
        return conv(extra), conv(diag), conv
    return extra, diag, (lambda v: v)


def calc_lkd_iterative_noisy(cfg: GpConfig, spec: DataSpec, data: GpData,
                             hp: Hypers, eta_const: float, key: jax.Array,
                             n_probes: int = 16, max_cg_iters: int = 256,
                             cg_tol: float = 1e-10, row_block: int = 256,
                             mesh=None):
    """Noisy-regime MLL via CG + SLQ (CalcLkd.calc_lkd_all_w_noise,
    CalcLkd.py:185-266, as a matrix-free estimate):
    -2 ln L = n ln varK + ln det Keta + r^T Keta^-1 r / varK.
    Same restrictions as calc_lkd_iterative otherwise; ``mesh`` shards the
    point axis."""
    assert spec.b_has_noisy_data
    assert spec.idx_grad_arr is None and spec.n_pad_eval == 0
    dtype = data.x.dtype
    n_data = spec.n_data
    varK = hp.varK

    extra, diag, conv = _noisy_pieces(cfg, spec, data, hp, eta_const, dtype,
                                      mesh)

    if mesh is not None:
        from ..parallel import sharded_matvec as sm

        def mv(V):
            return sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, hp.theta, hp.kernel, V,
                eta=1.0, pvec2_pm=extra)
    else:
        def mv(V):
            return iterative.kern_matvec(cfg.kernel_type, data.x, hp.theta,
                                         hp.kernel, V, row_block=row_block,
                                         noise_over_varK=extra, eta=0.0)

    data_vec = conv(likelihood.make_data_vec(spec, data))
    vand = conv(mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad))
    d_isqrt = 1.0 / jnp.sqrt(diag)

    def solve(B):
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(lambda V: d_isqrt[:, None] * mv(d_isqrt[:, None] * V),
                             Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X, res

    nb = vand.shape[1]
    rhs = jnp.concatenate([data_vec[:, None], vand], axis=1)
    sols, res = solve(rhs)
    invK_y = sols[:, 0]
    invK_V = sols[:, 1:]
    A = vand.T @ invK_V
    beta = mean._spd_solve(A, invK_V.T @ data_vec)
    r = data_vec - vand @ beta
    alpha = invK_y - invK_V @ beta

    quad = jnp.dot(r, alpha) / varK
    key_z, = jax.random.split(key, 1)
    ln_det, _ = iterative.slq_logdet(mv, n_data, key_z, n_probes=n_probes,
                                     max_iters=max_cg_iters, scale_diag=diag,
                                     dtype=dtype)
    ln_det_Kcov = n_data * jnp.log(varK) + ln_det
    ln_lkd = -(ln_det_Kcov + quad) / 2.0
    return IterLkdInfo(ln_lkd=ln_lkd, beta=beta, varK=varK, ln_det=ln_det_Kcov,
                       cg_resid=jnp.max(res.residnorm), cg_iters=res.n_iter)


def neg_mll_iterative_noisy_and_grad(cfg: GpConfig, spec: DataSpec,
                                     data: GpData, hp: Hypers,
                                     eta_const: float, key: jax.Array,
                                     n_probes: int = 16,
                                     max_cg_iters: int = 256,
                                     cg_tol: float = 1e-10,
                                     row_block: int = 256, mesh=None):
    """(-ln L, gradient pytree over the numeric hyperparameters) for the
    noisy regime, determinant-free:

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

    def mv_hp(hp_, V):
        extra_, _, _ = _noisy_pieces(cfg, spec, data, hp_, eta_const, dtype,
                                     mesh)
        if mesh is not None:
            from ..parallel import sharded_matvec as sm
            return sm.kern_matvec_sharded_batch(
                cfg.kernel_type, mesh, data.x, hp_.theta, hp_.kernel, V,
                eta=1.0, pvec2_pm=extra_)
        return iterative.kern_matvec(cfg.kernel_type, data.x, hp_.theta,
                                     hp_.kernel, V, row_block=row_block,
                                     noise_over_varK=extra_, eta=0.0)

    _, diag, conv = _noisy_pieces(cfg, spec, data, hp, eta_const, dtype, mesh)
    d_isqrt = 1.0 / jnp.sqrt(diag)

    def solve(B):
        Bh = d_isqrt[:, None] * B
        res = iterative.mbcg(
            lambda V: d_isqrt[:, None] * mv_hp(hp, d_isqrt[:, None] * V),
            Bh, max_iters=max_cg_iters, tol=cg_tol)
        return d_isqrt[:, None] * res.X

    data_vec = conv(likelihood.make_data_vec(spec, data))
    vand = conv(mean.calc_aug_vand(cfg.mean_fun_type, data.x, spec.use_grad))
    r = data_vec - vand @ info.beta
    a = jax.lax.stop_gradient(solve(r[:, None])[:, 0])
    ar = jnp.dot(a, r)

    key_z, = jax.random.split(key, 1)
    z = jax.random.rademacher(key_z, (n_data, n_probes), dtype=dtype)
    u = jax.lax.stop_gradient(solve(z))

    hp_flat, hp_tree = jax.tree_util.tree_flatten(hp)

    def surrogate(hp_leaves):
        hp_ = jax.tree_util.tree_unflatten(hp_tree, hp_leaves)
        trace_term = jnp.mean(jnp.sum(u * mv_hp(hp_, z), axis=0))
        quad_surr = (2.0 * ar - jnp.dot(a, mv_hp(hp_, a[:, None])[:, 0])) \
            / hp_.varK
        return 0.5 * (n_data * jnp.log(hp_.varK) + trace_term + quad_surr)

    grads = jax.grad(surrogate)(hp_flat)
    grad_hp = jax.tree_util.tree_unflatten(hp_tree, grads)
    return -info.ln_lkd, grad_hp, info
