"""MAP hyperparameter fitting through the matrix-free CG+SLQ marginal
likelihood (model/likelihood_iter.py) -- the large-n fit driver.

Same contract as fit/multistart.fit_map (bounds -> starts -> box L-BFGS ->
FitResult) but every objective evaluation is a matrix-free MLL estimate:
O(n_data^2) time, O(n_data * row_block) memory, and with ``mesh`` the
matvecs shard the point axis over the devices.  The whole multistart
optimization fuses into ONE jitted XLA program (vmapped L-BFGS over starts,
CG/SLQ while_loops inside), exactly like the dense fast path.

The SLQ probe key is FIXED during the optimization, making the estimated
MLL a deterministic function of the hyperparameters (common practice for
stochastic-trace objectives: the optimizer sees a smooth surrogate whose
optimum is within the probe noise of the true one).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GpConfig
from ..model import likelihood_iter
from ..types import DataSpec, GpData, HpInfo, Hypers, hp_vec_to_hypers
from . import lbfgs, lhs
from .multistart import FitResult, get_hp_bounds


def _grad_hp_to_vec(info: HpInfo, hp: Hypers, ghp: Hypers) -> jnp.ndarray:
    """Chain d(-lnL)/d(hp values) into optimization (log10) space, matching
    the hp_vec layout of types.hp_vec_to_hypers."""
    def parts(h):
        out = [jnp.atleast_1d(h.theta)]
        if info.has_kernel:
            out.append(jnp.atleast_1d(h.kernel))
        if info.has_varK:
            out.append(jnp.atleast_1d(h.varK))
        if info.has_var_fval:
            out.append(jnp.atleast_1d(h.var_fval))
        if info.has_var_fgrad:
            out.append(jnp.atleast_1d(h.var_fgrad))
        return jnp.concatenate(out)

    g = parts(ghp)
    vals = parts(hp)
    bvec = jnp.asarray(info.bvec_log)
    return jnp.where(bvec, g * vals * jnp.log(10.0), g)


@lru_cache(maxsize=64)
def _jit_fit_iterative(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                       max_iter: int, tol_f: float, mesh):
    """Fused multistart L-BFGS through the iterative MLL (one XLA program)."""
    assert not info.has_kernel, \
        "iterative fit: kernel-family hyperparameters (RatQu alpha) are not " \
        "in the determinant-free gradient yet -- use solver='dense'"
    kw = dict(n_probes=cfg.iter_n_probes, max_cg_iters=cfg.iter_max_cg,
              cg_tol=cfg.iter_cg_tol, row_block=cfg.iter_row_block, mesh=mesh)

    def run(x0_all, lb, ub, data, eta, key):
        def obj(v):
            hp = hp_vec_to_hypers(info, v)
            if spec.b_has_noisy_data:
                val, ghp, _ = likelihood_iter.neg_mll_iterative_noisy_and_grad(
                    cfg, spec, data, hp, eta, key, **kw)
                gvec = _grad_hp_to_vec(info, hp, ghp)
            else:
                val, gth, _ = likelihood_iter.neg_mll_iterative_and_grad(
                    cfg, spec, data, hp, eta, key, **kw)
                gvec = _grad_hp_to_vec(info, hp, hp._replace(theta=gth))
            gvec = jnp.where(jnp.isfinite(gvec), gvec, 0.0)
            return val, gvec

        res = lbfgs.lbfgs_box_multistart(obj, x0_all, lb, ub,
                                         max_iter=max_iter, tol_f=tol_f)
        fvals = jnp.where(jnp.isfinite(res.f), res.f, jnp.inf)
        best = jnp.argmin(fvals)
        best_hp = res.x[best]
        # one final estimate at the winner for telemetry (beta/varK/CG stats)
        hp = hp_vec_to_hypers(info, best_hp)
        calc = (likelihood_iter.calc_lkd_iterative_noisy
                if spec.b_has_noisy_data else
                likelihood_iter.calc_lkd_iterative)
        lkd = calc(cfg, spec, data, hp, eta, key, **kw)
        return (best_hp, fvals[best], lkd,
                jnp.mean(res.converged.astype(jnp.float32)),
                jnp.mean(res.n_iter.astype(jnp.float32)), jnp.max(res.n_iter))

    return jax.jit(run)


def fit_map_iterative(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                      data: GpData, eta_const: float, history=None,
                      i_optz: int = 0, seed: int = 1, x0_override=None,
                      mesh=None, **_ignored) -> FitResult:
    """Large-n MAP fit: LHS starts around the median of recent
    hyperparameters (GpHparaX0 policy, shared with the dense driver) ->
    vmapped L-BFGS through the CG/SLQ MLL -> FitResult.

    The condition number is not computed (there is no factorization to
    probe); FitResult.cond is NaN and the history records the CG residual
    via the telemetry dict instead."""
    dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    bounds = get_hp_bounds(cfg, info, history, i_optz)
    if x0_override is not None:
        x0_all = jnp.atleast_2d(jnp.asarray(x0_override, dt))
    else:
        x0_all = jnp.asarray(lhs.lhs_sample(cfg.iter_n_x0, bounds.lhs_lb,
                                            bounds.lhs_ub, seed), dt)
    lb = jnp.asarray(bounds.box_lb, dt)
    ub = jnp.asarray(bounds.box_ub, dt)
    key = jax.random.PRNGKey(seed + 7 * i_optz)

    fused = _jit_fit_iterative(cfg, spec, info, cfg.optz_iter_max,
                               cfg.optz_tol_obj, mesh)
    best_hp, f_best, lkd, conv_mean, it_mean, it_max = fused(
        x0_all, lb, ub, data, eta_const, key)
    f_best, conv_mean, it_mean, it_max, cg_resid, cg_iters = jax.device_get(
        (f_best, conv_mean, it_mean, it_max, lkd.cg_resid, lkd.cg_iters))
    tele = {
        "hp_optz_success": float(conv_mean),
        "hp_optz_iter_mean": float(it_mean),
        "hp_optz_iter_max": float(it_max),
        "hp_optz_con_good": 1.0,
        "optz_n_cho_fail": 0,          # no factorization on this path
        "optz_n_cond2big": 0,
        "optz_max_init_cond": float("nan"),
        "iter_cg_resid": float(cg_resid),
        "iter_cg_iters": int(cg_iters),
    }
    return FitResult(hp_vec=best_hp, neg_lkd=f_best,
                     cond=jnp.asarray(jnp.nan, dt), info=tele)
