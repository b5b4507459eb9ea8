"""Scipy SLSQP parity driver for hyperparameter fitting.

Exact behavioral mirror of the reference optimizer
(/root/reference/gpgradpy/src/optz/OptzLkd.py:185-333): sequential scipy
SLSQP per start, the nonlinear condition-number constraint for non-precon
conditioning methods (GaussianProcess.py:211), the Cholesky-failure
cond-as-objective fallback (OptzLkd.py:74-77), and best-feasible selection.
Heavy numerics (MLL value+grad, condition number value+grad) run as jitted
XLA programs; scipy only drives the outer iteration, so this path trades the
vmapped-L-BFGS throughput of fit/multistart.py for constraint support.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, NonlinearConstraint, minimize

from ..config import GpConfig
from ..model import assembly, likelihood
from ..types import DataSpec, GpData, HpInfo, hp_vec_to_hypers
from .multistart import (FitResult, HpBounds, _jit_batch_nll, get_hp_bounds,
                         select_hp_x0)


@lru_cache(maxsize=256)
def _jit_callbacks(cfg: GpConfig, spec: DataSpec, info: HpInfo):
    """Jitted (value, grad, ok) of the MLL and (cond, cond_grad) at one hp
    vector.  Cached at module level on the hashable static config so repeated
    fits (one per BO iteration) reuse the compiled programs; data/eta are
    traced arguments."""

    @jax.jit
    def lkd_val_grad(v, data, eta_const):
        def f(v):
            hp = hp_vec_to_hypers(info, v)
            lkd = likelihood.calc_lkd(cfg, spec, data, hp, eta_const)
            return lkd.ln_lkd, lkd.ok
        (val, ok), g = jax.value_and_grad(f, has_aux=True)(v)
        return val, g, ok

    @jax.jit
    def cond_val_grad(v, data, eta_const):
        def c(v):
            hp = hp_vec_to_hypers(info, v)
            ops = assembly.assemble_keta(
                cfg, spec, data, hp, eta_const,
                varK=hp.varK if spec.b_has_noisy_data else None)
            return assembly.calc_cond(ops, cfg.cond_norm)
        return jax.value_and_grad(c)(v)

    return lkd_val_grad, cond_val_grad


def _make_callbacks(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                    eta_const: float):
    """Memoized scipy callbacks bound to one (data, eta) instance, backed by
    the module-cached jitted programs (reference failure semantics: on
    Cholesky failure the condition number becomes the objective)."""
    _lkd_val_grad, _cond_val_grad = _jit_callbacks(cfg, spec, info)

    def lkd_val_grad(v):
        return _lkd_val_grad(v, data, eta_const)

    def cond_val_grad(v):
        return _cond_val_grad(v, data, eta_const)

    class Memo:
        """calc_store_likelihood memoization (OptzLkd.py:16-86): scipy calls
        f and grad at the same x; evaluate once."""
        last_x = None
        val = grad = cond = cond_grad = None
        n_cho_fail = 0

        def eval(self, x, need_cond):
            x = np.atleast_1d(np.asarray(x, float)).ravel()
            if self.last_x is not None and np.array_equal(x, self.last_x):
                return
            self.last_x = x.copy()
            val, g, ok = lkd_val_grad(jnp.asarray(x))
            if need_cond or not bool(ok):
                cond, cond_g = cond_val_grad(jnp.asarray(x))
                self.cond = float(cond)
                self.cond_grad = np.asarray(cond_g)
                # cond beyond cond_max_abs: treat as infeasible regardless of
                # whether the factorization numerically succeeded
                # (Kernel.py:282-283)
                if self.cond > cfg.cond_max_abs:
                    ok = False
            if bool(ok) and np.isfinite(float(val)):
                self.val = float(val)
                self.grad = np.asarray(g)
            else:
                # Cholesky failed: minimize the condition number instead
                self.n_cho_fail += 1
                if not need_cond and self.cond is None:
                    cond, cond_g = cond_val_grad(jnp.asarray(x))
                    self.cond = float(cond)
                    self.cond_grad = np.asarray(cond_g)
                self.val = -self.cond
                self.grad = -self.cond_grad

    return Memo()


def _select_x0_w_prev(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                      data: GpData, eta_const: float, bounds: HpBounds,
                      seed: int, hp_prev):
    """Start selection with the previous round's optimized hp joined to the
    candidate pool.

    The reference's 'hp_best' policy starts SLSQP from the best-MLL point
    among lkd_hp_best_n_eval LHS samples (GpHparaX0.py:33-59).  Inside a BO
    loop the dataset grows by one point per round, so the previous round's
    converged hp is an excellent candidate: including it in the argmax pool
    preserves the policy's basin-escape behavior (an LHS sample that beats
    the converged hp still wins) while typically halving the SLSQP iteration
    count.  In 'lhs' multistart mode it is appended as one extra start."""
    if hp_prev is None:
        return select_hp_x0(cfg, spec, info, data, eta_const, bounds, seed)
    hp_prev = np.clip(np.asarray(hp_prev, float).ravel(),
                      bounds.box_lb, bounds.box_ub)
    if cfg.lkd_optz_start_mtd == "lhs":
        from . import lhs as _lhs
        x0 = _lhs.lhs_sample(cfg.optz_n_x0, bounds.lhs_lb, bounds.lhs_ub,
                             seed)
        return np.vstack([x0, hp_prev[None, :]])
    from . import lhs as _lhs
    n0 = cfg.lkd_hp_best_n_eval
    x0 = np.vstack([_lhs.lhs_sample(n0, bounds.lhs_lb, bounds.lhs_ub, seed),
                    hp_prev[None, :]])
    vals = _jit_batch_nll(cfg, spec, info)(jnp.asarray(x0), data, eta_const)
    vals = np.array(vals, copy=True)
    vals[~np.isfinite(vals)] = np.inf
    return x0[int(np.argmin(vals))][None, :]


def fit_map_scipy(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                  eta_const: float, history=None, i_optz: int = 0,
                  seed: int = 1, x0_override=None,
                  hp_prev=None) -> FitResult:
    bounds = get_hp_bounds(cfg, info, history, i_optz)
    if x0_override is not None:
        # warm start from the rescale fixed-point loop (OptzLkd.py:165-168)
        x0_all = np.atleast_2d(np.asarray(x0_override, float))
    else:
        x0_all = np.asarray(_select_x0_w_prev(cfg, spec, info, data,
                                              eta_const, bounds, seed,
                                              hp_prev))
    memo = _make_callbacks(cfg, spec, info, data, eta_const)
    use_cstr = cfg.b_use_cond_cstr

    def f_obj(x):
        memo.eval(x, use_cstr)
        return -memo.val

    def f_grad(x):
        memo.eval(x, use_cstr)
        return -memo.grad

    def f_cond(x):
        memo.eval(x, True)
        return memo.cond

    def f_cond_grad(x):
        memo.eval(x, True)
        return memo.cond_grad

    constraints = []
    if use_cstr:
        constraints = [NonlinearConstraint(f_cond, -np.inf, cfg.cond_max,
                                           jac=f_cond_grad)]

    # optimizer dispatch (OptzLkd.py:211-222): SLSQP is the reference
    # default; trust-constr takes its own option set
    if cfg.optz_mtd == "trust-constr":
        method = "trust-constr"
        opt = {"initial_tr_radius": 0.1, "xtol": cfg.optz_tol_x,
               "gtol": cfg.optz_tol_obj, "maxiter": cfg.optz_iter_max,
               "disp": False}
    else:
        method = "SLSQP"
        opt = {"ftol": cfg.optz_tol_obj, "eps": cfg.optz_tol_x,
               "maxiter": cfg.optz_iter_max, "disp": False}
    box = Bounds(bounds.box_lb, bounds.box_ub, keep_feasible=True)

    n_optz = x0_all.shape[0]
    sols = np.full((n_optz, info.n_hp), np.nan)
    objs = np.full(n_optz, np.nan)
    conds = np.full(n_optz, np.nan)
    success = np.zeros(n_optz, bool)
    iters = np.zeros(n_optz)
    con_good = np.zeros(n_optz, bool)

    for i in range(n_optz):
        memo.last_x = None
        res = minimize(f_obj, x0_all[i], method=method, jac=f_grad,
                       bounds=box, constraints=constraints, options=opt)
        sols[i] = res.x
        objs[i] = res.fun
        success[i] = res.success
        iters[i] = res.nit
        if use_cstr:
            conds[i] = f_cond(res.x)
            con_good[i] = conds[i] < 1.01 * cfg.cond_max
        else:
            con_good[i] = True

    if con_good.any():
        pool = np.where(con_good)[0]
    else:
        pool = np.arange(n_optz)
    best = pool[np.nanargmin(objs[pool])]
    best_hp = jnp.asarray(sols[best])

    from .multistart import _jit_lkd_cond
    lkd = _jit_lkd_cond(cfg, spec, info)(best_hp, data, eta_const)
    tele = {
        "hp_optz_success": float(success.mean()),
        "hp_optz_iter_mean": float(iters.mean()),
        "hp_optz_iter_max": float(iters.max()),
        "hp_optz_con_good": float(con_good.mean()),
        "optz_n_cho_fail": int(memo.n_cho_fail),
        "optz_n_cond2big": int(np.sum(conds > cfg.cond_max)) if use_cstr else 0,
        "optz_max_init_cond": float("nan"),
    }
    return FitResult(hp_vec=best_hp, neg_lkd=jnp.asarray(objs[best]),
                     cond=lkd.cond, info=tele)
