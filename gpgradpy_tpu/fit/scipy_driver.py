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
    """Jitted MLL / condition-number programs at one hp vector, split into
    value-only and value+grad variants: scipy calls ``fun`` (line-search
    trial points included) far more often than ``jac``, and the reverse-mode
    gradients cost ~3x the forward value (for the fro cond the pullback
    re-traverses the full-inverse solve), so evaluating gradients lazily --
    only when scipy actually asks for a jacobian -- cuts the d>=10
    cond-constrained fit time ~2-3x.  Cached at module level on the hashable
    static config so repeated fits (one per BO iteration) reuse the compiled
    programs; data/eta are traced arguments."""

    def _lkd(v, data, eta_const):
        hp = hp_vec_to_hypers(info, v)
        lkd = likelihood.calc_lkd(cfg, spec, data, hp, eta_const)
        return lkd.ln_lkd, lkd.ok

    def _cond(v, data, eta_const):
        hp = hp_vec_to_hypers(info, v)
        ops = assembly.assemble_keta(
            cfg, spec, data, hp, eta_const,
            varK=hp.varK if spec.b_has_noisy_data else None)
        return assembly.calc_cond(ops, cfg.cond_norm)

    @jax.jit
    def lkd_val(v, data, eta_const):
        return _lkd(v, data, eta_const)

    @jax.jit
    def lkd_val_grad(v, data, eta_const):
        (val, ok), g = jax.value_and_grad(
            lambda v: _lkd(v, data, eta_const), has_aux=True)(v)
        return val, g, ok

    @jax.jit
    def cond_val(v, data, eta_const):
        return _cond(v, data, eta_const)

    @jax.jit
    def cond_val_grad(v, data, eta_const):
        return jax.value_and_grad(
            lambda v: _cond(v, data, eta_const))(v)

    # fused variants for the constrained path: MLL and cond share the
    # covariance assembly + Cholesky, so evaluating them in ONE program lets
    # XLA CSE the O(n^2 d^2) assembly and O(n^3) factorization instead of
    # paying them twice per iterate (and once more per jacobian pass)
    @jax.jit
    def both_val(v, data, eta_const):
        val, ok = _lkd(v, data, eta_const)
        cond = _cond(v, data, eta_const)
        return val, ok, cond

    @jax.jit
    def both_val_grad(v, data, eta_const):
        (val, ok), g = jax.value_and_grad(
            lambda v: _lkd(v, data, eta_const), has_aux=True)(v)
        cond, cg = jax.value_and_grad(
            lambda v: _cond(v, data, eta_const))(v)
        return val, g, ok, cond, cg

    return (lkd_val, lkd_val_grad, cond_val, cond_val_grad, both_val,
            both_val_grad)


def _make_callbacks(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                    eta_const: float, use_cstr: bool):
    """Memoized LAZY scipy callbacks bound to one (data, eta) instance,
    backed by the module-cached jitted programs (reference failure
    semantics: on Cholesky failure the condition number becomes the
    objective, OptzLkd.py:74-77).

    Laziness: per iterate x, each of {MLL value, MLL grad, cond value,
    cond grad} is computed at most once and ONLY when scipy actually needs
    it.  Line-search trial points get values only; the ~3x-cost gradients
    run once per accepted iterate when scipy requests the jacobians.  The
    cond VALUE is still evaluated at every new x when the constraint is
    active -- the cond_max_abs feasibility rung of the failure ladder
    (Kernel.py:282-283) is part of the objective's definition."""
    (_lkd_val, _lkd_val_grad, _cond_val, _cond_val_grad, _both_val,
     _both_val_grad) = _jit_callbacks(cfg, spec, info)

    class Memo:
        last_x = None
        n_cho_fail = 0
        # program-level eval counters (telemetry: laziness effectiveness)
        n_val = n_grad = n_cond = n_cond_grad = 0

        def _sync(self, x):
            x = np.atleast_1d(np.asarray(x, float)).ravel()
            if self.last_x is not None and np.array_equal(x, self.last_x):
                return
            self.last_x = x.copy()
            self._jx = jnp.asarray(x)
            self._val = self._ok = self._grad = None
            self._cond = self._cond_grad = None
            self._failed = None

        def _ensure_val(self):
            if self._val is None:
                self.n_val += 1
                if use_cstr:
                    # the constrained path always needs cond at this x (the
                    # cond_max_abs feasibility rung + the constraint fun);
                    # the fused program shares the assembly + Cholesky
                    v, ok, c = _both_val(self._jx, data, eta_const)
                    self._cond = float(c)
                    self.n_cond += 1
                else:
                    v, ok = _lkd_val(self._jx, data, eta_const)
                self._val = float(v)
                self._ok = bool(ok)

        def _ensure_grad(self):
            if self._grad is None:
                self.n_grad += 1
                if use_cstr and self._cond_grad is None:
                    # scipy asks the objective and constraint jacobians at
                    # the same accepted iterate: one fused program
                    v, g, ok, c, cg = _both_val_grad(self._jx, data,
                                                     eta_const)
                    self._cond = float(c)
                    self._cond_grad = np.asarray(cg)
                    self.n_cond_grad += 1
                else:
                    v, g, ok = _lkd_val_grad(self._jx, data, eta_const)
                self._val = float(v)
                self._ok = bool(ok)
                self._grad = np.asarray(g)

        def _ensure_cond(self):
            if self._cond is None:
                self.n_cond += 1
                self._cond = float(_cond_val(self._jx, data, eta_const))

        def _ensure_cond_grad(self):
            if self._cond_grad is None:
                self.n_cond_grad += 1
                if use_cstr and self._grad is None and not self._failed:
                    # mirror of _ensure_grad: fetch both jacobians fused
                    # (scipy's constraint jac can be queried first)
                    self._ensure_grad()
                    return
                c, cg = _cond_val_grad(self._jx, data, eta_const)
                self._cond = float(c)
                self._cond_grad = np.asarray(cg)

        def _ensure_failed(self):
            """Failure ladder: Cholesky not-ok, non-finite MLL, or (with the
            constraint active) cond beyond cond_max_abs."""
            if self._failed is not None:
                return
            self._ensure_val()
            failed = (not self._ok) or not np.isfinite(self._val)
            if use_cstr or failed:
                self._ensure_cond()
                if self._cond > cfg.cond_max_abs:
                    failed = True
            if failed:
                self.n_cho_fail += 1
            self._failed = failed

        # scipy-facing accessors ------------------------------------------
        def obj_val(self, x):
            self._sync(x)
            self._ensure_failed()
            if self._failed:
                self._ensure_cond()
                return self._cond          # minimize cond instead
            return -self._val

        def obj_grad(self, x):
            self._sync(x)
            self._ensure_failed()
            if self._failed:
                self._ensure_cond_grad()
                return self._cond_grad
            self._ensure_grad()
            return -self._grad

        def cond(self, x):
            self._sync(x)
            self._ensure_cond()
            return self._cond

        def cond_grad(self, x):
            self._sync(x)
            self._ensure_cond_grad()
            return self._cond_grad

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
    use_cstr = cfg.b_use_cond_cstr
    memo = _make_callbacks(cfg, spec, info, data, eta_const, use_cstr)
    f_obj, f_grad = memo.obj_val, memo.obj_grad
    f_cond, f_cond_grad = memo.cond, memo.cond_grad

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
        "optz_n_val": int(memo.n_val),
        "optz_n_grad": int(memo.n_grad),
        "optz_n_cond": int(memo.n_cond),
        "optz_n_cond_grad": int(memo.n_cond_grad),
        "optz_n_cond2big": int(np.sum(conds > cfg.cond_max)) if use_cstr else 0,
        "optz_max_init_cond": float("nan"),
    }
    return FitResult(hp_vec=best_hp, neg_lkd=jnp.asarray(objs[best]),
                     cond=lkd.cond, info=tele)
