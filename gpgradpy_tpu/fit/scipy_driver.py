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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, NonlinearConstraint, minimize

from ..config import GpConfig
from ..model import assembly, likelihood
from ..types import DataSpec, GpData, HpInfo, hp_vec_to_hypers
from .multistart import FitResult, HpBounds, get_hp_bounds, select_hp_x0


def _make_callbacks(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                    eta_const: float):
    """Jitted (value, grad, cond, cond_grad) of the MLL at one hp vector,
    with the reference's failure semantics (cond becomes the objective)."""

    @jax.jit
    def lkd_val_grad(v):
        def f(v):
            hp = hp_vec_to_hypers(info, v)
            lkd = likelihood.calc_lkd(cfg, spec, data, hp, eta_const)
            return lkd.ln_lkd, lkd.ok
        (val, ok), g = jax.value_and_grad(f, has_aux=True)(v)
        return val, g, ok

    @jax.jit
    def cond_val_grad(v):
        def c(v):
            hp = hp_vec_to_hypers(info, v)
            ops = assembly.assemble_keta(
                cfg, spec, data, hp, eta_const,
                varK=hp.varK if spec.b_has_noisy_data else None)
            return assembly.calc_cond(ops, cfg.cond_norm)
        return jax.value_and_grad(c)(v)

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


def fit_map_scipy(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                  eta_const: float, history=None, i_optz: int = 0,
                  seed: int = 1, x0_override=None) -> FitResult:
    bounds = get_hp_bounds(cfg, info, history, i_optz)
    if x0_override is not None:
        # warm start from the rescale fixed-point loop (OptzLkd.py:165-168)
        x0_all = np.atleast_2d(np.asarray(x0_override, float))
    else:
        x0_all = np.asarray(select_hp_x0(cfg, spec, info, data, eta_const,
                                         bounds, seed))
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
