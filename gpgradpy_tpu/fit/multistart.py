"""Multistart MAP fitting of the hyperparameters.

Start-point policy (LHS around the median of recent hyperparameters,
'hp_best' pre-scan) mirrors /root/reference/gpgradpy/src/optz/GpHparaX0.py;
the optimization itself replaces the reference's sequential scipy loop
(OptzLkd.py:185-333) with a single vmapped box-constrained L-BFGS: all
multistarts (and, with 'hp_best', all 40 pre-scan likelihood evaluations)
run as one batched XLA program on the accelerator.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GpConfig
from ..model import likelihood
from ..types import DataSpec, GpData, HpInfo
from . import lbfgs, lhs


class HpBounds(NamedTuple):
    lhs_lb: np.ndarray
    lhs_ub: np.ndarray
    box_lb: np.ndarray
    box_ub: np.ndarray


def _median_range(past_vals: Optional[np.ndarray], vrange, lhs_f, box_f):
    """Per-hyperparameter LHS/box bounds around the median of recent values
    (GpHparaX0.py:87-150)."""
    if past_vals is None or past_vals.size == 0:
        med = np.sqrt(vrange[0] * vrange[1])  # geometric centre of the range
    else:
        med = np.median(past_vals, axis=0)
    med = np.clip(med, vrange[0], vrange[1])
    return (np.maximum(med / lhs_f, vrange[0]), np.minimum(med * lhs_f, vrange[1]),
            np.maximum(med / box_f, vrange[0]), np.minimum(med * box_f, vrange[1]))


def get_hp_bounds(cfg: GpConfig, info: HpInfo, history=None,
                  i_optz: int = 0) -> HpBounds:
    """LHS and box bounds in optimization (log) space
    (GpHparaX0.get_hp_x0_lhs_median, GpHparaX0.py:67-183)."""
    lhs_f = cfg.hp_lhs_bound_factor
    box_f = cfg.hp_box_bound_factor
    idx_min = max(0, i_optz - cfg.hp_median_n_idx)

    def past(name):
        if history is None or i_optz <= idx_min:
            return None
        arr = np.asarray(getattr(history, name)[idx_min:i_optz], float)
        if arr.ndim == 1:
            arr = arr[:, None]
        arr = arr[np.all(np.isfinite(arr), axis=1)]
        return arr if arr.size else None

    cols = []
    if info.has_theta:
        th_past = past("hp_theta")
        if th_past is None:
            th_past = np.full((1, cfg.dim), cfg.hp_theta_init)
        lo_l, hi_l, lo_b, hi_b = _median_range(th_past, cfg.hp_theta_range,
                                               lhs_f, box_f)
        cols.append(np.stack([lo_l * np.ones(cfg.dim), hi_l * np.ones(cfg.dim),
                              lo_b * np.ones(cfg.dim), hi_b * np.ones(cfg.dim)], 1))

    def scalar_bounds(name, vrange, init):
        arr = past(name)
        if arr is None:
            arr = np.array([[np.clip(init, *vrange)]])
        lo_l, hi_l, lo_b, hi_b = _median_range(arr, vrange, lhs_f, box_f)
        return np.stack([lo_l, hi_l, lo_b, hi_b], 1)

    if info.has_kernel:
        cols.append(scalar_bounds("hp_kernel", cfg.hp_kernel_range,
                                  cfg.hp_kernel_default))
    if info.has_varK:
        cols.append(scalar_bounds("hp_varK", cfg.hp_varK_range, cfg.hp_varK_init))
    if info.has_var_fval:
        cols.append(scalar_bounds("hp_var_fval", cfg.hp_var_fval_range,
                                  max(cfg.hp_var_fval_init, cfg.hp_var_fval_range[0])))
    if info.has_var_fgrad:
        cols.append(scalar_bounds("hp_var_fgrad", cfg.hp_var_fgrad_range,
                                  max(cfg.hp_var_fgrad_init, cfg.hp_var_fgrad_range[0])))

    b = np.concatenate(cols, axis=0)
    lhs_lb, lhs_ub, box_lb, box_ub = b[:, 0], b[:, 1], b[:, 2], b[:, 3]

    bvec = info.bvec_log
    for arr in (lhs_lb, lhs_ub, box_lb, box_ub):
        arr[bvec] = np.log10(arr[bvec])
    return HpBounds(lhs_lb, lhs_ub, box_lb, box_ub)


class FitResult(NamedTuple):
    hp_vec: jnp.ndarray        # best hp in optimization space
    neg_lkd: jnp.ndarray
    cond: jnp.ndarray
    info: dict                 # optimizer telemetry (host-side)


from functools import lru_cache


@lru_cache(maxsize=256)
def _jit_batch_nll(cfg: GpConfig, spec: DataSpec, info: HpInfo):
    def run(x0, data, eta):
        def nll(v):
            val, _ = likelihood.neg_mll(cfg, spec, info, data, v, eta)
            return val
        return jax.vmap(nll)(x0)
    return jax.jit(run)


@lru_cache(maxsize=256)
def _jit_lkd_cond(cfg: GpConfig, spec: DataSpec, info: HpInfo):
    return jax.jit(lambda v, data, eta: likelihood.calc_lkd_hp_vec(
        cfg, spec, info, data, v, eta, calc_cond=True))


@lru_cache(maxsize=256)
def _jit_fit_fused(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                   max_iter: int, tol_f: float, hp_best: bool,
                   with_cond: bool = True):
    """One XLA program for the whole fit: (optionally) the hp_best scan over
    the candidate points, the (multi-start) L-BFGS, and the final
    likelihood + condition-number evaluation.  One device dispatch per fit
    (dispatch latency dominates warm fits on remote-TPU links)."""

    def run(x0_all, lb, ub, data, eta):
        def obj(v):
            val, g, lkd = likelihood.neg_mll_and_grad(cfg, spec, info, data,
                                                      v, eta)
            # aux: 1.0 when the Cholesky failed and the restoring surrogate
            # objective fired -- summed over visited iterates for the
            # optz_n_cho_fail telemetry (OptzLkd.py:240-259)
            return val, g, 1.0 - lkd.ok.astype(val.dtype)

        if hp_best:
            def nll(v):
                val, lkd = likelihood.neg_mll(cfg, spec, info, data, v, eta)
                return val, 1.0 - lkd.ok.astype(val.dtype)
            vals, fails0 = jax.vmap(nll)(x0_all)
            n_fail_scan = jnp.sum(fails0)
            vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
            starts = x0_all[jnp.argmin(vals)][None, :]
        else:
            n_fail_scan = jnp.asarray(0.0, x0_all.dtype)
            starts = x0_all

        # condition number at the selected start(s) (optz_max_init_cond,
        # OptzLkd.py:240-259); skipped together with the final cond when
        # with_cond=False (f64 eigh costs minutes of TPU compile time)
        if with_cond:
            init_cond = jnp.max(jax.vmap(
                lambda v: likelihood.calc_lkd_hp_vec(
                    cfg, spec, info, data, v, eta, calc_cond=True).cond
            )(starts))
        else:
            init_cond = jnp.asarray(jnp.nan, x0_all.dtype)

        res = lbfgs.lbfgs_box_multistart(obj, starts, lb, ub,
                                         max_iter=max_iter, tol_f=tol_f,
                                         has_aux=True)
        fvals = jnp.where(jnp.isfinite(res.f), res.f, jnp.inf)
        best = jnp.argmin(fvals)
        best_hp = res.x[best]
        # with_cond=False skips the final eigh-based condition number: in
        # emulated f64 on TPU the eigh alone costs minutes of compile time
        # (the polish fit reuses the main fit's cond for telemetry instead)
        lkd = likelihood.calc_lkd_hp_vec(cfg, spec, info, data, best_hp, eta,
                                         calc_cond=with_cond)
        n_cho_fail = n_fail_scan + jnp.sum(res.aux_sum)
        return (best_hp, fvals[best], lkd.cond, lkd.ln_lkd,
                jnp.mean(res.converged.astype(jnp.float32)),
                jnp.mean(res.n_iter.astype(jnp.float32)),
                jnp.max(res.n_iter), n_cho_fail, init_cond)

    return jax.jit(run)


@lru_cache(maxsize=256)
def _jit_solver(cfg: GpConfig, spec: DataSpec, info: HpInfo, max_iter: int,
                tol_f: float):
    def run(x0_all, lb, ub, data, eta):
        def obj(v):
            val, g, _ = likelihood.neg_mll_and_grad(cfg, spec, info, data, v,
                                                    eta)
            return val, g
        return lbfgs.lbfgs_box_multistart(obj, x0_all, lb, ub,
                                          max_iter=max_iter, tol_f=tol_f)
    return jax.jit(run)


def select_hp_x0(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                 eta_const: float, bounds: HpBounds, seed: int = 1):
    """Start selection (GpHparaX0.select_hp_optz_x0, GpHparaX0.py:16-65):
    'lhs' -> optz_n_x0 LHS starts; 'hp_best' -> evaluate the MLL at
    lkd_hp_best_n_eval LHS points (vmapped) and keep the argmax."""
    if cfg.lkd_optz_start_mtd == "lhs":
        x0 = lhs.lhs_sample(cfg.optz_n_x0, bounds.lhs_lb, bounds.lhs_ub, seed)
        return jnp.asarray(x0)
    if cfg.lkd_optz_start_mtd != "hp_best":
        raise ValueError(f"Unknown lkd_optz_start_mtd: {cfg.lkd_optz_start_mtd}")

    n0 = cfg.lkd_hp_best_n_eval
    x0 = jnp.asarray(lhs.lhs_sample(n0, bounds.lhs_lb, bounds.lhs_ub, seed))
    vals = _jit_batch_nll(cfg, spec, info)(x0, data, eta_const)
    vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
    return x0[jnp.argmin(vals)][None, :]


def fit_map(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
            eta_const: float, history=None, i_optz: int = 0,
            seed: int = 1, x0_override=None,
            with_cond: bool = True, hp_prev=None) -> FitResult:
    """One full MAP hyperparameter fit: bounds -> starts -> vmapped L-BFGS ->
    best solution + final condition number (GpHparaOptz.optz_hp +
    OptzLkd.optz_hp_max_lkd semantics).  The device side runs as a single
    fused XLA program.

    x0_override (k, n_hp) replaces the LHS/hp_best start policy with the
    given starts — used by the rescale fixed-point loop to warm-start from
    the previous best hp (OptzLkd.py:165-168).

    hp_prev, when given, joins the start-candidate pool (the previous BO
    round's converged hp is the best-known start once the dataset has only
    grown by one point; the hp_best argmax still prefers a better LHS
    sample).  The pool is padded to a fixed n0+1 rows so the fused program
    compiles once per shape bucket whether or not a previous hp exists."""
    # pin the optimization-space dtype to the config (under jax_enable_x64 a
    # bare asarray of the numpy starts would silently promote the whole fit
    # program to f64)
    dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    bounds = get_hp_bounds(cfg, info, history, i_optz)
    if x0_override is not None:
        hp_best = False
        x0_all = jnp.atleast_2d(jnp.asarray(x0_override, dt))
    else:
        hp_best = cfg.lkd_optz_start_mtd == "hp_best"
        n0 = cfg.lkd_hp_best_n_eval if hp_best else cfg.optz_n_x0
        x0_np = np.asarray(lhs.lhs_sample(n0, bounds.lhs_lb, bounds.lhs_ub,
                                          seed))
        if hp_best:
            extra = (np.clip(np.asarray(hp_prev, float).ravel(),
                             bounds.box_lb, bounds.box_ub)
                     if hp_prev is not None else x0_np[0])
            x0_np = np.vstack([x0_np, extra[None, :]])
        elif hp_prev is not None:
            x0_np = np.vstack([x0_np, np.clip(
                np.asarray(hp_prev, float).ravel(),
                bounds.box_lb, bounds.box_ub)[None, :]])
        x0_all = jnp.asarray(x0_np, dt)

    lb = jnp.asarray(bounds.box_lb, dt)
    ub = jnp.asarray(bounds.box_ub, dt)

    fused = _jit_fit_fused(cfg, spec, info, cfg.optz_iter_max,
                           cfg.optz_tol_obj, hp_best, with_cond)
    out = fused(x0_all, lb, ub, data, eta_const)
    (best_hp, f_best, cond, _ln_lkd, conv_mean, it_mean, it_max,
     n_cho_fail, init_cond) = out
    (f_best, cond, conv_mean, it_mean, it_max, n_cho_fail,
     init_cond) = jax.device_get((f_best, cond, conv_mean, it_mean, it_max,
                                  n_cho_fail, init_cond))
    tele = {
        "hp_optz_success": float(conv_mean),
        "hp_optz_iter_mean": float(it_mean),
        "hp_optz_iter_max": float(it_max),
        "hp_optz_con_good": 1.0,
        # visited iterates (start scan + accepted L-BFGS steps) whose
        # Cholesky failed and the restoring fallback objective fired;
        # line-search probe points are not counted (the reference counts
        # every scipy objective call, OptzLkd.py:240-259)
        "optz_n_cho_fail": int(round(float(n_cho_fail))),
        # the fast path never runs with a cond constraint (precon needs
        # none, GaussianProcess.py:207-208; constrained methods route to
        # the scipy driver), so no feasibility rejections can occur here
        "optz_n_cond2big": 0,
        "optz_max_init_cond": float(init_cond),
    }
    return FitResult(hp_vec=best_hp, neg_lkd=f_best, cond=cond, info=tele)
