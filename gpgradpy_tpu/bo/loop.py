"""Gradient-enhanced Bayesian-optimization loop.

The reference ships only the surrogate engine, the acquisition definitions
(plt/plt_acq.py:36-41), the per-iteration history machinery (GpParaDef) and
the result traces (results/data_paper_precon); the BO outer loop itself is
external (SURVEY.md section 2.2).  Here it is a first-class module: initial
LHS design -> fit GP -> multistart gradient-based acquisition optimization
(vmapped L-BFGS through the surrogate's analytic dmu/dsig) -> evaluate ->
append, with result traces written in the exact npz schema the reference's
PltOptzResults loader expects (merit_all / opt_all / fsb_all (+_wo_noise),
shape (n_starts, n_iter), results/PltOptzResults.py:44-57).
"""

from __future__ import annotations

import time
from functools import lru_cache
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api import GaussianProcess
from ..fit import lbfgs, lhs
from ..model import predict
from . import acquisition


class BoTrace(NamedTuple):
    x_all: np.ndarray        # (n_iter, dim) evaluated points
    merit_all: np.ndarray    # (n_iter,) objective values
    opt_all: np.ndarray      # (n_iter,) ||grad f||_2 (optimality)
    fsb_all: np.ndarray      # (n_iter,) feasibility (1.0 = feasible)
    time_iter: np.ndarray


@lru_cache(maxsize=64)
def _jit_acq_solver(cfg, spec, acq_name, beta, max_iter):
    """Batched acquisition minimization for one (cfg, spec) signature."""

    def run(x0_all, lb, ub, data, state, fval_best):
        def acq_and_grad(x):
            mu, sig, dmu, dsig, _, _ = predict.eval_model(
                cfg, spec, data, state, x[None, :], calc_grad=True)
            if acq_name == "ucb":
                a, da = acquisition.ucb(mu, sig, dmu, dsig, beta=beta)
            elif acq_name == "mu":
                # pure exploitation: minimize the posterior mean (drives the
                # machine-precision convergence cascade of the paper traces)
                a, da = mu, dmu
            else:
                a, da = acquisition.expected_improvement(
                    mu, sig, fval_best, dmu, dsig)
            return a[0], da[0]

        # tight tolerances: the exploitation cascade needs x resolved far
        # below the default 1e-8 projected-gradient cut
        return lbfgs.lbfgs_box_multistart(acq_and_grad, x0_all, lb, ub,
                                          max_iter=max_iter,
                                          tol_g=1e-14, tol_f=1e-16)

    return jax.jit(run)


def propose_next(gp: GaussianProcess, lb, ub, fval_best,
                 acq: str = "ei", beta: float = 2.0,
                 n_acq_x0: int = 16, acq_iter_max: int = 100,
                 seed: int = 0) -> np.ndarray:
    """Optimize the acquisition over the box [lb, ub] with multistart
    gradient-based L-BFGS; returns the proposed point (init frame)."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    # work in the scaled frame if rescaling is active
    if gp.DataScl is not None:
        lb_s, ub_s = gp.DataScl.boxcon_init_2_scl(lb, ub)
        fb = gp.DataScl.obj_init_2_scl(fval_best)[0]
    else:
        lb_s, ub_s, fb = lb, ub, fval_best

    x0 = lhs.lhs_sample(n_acq_x0, lb_s, ub_s, seed=seed)
    # include the current best data point as a start
    i_best = int(np.argmin(np.asarray(gp.data.fval)))
    x0 = np.vstack([x0, np.asarray(gp.data.x)[i_best][None, :]])

    solver = _jit_acq_solver(gp.cfg, gp.spec, acq, beta, acq_iter_max)
    res = solver(jnp.asarray(x0, gp.dtype), jnp.asarray(lb_s, gp.dtype),
                 jnp.asarray(ub_s, gp.dtype), gp.data, gp._eval_state,
                 jnp.asarray(fb, gp.dtype))
    fvals = np.array(res.f, copy=True)
    fvals[~np.isfinite(fvals)] = np.inf
    x_new_s = np.asarray(res.x)[int(np.argmin(fvals))]

    if acq == "mu":
        # Newton polish on the posterior mean using the surrogate Hessian:
        # quadratic contraction onto the surrogate minimizer, which drives
        # the machine-precision convergence cascade of the paper traces
        xk = x_new_s.copy()
        for _ in range(4):
            _, _, dmu, _, d2mu, _ = gp.eval_model(xk[None, :],
                                                  calc_grad=True,
                                                  calc_hess=True)
            gvec = np.asarray(dmu[0], float)
            H = np.asarray(d2mu[0], float)
            try:
                w, Q = np.linalg.eigh(H)
            except np.linalg.LinAlgError:
                break
            if not np.all(np.isfinite(w)):
                break
            w = np.maximum(np.abs(w), 1e-12 * max(np.max(np.abs(w)), 1e-30))
            step = Q @ ((Q.T @ gvec) / w)
            x_try = np.clip(xk - step, lb_s, ub_s)
            mu_try = gp.eval_model(x_try[None, :])[0][0]
            mu_cur = gp.eval_model(xk[None, :])[0][0]
            if not np.isfinite(mu_try) or mu_try >= mu_cur:
                break
            xk = x_try
        x_new_s = xk

    if gp.DataScl is not None:
        x_new_s = gp.DataScl.x_scl_2_init(x_new_s)
    return np.clip(x_new_s, lb, ub)


_TR_FLOOR_REL = 4e-16       # trust-region radius floor, relative to diameter


def _propose_local_exploit(x_data, f_data, g_data, lb, ub,
                           kernel_type: str, n_local: int, dtype: str,
                           state: dict, newton_steps: int = 8,
                           debug: dict = None,
                           wellcond_mtd: str = "precon",
                           gp_opts: Optional[dict] = None):
    """Surrogate trust-region exploitation.

    Fits a FRESH local gradient-enhanced GP on the n_local points nearest
    the incumbent, in an incumbent-centered frame scaled to the cluster
    radius, and minimizes its posterior mean with damped Newton.  (The
    global surrogate's minimizer carries an absolute bias set by far-away
    data whose values are orders of magnitude above the local cluster,
    flooring the cascade around 1e-8 on Rosenbrock d=5; the local frame is
    what lets proposals track the true optimum to machine precision -- the
    mechanism behind the paper traces' 1e-26 merits.)

    Robustness comes from classic trust-region management with a PERSISTENT
    radius ``state['delta']``: the total Newton displacement is clipped to
    delta, and after the truth evaluation ``run_bo`` expands delta on
    improvement and shrinks it below the attempted step on failure.  A
    non-improving proposal therefore cannot repeat (the radius contracts
    until the exact incumbent gradient guarantees descent), which removes
    the repeated-far-point stall mode of round 1.

    Acceptance inside the Newton loop is on predicted-mean DECREASE only;
    do NOT gate on sigma: the GP's absolute uncertainty floor (~sqrt(eta) x
    cluster value scale) exceeds the incumbent's mean right after a
    successful Newton jump, so a mu+sig gate permanently blocks the
    quadratic cascade and degrades it to a damped-gradient crawl (observed:
    ~28 wasted evals per decade of merit).
    """
    dim = x_data.shape[1]
    i_inc = int(np.argmin(f_data))
    x_inc = x_data[i_inc]
    g_inc = g_data[i_inc]
    d2 = np.sum((x_data - x_inc) ** 2, axis=1)
    idx = np.argsort(d2)[:n_local]
    xs, fs, gs = x_data[idx], f_data[idx], g_data[idx]
    r_loc = max(float(np.sqrt(d2[idx].max())), 1e-300)

    diam = float(np.linalg.norm(ub - lb))
    delta = state.get("delta")
    if state.get("x_inc") is None or \
            not np.array_equal(state.get("x_inc"), x_inc):
        delta = None                # incumbent moved: re-anchor the radius
    if delta is None:
        delta = min(r_loc, 0.05 * diam)
    delta = float(np.clip(delta, _TR_FLOOR_REL * diam, 0.25 * diam))
    state["x_inc"] = x_inc.copy()
    state["delta"] = delta

    if debug is not None:
        debug.update(r_loc=r_loc, delta=delta, branch="newton",
                     n_accept=0, step_norm=0.0)

    # incumbent frame: center on the incumbent, scale to the cluster radius
    scale = r_loc
    xs_loc = (xs - x_inc) / scale
    gs_loc = gs * scale                      # chain rule for the gradients

    # the local GP runs the SAME conditioning method as the global surrogate
    # so a method-labelled trace uses its named conditioning end-to-end
    gp = GaussianProcess(dim, True, kernel_type, wellcond_mtd, dtype=dtype,
                         **(gp_opts or {}))
    gp.set_data(xs_loc, fs, np.zeros(len(idx)), gs_loc,
                np.zeros((len(idx), dim)))
    gp.init_optz_surr(1)
    # warm-start from the previous exploit iteration's converged local hp
    # (the incumbent frame normalizes the cluster radius to ~1, so theta is
    # comparable across iterations); _prev_hp_vec joins it to the start pool
    hp_warm = state.get("hp_local")
    if hp_warm is not None:
        gp.hp_vals = hp_warm
    gp.set_hpara("optz", 0)
    state["hp_local"] = gp.hp_vals

    xk = np.zeros(dim)
    mu_cur = float(gp.eval_model(xk[None, :])[0][0])
    lb_loc = (lb - x_inc) / scale
    ub_loc = (ub - x_inc) / scale
    delta_loc = delta / scale
    for _ in range(newton_steps):
        _, _, dmu, _, d2mu, _ = gp.eval_model(xk[None, :], calc_grad=True,
                                              calc_hess=True)
        gvec = np.asarray(dmu[0], float)
        H = np.asarray(d2mu[0], float)
        try:
            w, Q = np.linalg.eigh(H)
        except np.linalg.LinAlgError:
            break
        if not np.all(np.isfinite(w)):
            break
        w = np.maximum(np.abs(w), 1e-12 * max(np.max(np.abs(w)), 1e-300))
        step = Q @ ((Q.T @ gvec) / w)
        if not np.all(np.isfinite(step)):
            break
        # damped Newton with the TOTAL displacement clipped to the trust
        # region (an indefinite local Hessian makes the full |H|-step
        # overshoot; rejecting outright wastes the exploitation iteration)
        accepted = False
        for t in (1.0, 0.5, 0.25, 0.125):
            x_try = np.clip(xk - t * step, lb_loc, ub_loc)
            tot = np.linalg.norm(x_try)
            if tot > delta_loc:
                x_try = x_try * (delta_loc / tot)
            mu_try = float(gp.eval_model(x_try[None, :])[0][0])
            if np.isfinite(mu_try) and mu_try < mu_cur:
                xk, mu_cur = x_try, mu_try
                accepted = True
                if debug is not None:
                    debug["n_accept"] += 1
                break
        if not accepted:
            break

    if np.linalg.norm(xk) * scale < _TR_FLOOR_REL * diam:
        # Newton produced nothing: take a damped gradient step from the
        # incumbent instead.  The exact incumbent gradient guarantees this
        # descends once the trust region is small enough, so the exploit
        # phase makes monotone progress at worst at a linear rate.
        if debug is not None:
            debug["branch"] = "grad_step"
        gn = np.linalg.norm(g_inc)
        if gn > 0 and np.all(np.isfinite(g_inc)):
            xk = -(0.5 * delta / scale) * g_inc / gn

    if debug is not None:
        debug["step_norm"] = float(np.linalg.norm(xk) * scale)
    x_new = x_inc + xk * scale
    return np.clip(x_new, lb, ub)


def run_bo(obj_fun: Callable, lb, ub, n_iter: int,
           dim: Optional[int] = None, n_init: int = 5,
           kernel_type: str = "SqExp", wellcond_mtd: str = "precon",
           use_grad: bool = True, acq: str = "ei", beta: float = 2.0,
           exploit_frac: float = 0.0, exploit_local: bool = False,
           noise_std: float = 0.0, seed: int = 0,
           gp_options: Optional[dict] = None, verbose: bool = False,
           checkpoint_cb: Optional[Callable] = None,
           checkpoint_every: int = 10,
           exploit_wellcond: Optional[str] = "precon",
           resume_trace: Optional[BoTrace] = None) -> BoTrace:
    """One BO run.  ``obj_fun(x) -> (f, grad)`` with x of shape (m, dim).

    Per iteration: GP.set_data -> set_hpara('optz', i) -> propose_next ->
    evaluate truth -> append (the reconstructed outer loop of SURVEY.md
    section 3.5).

    ``wellcond_mtd`` is the conditioning method of the GLOBAL surrogate (the
    quantity the reference's method-labelled traces compare).
    ``exploit_wellcond`` is the conditioning of the exploit phase's local
    trust-region GP — shared optimizer infrastructure, like the L-BFGS
    inside the acquisition optimizer.  It defaults to 'precon' for every
    method because the local solver's convergence floor is set by its
    surrogate's interpolation accuracy, and the preconditioned local GP is
    ~10-100x more accurate on the tight collinear clusters the cascade
    produces (the papers' own result).  Pass exploit_wellcond=None to run
    the named method end-to-end instead (honest per-method ablation).

    ``resume_trace``: a partial BoTrace (e.g. a periodic checkpoint) whose
    finite-merit prefix is replayed instead of re-run: the recorded points
    are re-evaluated through ``obj_fun`` (noise-free objectives only — the
    truth must be deterministic) and the loop continues from the first
    un-run iteration.  The exploit trust-region state and the proposal rng
    streams restart at the resume point, so a resumed run is a valid
    trajectory of the same algorithm but not bit-identical to an
    uninterrupted one."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    dim = lb.size if dim is None else dim
    rng = np.random.default_rng(seed)

    x_data = lhs.lhs_sample(n_init, lb, ub, seed=seed)
    f_data, g_data = obj_fun(x_data)
    if noise_std > 0:
        f_data = f_data + noise_std * rng.standard_normal(f_data.shape)
        g_data = g_data + noise_std * rng.standard_normal(g_data.shape)

    gp_options = dict(gp_options or {})
    # shape bucketing: one compiled program per bucket of 8 dataset sizes.
    # Rescaling frames bucket too — padding happens AFTER the frame
    # transform and the frame depends only on the unpadded x_eval
    # (tests/test_padding.py::test_padded_rescale_frame)
    gp_options.setdefault("pad_n_eval_multiple", 8)
    gp = GaussianProcess(dim, use_grad, kernel_type, wellcond_mtd,
                         **gp_options)
    gp.init_optz_surr(n_iter + 1)

    n_total = n_init + n_iter
    x_all = np.full((n_total, dim), np.nan)
    merit = np.full(n_total, np.nan)
    opt = np.full(n_total, np.nan)
    fsb = np.ones(n_total)
    t_iter = np.full(n_total, np.nan)
    x_all[:n_init] = x_data
    merit[:n_init] = f_data
    opt[:n_init] = np.linalg.norm(g_data, axis=1)

    std_f = np.full(n_init, noise_std) if noise_std > 0 else np.zeros(n_init)
    std_g = (np.full((n_init, dim), noise_std) if noise_std > 0
             else np.zeros((n_init, dim)))

    i_start = 0
    if resume_trace is not None:
        # explicit raises (not asserts): resume validation must survive
        # python -O like the merit-mismatch ValueError below
        if noise_std != 0:
            raise ValueError(
                "resume_trace needs a deterministic (noise-free) objective")
        m_prev = np.asarray(resume_trace.merit_all, float)
        fin = np.isfinite(m_prev)
        n_done = int(fin.sum())
        if not fin[:n_done].all():
            raise ValueError(
                "resume_trace: finite-merit prefix is not contiguous")
        if n_done > n_init and m_prev.size == n_total:
            x_prev = np.asarray(resume_trace.x_all, float)[:n_done]
            f_prev, g_prev = obj_fun(x_prev)
            if not np.allclose(f_prev, m_prev[:n_done], rtol=1e-10,
                               atol=1e-300):
                raise ValueError(
                    "resume_trace merits do not match obj_fun at the "
                    "recorded points -- wrong objective or noisy truth")
            x_data, f_data, g_data = x_prev, f_prev, g_prev
            x_all[:n_done] = x_prev
            merit[:n_done] = m_prev[:n_done]
            opt[:n_done] = np.asarray(resume_trace.opt_all)[:n_done]
            fsb[:n_done] = np.asarray(resume_trace.fsb_all)[:n_done]
            t_iter[:n_done] = np.asarray(resume_trace.time_iter)[:n_done]
            std_f = np.zeros(n_done)
            std_g = np.zeros((n_done, dim))
            i_start = n_done - n_init

    prev_bucket = None
    exploit_state = {}
    diam = float(np.linalg.norm(ub - lb))
    rng_tr = np.random.default_rng(seed + 424243)
    for i in range(i_start, n_iter):
        t0 = time.time()
        fbest = float(np.min(f_data))
        # final exploitation phase: switch to minimizing the posterior mean
        in_exploit = exploit_frac > 0 and i >= (1.0 - exploit_frac) * n_iter
        dbg = {} if verbose else None
        exploit_fired = (in_exploit and exploit_local and use_grad
                         and noise_std == 0)
        if not exploit_fired:
            # the local-exploit proposal never touches the global surrogate,
            # so its O(n_data^3) refit is skipped during the exploit phase
            # (the result traces record x/merit/opt only; the hp history
            # rows for those iterations stay NaN)
            gp.set_data(x_data, f_data, std_f,
                        g_data if use_grad else None,
                        std_g if use_grad else None)
            # crossing a shape bucket retires every compiled program of the
            # old bucket; drop them so long runs don't exhaust memory
            # mappings (XLA:CPU's LLVM JIT maps each executable's sections
            # separately)
            bucket = gp.spec.n_eval_tot
            if prev_bucket is not None and bucket != prev_bucket:
                jax.clear_caches()
            prev_bucket = bucket
            gp.set_hpara("optz", i)
        if exploit_fired:
            # smallest cluster with enough data for a quadratic-accurate
            # local model -- m(1+d) >= (d+1)(d+2)/2 plus slack.  A tight
            # cluster lets the trust-region radius track the incumbent
            # scale within a few evals (a 2(d+1) cluster needs ~12 new
            # points per contraction generation and crawls).
            n_loc = max(4, (dim + 3) // 2 + 2)
            # carry the numerics-relevant options (cond_norm: on-TPU f64
            # runs must avoid eigh programs, CLAUDE.md) but not the shape
            # bucketing (the local cluster has its own fixed size)
            local_opts = {k: v for k, v in (gp_options or {}).items()
                          if k in ("cond_norm",)}
            x_new = _propose_local_exploit(
                x_data, f_data, g_data, lb, ub, kernel_type,
                n_local=min(x_data.shape[0], n_loc),
                dtype=(gp_options or {}).get("dtype", "float64"),
                state=exploit_state, debug=dbg,
                wellcond_mtd=(wellcond_mtd if exploit_wellcond is None
                              else exploit_wellcond),
                gp_opts=local_opts)
        else:
            acq_i = "mu" if in_exploit else acq
            x_new = propose_next(gp, lb, ub, fbest, acq=acq_i, beta=beta,
                                 seed=seed + i)
        # duplicate guard: a proposal (numerically) identical to an existing
        # datum adds no information and can lock the loop onto one point.
        # The threshold sits just above f64 coordinate resolution -- the
        # terminal cascade legitimately places points ~|x - x*| apart, so a
        # loose threshold (e.g. 1e-9 x diameter) would floor the reachable
        # merit at ~1e-15.  A duplicate from the EXPLOIT phase with the
        # trust region at its floor means the run is converged to machine
        # precision: stop early and leave the NaN tail (the reference's
        # bundled traces end the same way).  A duplicate with the radius
        # still large is a surrogate artifact: shrink the radius and spend
        # the eval on a ball sample inside the trust region instead.
        dmin = float(np.min(np.linalg.norm(x_data - x_new[None, :], axis=1)))
        if dmin < _TR_FLOOR_REL * diam:
            if exploit_fired:
                delta = exploit_state.get("delta", diam)
                if delta <= 4.0 * _TR_FLOOR_REL * diam:
                    if verbose:
                        print(f"BO iter {i}: exploit cascade at machine-"
                              f"precision floor (dmin={dmin:.1e}); stopping",
                              flush=True)
                    break
                exploit_state["delta"] = delta / 4.0
                u = rng_tr.standard_normal(dim)
                u = u / max(np.linalg.norm(u), 1e-300)
                x_new = np.clip(exploit_state["x_inc"] + 0.5 * delta * u,
                                lb, ub)
            else:
                x_new = propose_next(gp, lb, ub, fbest, acq=acq, beta=beta,
                                     seed=seed + 7919 * (i + 1))
        f_new, g_new = obj_fun(x_new[None, :])
        if exploit_fired:
            # classic trust-region update on the TRUTH: expand on
            # improvement over the incumbent, shrink below the attempted
            # step on failure (breaks any repeated-proposal lock)
            step_len = float(np.linalg.norm(x_new - exploit_state["x_inc"]))
            if f_new[0] < fbest:
                exploit_state["delta"] = min(
                    max(exploit_state["delta"], 4.0 * step_len), 0.25 * diam)
            else:
                exploit_state["delta"] = max(step_len / 4.0,
                                             _TR_FLOOR_REL * diam)
        if noise_std > 0:
            f_new = f_new + noise_std * rng.standard_normal(1)
            g_new = g_new + noise_std * rng.standard_normal((1, dim))

        k = n_init + i
        x_all[k] = x_new
        merit[k] = f_new[0]
        opt[k] = np.linalg.norm(g_new[0])
        t_iter[k] = time.time() - t0
        if verbose:
            extra = ""
            if dbg:
                extra = (f", exploit[{dbg['branch']}] r_loc={dbg['r_loc']:.2e}"
                         f" acc={dbg['n_accept']} step={dbg['step_norm']:.2e}")
            print(f"BO iter {i}: f = {f_new[0]:.4e}, "
                  f"|grad| = {opt[k]:.3e}, best = {min(fbest, f_new[0]):.4e}"
                  + extra, flush=True)

        x_data = np.vstack([x_data, x_new[None, :]])
        f_data = np.concatenate([f_data, f_new])
        g_data = np.vstack([g_data, g_new])
        std_f = np.concatenate([std_f, [noise_std if noise_std > 0 else 0.0]])
        std_g = np.vstack([std_g, np.full((1, dim),
                                          noise_std if noise_std > 0 else 0.0)])

        # periodic checkpoint so a crash mid-run (e.g. a TPU worker restart
        # hours in) loses at most checkpoint_every iterations; un-run
        # iterations stay NaN in the partial trace
        if checkpoint_cb is not None and (i + 1) % checkpoint_every == 0:
            checkpoint_cb(BoTrace(x_all=x_all.copy(), merit_all=merit.copy(),
                                  opt_all=opt.copy(), fsb_all=fsb.copy(),
                                  time_iter=t_iter.copy()))

    return BoTrace(x_all=x_all, merit_all=merit, opt_all=opt, fsb_all=fsb,
                   time_iter=t_iter)


def run_bo_constrained(obj_fun: Callable, con_funs, lb, ub, n_iter: int,
                       dim: Optional[int] = None, n_init: int = 8,
                       kernel_type: str = "SqExp",
                       wellcond_mtd: str = "precon", use_grad: bool = True,
                       seed: int = 0, verbose: bool = False) -> BoTrace:
    """Constrained BO: one GP per constraint (feasible iff c_i(x) <= 0) next
    to the objective GP, acquisition = EI x prod_i P(c_i <= 0) (probability
    of feasibility).  The reference scaffolds multi-surrogate problems via
    its ``surr_name`` prefixes (GaussianProcess.py:160-164) but ships no
    constrained loop; this completes it.

    ``con_funs``: list of callables x -> (c, grad_c) like obj_fun.
    """
    from jax.scipy.stats import norm as jnorm

    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    dim = lb.size if dim is None else dim
    n_con = len(con_funs)

    x_data = lhs.lhs_sample(n_init, lb, ub, seed=seed)
    f_data, g_data = obj_fun(x_data)
    c_data = []
    cg_data = []
    for cf in con_funs:
        c, cg = cf(x_data)
        c_data.append(c)
        cg_data.append(cg)

    def make_gp(name):
        gp = GaussianProcess(dim, use_grad, kernel_type, wellcond_mtd,
                             surr_name=name, pad_n_eval_multiple=8)
        gp.init_optz_surr(n_iter + 1)
        return gp

    gp_obj = make_gp("obj_")
    gp_con = [make_gp(f"con{i}_") for i in range(n_con)]

    n_total = n_init + n_iter
    x_all = np.full((n_total, dim), np.nan)
    merit = np.full(n_total, np.nan)
    opt = np.full(n_total, np.nan)
    fsb = np.full(n_total, np.nan)
    x_all[:n_init] = x_data
    merit[:n_init] = f_data
    opt[:n_init] = np.linalg.norm(g_data, axis=1)
    fsb[:n_init] = np.all(np.stack(c_data, 1) <= 0, axis=1) if n_con else 1.0

    for i in range(n_iter):
        n = x_data.shape[0]
        zeros = np.zeros(n)
        zg = np.zeros((n, dim))
        gp_obj.set_data(x_data, f_data, zeros, g_data if use_grad else None,
                        zg if use_grad else None)
        gp_obj.set_hpara("optz", i)
        for k in range(n_con):
            gp_con[k].set_data(x_data, c_data[k], zeros,
                               cg_data[k] if use_grad else None,
                               zg if use_grad else None)
            gp_con[k].set_hpara("optz", i)

        feas_mask = (np.all(np.stack(c_data, 1) <= 0, axis=1)
                     if n_con else np.ones(n, bool))
        fbest = (float(np.min(f_data[feas_mask])) if feas_mask.any()
                 else float(np.min(f_data)))

        # multistart acquisition on EI * prod P(c_i <= 0) (numpy outer loop
        # over candidates through the jitted per-GP predictors)
        cand = lhs.lhs_sample(64, lb, ub, seed=seed + i)
        if feas_mask.any():
            cand = np.vstack([cand, x_data[feas_mask][
                np.argmin(f_data[feas_mask])][None, :]])
        mu, sig = gp_obj.eval_model(cand)[:2]
        ei, _ = acquisition.expected_improvement(
            jnp.asarray(mu), jnp.asarray(sig), fbest)
        score = -np.asarray(ei)
        for k in range(n_con):
            muc, sigc = gp_con[k].eval_model(cand)[:2]
            pof = np.asarray(jnorm.cdf(
                (0.0 - jnp.asarray(muc)) / jnp.maximum(jnp.asarray(sigc),
                                                       1e-12)))
            score = score * pof
        x_new = cand[int(np.argmax(score))]

        f_new, g_new = obj_fun(x_new[None, :])
        c_new = []
        for k, cf in enumerate(con_funs):
            cv, cg = cf(x_new[None, :])
            c_data[k] = np.concatenate([c_data[k], cv])
            cg_data[k] = np.vstack([cg_data[k], cg])
            c_new.append(cv[0])

        j = n_init + i
        x_all[j] = x_new
        merit[j] = f_new[0]
        opt[j] = np.linalg.norm(g_new[0])
        fsb[j] = float(all(c <= 0 for c in c_new)) if n_con else 1.0
        if verbose:
            print(f"cBO iter {i}: f = {f_new[0]:.4e}, feas = {fsb[j]:.0f}, "
                  f"best feas = {fbest:.4e}")

        x_data = np.vstack([x_data, x_new[None, :]])
        f_data = np.concatenate([f_data, f_new])
        g_data = np.vstack([g_data, g_new])

    return BoTrace(x_all=x_all, merit_all=merit, opt_all=opt, fsb_all=fsb,
                   time_iter=np.full(n_total, np.nan))


def run_bo_multistart(obj_fun: Callable, lb, ub, n_iter: int, n_x0: int = 5,
                      save_path: Optional[str] = None, seed0: int = 0,
                      obj_fun_wo_noise: Optional[Callable] = None,
                      **bo_kw) -> dict:
    """n_x0 independent BO runs; writes the PltOptzResults npz schema
    (x0_all (n_x0, n_iter, dim), merit_all / opt_all / fsb_all (+_wo_noise)
    of shape (n_x0, n_iter)) for direct comparison against the bundled
    reference traces.  The npz is (re)written after every completed start so
    long runs can be harvested early."""
    traces = []
    for j in range(n_x0):
        cb = None
        if save_path is not None:
            def cb(partial_trace):
                np.savez(save_path, **_traces_to_dict(
                    traces + [partial_trace], obj_fun_wo_noise))
        traces.append(run_bo(obj_fun, lb, ub, n_iter, seed=seed0 + j,
                             checkpoint_cb=cb, **bo_kw))
        if save_path is not None and j + 1 < n_x0:
            partial = _traces_to_dict(traces, obj_fun_wo_noise)
            np.savez(save_path, **partial)
    out = _traces_to_dict(traces, obj_fun_wo_noise)
    if save_path is not None:
        np.savez(save_path, **out)
    return out


def _traces_to_dict(traces, obj_fun_wo_noise=None) -> dict:
    n_x0 = len(traces)
    n_total = traces[0].merit_all.size
    out = {
        "x0_all": np.stack([t.x_all for t in traces]),
        "merit_all": np.stack([t.merit_all for t in traces]),
        "opt_all": np.stack([t.opt_all for t in traces]),
        "fsb_all": np.stack([t.fsb_all for t in traces]),
    }
    if obj_fun_wo_noise is not None:
        merit_wo = np.full((n_x0, n_total), np.nan)
        opt_wo = np.full((n_x0, n_total), np.nan)
        for j, t in enumerate(traces):
            f, g = obj_fun_wo_noise(t.x_all)
            merit_wo[j] = f
            opt_wo[j] = np.linalg.norm(g, axis=1)
        out["merit_wo_noise_all"] = merit_wo
        out["opt_wo_noise_all"] = opt_wo
        out["fsb_wo_noise_all"] = out["fsb_all"]
    else:
        out["merit_wo_noise_all"] = out["merit_all"]
        out["opt_wo_noise_all"] = out["opt_all"]
        out["fsb_wo_noise_all"] = out["fsb_all"]
    return out
