"""Mid-n MAP fit through the DISTRIBUTED blocked Cholesky (SURVEY 5.7's
direct branch; facade entry ``solver="dense_dist"``).

The reference's fit is built around one dense factorization per objective
evaluation (Kernel.calc_all_K_w_chofac, Kernel.py:128-140).  At mid n
(n_data ~ 4-16k) that O(n^3) factorization dominates the fit; this driver
keeps the exact dense MLL math (model/likelihood.py -- same nugget, precon
trick, closed forms, jax.grad hyperparameter gradients) but routes every
factorization through parallel/chol_dist.py, sharding its O(n^3) flops
row-wise over the device mesh.

CG-vs-direct crossover (when to pick which large-n solver):
- solver='iterative' (CG+SLQ): O(k n^2) with k ~ sqrt(cond) CG iterations.
  Wins while k << n / n_dev -- large n at moderate cond targets (<= ~1e6).
- solver='dense_dist': O(n^3 / n_dev) + O(n b) collectives per block step.
  Wins at mid n once the CG iteration count k exceeds ~n / n_dev --
  ill-conditioned kernels at tight cond targets (1e10), many-rhs reuse of
  one factor, and whenever the EXACT logdet/cond telemetry of the direct
  path is wanted (SLQ only estimates it).

Scheduling: at mid n the matrix is the thing to shard, not the starts (a
single factorization already saturates the mesh), so the multistart policy
runs SEQUENTIALLY inside one jitted program -- lax.map over the hp_best
candidate scan and a single-start L-BFGS from the winner (the reference's
'hp_best' policy, GpHparaX0.py:33-59).  The gradient's triangular-solve
pullback stays single-device (see ops/linalg.cholesky_ok_dist), the same
cost the dense path's VJP pays.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GpConfig
from ..model import likelihood
from ..types import DataSpec, GpData, HpInfo
from . import lbfgs, lhs
from .multistart import FitResult, get_hp_bounds


@lru_cache(maxsize=64)
def _jit_fit_dist(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                  max_iter: int, tol_f: float, hp_best: bool, mesh):
    """Fused dense_dist fit: candidate scan + single-start L-BFGS + final
    likelihood/cond, one XLA program; every factorization runs the
    distributed blocked Cholesky over ``mesh``."""

    def run(x0_all, lb, ub, data, eta):
        def obj(v):
            val, g, lkd = likelihood.neg_mll_and_grad(
                cfg, spec, info, data, v, eta, mesh=mesh)
            return val, g, 1.0 - lkd.ok.astype(val.dtype)

        if hp_best:
            # sequential scan (lax.map), NOT vmap: each evaluation's
            # shard_map factorization already occupies the whole mesh
            def nll(v):
                val, lkd = likelihood.neg_mll(cfg, spec, info, data, v, eta,
                                              mesh=mesh)
                return val, 1.0 - lkd.ok.astype(val.dtype)
            vals, fails0 = jax.lax.map(nll, x0_all)
            n_fail_scan = jnp.sum(fails0)
            vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
            start = x0_all[jnp.argmin(vals)]
        else:
            n_fail_scan = jnp.asarray(0.0, x0_all.dtype)
            start = x0_all[0]

        res = lbfgs.lbfgs_box(obj, start, lb, ub, max_iter=max_iter,
                              tol_f=tol_f, has_aux=True)
        # final telemetry: cfg arrives with cond_norm forced to 'fro' (see
        # fit_map_dense_dist) so the condition number reuses the
        # (distributed) factor via triangular solves -- no eigh program
        lkd = likelihood.calc_lkd_hp_vec(cfg, spec, info, data, res.x, eta,
                                         calc_cond=True, mesh=mesh)
        n_cho_fail = n_fail_scan + jnp.sum(res.aux_sum)
        return (res.x, res.f, lkd.cond, lkd.ln_lkd, res.converged,
                res.n_iter, n_cho_fail)

    return jax.jit(run)


def fit_map_dense_dist(cfg: GpConfig, spec: DataSpec, info: HpInfo,
                       data: GpData, eta_const: float, history=None,
                       i_optz: int = 0, seed: int = 1, x0_override=None,
                       mesh=None, hp_prev=None, **_ignored) -> FitResult:
    """Mid-n MAP fit with the covariance factorization distributed over
    ``mesh`` (same contract as multistart.fit_map)."""
    assert mesh is not None, \
        "solver='dense_dist' needs a device mesh (facade: iter_use_mesh=True)"
    assert cfg.wellcond_mtd == "precon", (
        "solver='dense_dist' runs the unconstrained (precon) fit; the "
        "cond-constrained methods (base/rescale) need the scipy SLSQP "
        "driver, which is dense-only -- use solver='dense'")
    n_dev = mesh.size
    blk = cfg.dist_chol_block
    assert spec.n_data_tot % (n_dev * blk) == 0, (
        f"dense_dist: n_data_tot={spec.n_data_tot} must be a multiple of "
        f"mesh.size*dist_chol_block={n_dev * blk}.  The facade auto-pads "
        f"onto this grid in set_data (api.py); direct driver callers must "
        f"size (or pad) the spec themselves")

    # telemetry cond via the factor (Frobenius), never eigh at mid n
    if cfg.cond_norm != "fro":
        import dataclasses
        cfg = dataclasses.replace(cfg, cond_norm="fro")

    dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    bounds = get_hp_bounds(cfg, info, history, i_optz)
    if x0_override is not None:
        hp_best = False
        x0_all = jnp.atleast_2d(jnp.asarray(x0_override, dt))
    else:
        hp_best = cfg.lkd_optz_start_mtd == "hp_best"
        n0 = cfg.lkd_hp_best_n_eval if hp_best else 1
        x0_np = np.asarray(lhs.lhs_sample(n0, bounds.lhs_lb, bounds.lhs_ub,
                                          seed))
        # STATIC candidate-pool shape: the fused program is shape-keyed, and
        # through the remote-compile tunnel a reshape-triggered recompile
        # costs ~85 s (measured) -- so the hp_prev slot always exists.  With
        # no previous round it duplicates the first LHS row (a no-op for the
        # argmin / the non-hp_best start).
        if hp_prev is not None:
            hp_prev_row = np.clip(np.asarray(hp_prev, float).ravel(),
                                  bounds.box_lb, bounds.box_ub)[None, :]
        else:
            hp_prev_row = x0_np[:1]
        if hp_best:
            # joins the hp_best argmin pool (an LHS sample that beats the
            # previous round's hp still wins)
            x0_np = np.vstack([x0_np, hp_prev_row])
        else:
            # the non-hp_best branch starts from x0_all[0]; the warm start
            # must BE that row or it is silently never used
            x0_np = hp_prev_row
        x0_all = jnp.asarray(x0_np, dt)

    lb = jnp.asarray(bounds.box_lb, dt)
    ub = jnp.asarray(bounds.box_ub, dt)

    fused = _jit_fit_dist(cfg, spec, info, cfg.optz_iter_max,
                          cfg.optz_tol_obj, hp_best, mesh)
    best_hp, f_best, cond, ln_lkd, conv, n_iter, n_cho_fail = fused(
        x0_all, lb, ub, data, eta_const)
    f_best, cond, conv, n_iter, n_cho_fail = jax.device_get(
        (f_best, cond, conv, n_iter, n_cho_fail))
    tele = {
        "hp_optz_success": float(conv),
        "hp_optz_iter_mean": float(n_iter),
        "hp_optz_iter_max": float(n_iter),
        "hp_optz_con_good": 1.0,
        "optz_n_cho_fail": float(n_cho_fail),
        "optz_n_cond2big": 0.0,
        "dist_mesh_devices": int(n_dev),
        "dist_chol_block": int(blk),
    }
    return FitResult(hp_vec=best_hp, neg_lkd=jnp.asarray(float(f_best)),
                     cond=jnp.asarray(float(cond)), info=tele)
