"""Box-constrained L-BFGS, fully jittable and vmap-able.

TPU-native replacement for the reference's per-start scipy SLSQP loop
(/root/reference/gpgradpy/src/optz/OptzLkd.py:249-292): a projected-gradient
L-BFGS (two-loop recursion + Armijo backtracking along the projected path)
with static iteration bounds, so the entire multistart fit compiles to a
single XLA program and the starts dimension is batched with ``vmap``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LbfgsResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    n_iter: jnp.ndarray
    converged: jnp.ndarray
    aux_sum: jnp.ndarray      # sum of the objective's aux flag over accepted
                              # iterates (0 when the objective returns none)


def _project(x, lb, ub):
    return jnp.clip(x, lb, ub)


def lbfgs_box(fun: Callable, x0: jnp.ndarray, lb: jnp.ndarray, ub: jnp.ndarray,
              max_iter: int = 250, history: int = 10, tol_g: float = 1e-8,
              tol_f: float = 1e-12, ls_max: int = 25,
              has_aux: bool = False) -> LbfgsResult:
    """Minimize fun(x) -> (value, grad) subject to lb <= x <= ub.

    Convergence when the projected-gradient infinity norm < tol_g or the
    relative objective decrease < tol_f (the reference's ftol semantics,
    OptzLkd.py:212).

    With ``has_aux`` the objective returns (value, grad, aux) with scalar
    aux; the aux values of the initial point and every ACCEPTED iterate are
    summed into ``result.aux_sum`` (used to count Cholesky-failure visits
    for the optimizer telemetry, OptzLkd.py:240-259 semantics; line-search
    probe points are not counted).
    """
    n = x0.shape[0]
    m = history
    dtype = x0.dtype

    fun_a = fun if has_aux else (lambda x: fun(x) + (jnp.asarray(0.0),))

    x0 = _project(x0, lb, ub)
    f0, g0, a0 = fun_a(x0)

    class State(NamedTuple):
        k: jnp.ndarray
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        S: jnp.ndarray        # (m, n) s-history
        Y: jnp.ndarray        # (m, n) y-history
        rho: jnp.ndarray      # (m,)
        hist_len: jnp.ndarray
        gamma: jnp.ndarray    # initial Hessian scale
        done: jnp.ndarray
        aux_sum: jnp.ndarray

    def two_loop(g, S, Y, rho, hist_len, gamma):
        """Standard L-BFGS two-loop recursion over a circular buffer."""
        q = g

        def bwd(i, carry):
            q, alphas = carry
            idx = (hist_len - 1 - i) % m
            valid = i < hist_len
            a = jnp.where(valid, rho[idx] * jnp.dot(S[idx], q), 0.0)
            q = q - a * Y[idx] * jnp.where(valid, 1.0, 0.0)
            return q, alphas.at[idx].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros(m, dtype)))
        r = gamma * q

        def fwd(i, r):
            idx = (hist_len - jnp.minimum(hist_len, m) + i) % m
            valid = i < hist_len
            b = jnp.where(valid, rho[idx] * jnp.dot(Y[idx], r), 0.0)
            return r + (alphas[idx] - b) * S[idx] * jnp.where(valid, 1.0, 0.0)

        r = jax.lax.fori_loop(0, m, fwd, r)
        return r

    def backtrack(x, f, g, d):
        """Armijo backtracking along the projected path x(t) = P(x - t d).

        On rejection the next trial is the safeguarded minimizer of the
        quadratic through (f, f'(0), f_try) instead of a blind halving --
        near convergence (the f64 polish regime) this typically lands in one
        extra evaluation where halving took three or four."""
        def cond(carry):
            t, j, ok, *_ = carry
            return (~ok) & (j < ls_max)

        def body(carry):
            t, j, ok, xn, fn, gn, an = carry
            x_try = _project(x - t * d, lb, ub)
            f_try, g_try, a_try = fun_a(x_try)
            step = x - x_try
            slope = -jnp.dot(g, step)            # ~ t * f'(0) <= 0
            armijo = f_try <= f + 1e-4 * slope
            ok_new = armijo & jnp.isfinite(f_try)
            xn = jnp.where(ok_new, x_try, xn)
            fn = jnp.where(ok_new, f_try, fn)
            gn = jnp.where(ok_new[None] if ok_new.ndim else ok_new, g_try, gn)
            an = jnp.where(ok_new, a_try, an)
            # quadratic-interpolation trial, safeguarded to [0.1 t, 0.5 t]
            denom = 2.0 * (f_try - f - slope)
            t_quad = -slope * t / jnp.where(denom > 0.0, denom, jnp.inf)
            t_next = jnp.clip(jnp.where(jnp.isfinite(t_quad), t_quad,
                                        0.5 * t), 0.1 * t, 0.5 * t)
            return (t_next, j + 1, ok_new, xn, fn, gn, an)

        init = (jnp.asarray(1.0, dtype), 0, jnp.asarray(False), x, f, g,
                jnp.zeros_like(a0))
        _, _, ok, xn, fn, gn, an = jax.lax.while_loop(cond, body, init)
        return ok, xn, fn, gn, an

    def step(st: State) -> State:
        d = two_loop(st.g, st.S, st.Y, st.rho, st.hist_len, st.gamma)
        # ensure descent; fall back to the gradient if not
        descent = jnp.dot(d, st.g) > 0.0
        d = jnp.where(descent, d, st.g)
        ok, xn, fn, gn, an = backtrack(st.x, st.f, st.g, d)

        s = xn - st.x
        y = gn - st.g
        sy = jnp.dot(s, y)
        update = ok & (sy > 1e-16)
        idx = st.hist_len % m
        S = jnp.where(update, st.S.at[idx].set(s), st.S)
        Y = jnp.where(update, st.Y.at[idx].set(y), st.Y)
        rho = jnp.where(update, st.rho.at[idx].set(1.0 / jnp.maximum(sy, 1e-300)),
                        st.rho)
        hist_len = jnp.where(update, st.hist_len + 1, st.hist_len)
        gamma = jnp.where(update, sy / jnp.maximum(jnp.dot(y, y), 1e-300),
                          st.gamma)

        pg = xn - _project(xn - gn, lb, ub)
        conv_g = jnp.max(jnp.abs(pg)) < tol_g
        conv_f = jnp.abs(st.f - fn) <= tol_f * jnp.maximum(1.0, jnp.abs(fn))
        done = conv_g | (ok & conv_f) | (~ok)

        return State(k=st.k + 1, x=xn, f=fn, g=gn, S=S, Y=Y, rho=rho,
                     hist_len=hist_len, gamma=gamma, done=done,
                     aux_sum=st.aux_sum + jnp.where(ok, an, 0.0))

    def cond_fn(st: State):
        return (st.k < max_iter) & (~st.done)

    init = State(k=jnp.asarray(0), x=x0, f=f0, g=g0,
                 S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
                 rho=jnp.zeros(m, dtype), hist_len=jnp.asarray(0),
                 gamma=jnp.asarray(1.0, dtype), done=jnp.asarray(False),
                 aux_sum=a0)
    final = jax.lax.while_loop(cond_fn, step, init)
    return LbfgsResult(x=final.x, f=final.f, g=final.g, n_iter=final.k,
                       converged=final.done, aux_sum=final.aux_sum)


def lbfgs_box_multistart(fun: Callable, x0_all: jnp.ndarray, lb, ub,
                         **kw) -> LbfgsResult:
    """vmap of lbfgs_box over the leading starts axis -- the reference's
    sequential multistart loop as one batched XLA program."""
    solver = partial(lbfgs_box, fun, lb=lb, ub=ub, **kw)
    return jax.vmap(solver)(x0_all)
