"""No-U-Turn Sampler over GP hyperparameters, TPU-native.

Self-contained iterative NUTS (Hoffman & Gelman 2014, with the iterative
tree construction and multinomial proposal sampling of Phan et al. 2019):
fully jittable with static maximum tree depth, so hundreds of chains vmap
onto one chip and shard over a device mesh (see parallel/mesh.py).  Warmup
uses windowed adaptation: dual-averaging step size + diagonal mass matrix
(Welford), with the adaptation statistics averaged ACROSS chains -- a mean
over the chain axis that becomes a psum over ICI/DCN when the chain axis is
a mesh axis (the BASELINE.json north-star design).

The target is any log-density over the flat hyperparameter vector; for GP
hyperparameter posteriors use ``make_gp_logpost`` (MLL + box-uniform prior
through a logit reparameterization so the chain lives in R^n).

The reference library has no sampler (MAP only); this module is the additive
Bayesian-inference capability specified by BASELINE.json.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import GpConfig
from ..model import likelihood
from ..types import DataSpec, GpData, HpInfo


# ---------------------------------------------------------------------------
# Target construction
# ---------------------------------------------------------------------------

def make_gp_logpost(cfg: GpConfig, spec: DataSpec, info: HpInfo, data: GpData,
                    eta_const, lb, ub):
    """Log posterior over an unconstrained vector z, with
    hp_vec = lb + (ub - lb) * sigmoid(z) and the log-Jacobian of the
    transform (box-uniform prior on the optimization-space hp vector)."""
    # pin the bounds to the model dtype: in an x64 process f64 numpy bounds
    # would otherwise promote the whole MLL to f64 -- on TPU that means
    # emulated-f64 programs (or kernel faults) the caller never asked for
    lb = jnp.asarray(lb, data.x.dtype)
    ub = jnp.asarray(ub, data.x.dtype)

    def logpost(z):
        s = jax.nn.sigmoid(z)
        hp_vec = lb + (ub - lb) * s
        log_jac = jnp.sum(jnp.log(ub - lb) + jnp.log(s) + jnp.log1p(-s))
        val, lkd = likelihood.neg_mll(cfg, spec, info, data, hp_vec, eta_const)
        return -val + log_jac

    def z_to_hp(z):
        return lb + (ub - lb) * jax.nn.sigmoid(z)

    def hp_to_z(hp_vec):
        u = jnp.clip((hp_vec - lb) / (ub - lb), 1e-6, 1 - 1e-6)
        return jnp.log(u) - jnp.log1p(-u)

    return logpost, z_to_hp, hp_to_z


# ---------------------------------------------------------------------------
# Leapfrog and tree machinery
# ---------------------------------------------------------------------------

class _Leaf(NamedTuple):
    z: jnp.ndarray
    r: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray
    energy: jnp.ndarray


def _leapfrog(logp_and_grad, inv_mass, step, z, r, grad):
    r = r + 0.5 * step * grad
    z = z + step * inv_mass * r
    logp, grad = logp_and_grad(z)
    r = r + 0.5 * step * grad
    return z, r, grad, logp


def _kinetic(inv_mass, r):
    return 0.5 * jnp.sum(inv_mass * r * r)


def _is_turning(inv_mass, r_left, r_right, z_sum):
    """Generalized U-turn criterion on the momentum sum (Betancourt 2017)."""
    v = inv_mass * z_sum
    return (jnp.dot(v, r_left) <= 0) | (jnp.dot(v, r_right) <= 0)


class NutsState(NamedTuple):
    z: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray
    step: jnp.ndarray
    inv_mass: jnp.ndarray
    rng: jax.Array
    accept_prob: jnp.ndarray     # mean accept prob of last trajectory
    diverging: jnp.ndarray
    n_leapfrog: jnp.ndarray


_DELTA_MAX = 1000.0


def nuts_step(logp_and_grad: Callable, state: NutsState,
              max_depth: int = 8) -> NutsState:
    """One NUTS transition (static max_depth -> one compiled XLA program)."""
    z0, logp0, grad0 = state.z, state.logp, state.grad
    step, inv_mass = state.step, state.inv_mass
    n = z0.shape[0]

    rng, key_mom, key_tree = jax.random.split(state.rng, 3)
    r0 = jax.random.normal(key_mom, (n,), dtype=z0.dtype) / jnp.sqrt(inv_mass)
    energy0 = -logp0 + _kinetic(inv_mass, r0)

    class Tree(NamedTuple):
        z_left: jnp.ndarray
        r_left: jnp.ndarray
        grad_left: jnp.ndarray
        z_right: jnp.ndarray
        r_right: jnp.ndarray
        grad_right: jnp.ndarray
        z_prop: jnp.ndarray
        logp_prop: jnp.ndarray
        grad_prop: jnp.ndarray
        log_weight: jnp.ndarray     # logsumexp of -energy over leaves
        r_sum: jnp.ndarray          # momentum sum across leaves
        sum_accept: jnp.ndarray
        n_leaf: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray

    def build_subtree(n_leaves, going_right, z, r, grad, key):
        """Iteratively add ``n_leaves`` (= 2^depth, traced) leaves; the
        checkpoint bit-trick detects internal U-turns without recursion."""
        direction = jnp.where(going_right, 1.0, -1.0)
        ckpt_z = jnp.zeros((max_depth + 1, n), z.dtype)
        ckpt_r = jnp.zeros((max_depth + 1, n), z.dtype)
        ckpt_rsum = jnp.zeros((max_depth + 1, n), z.dtype)

        def body(i, carry):
            (z, r, grad, z_prop, logp_prop, grad_prop, log_w, r_sum,
             sum_acc, turning, diverging, ckpt_z, ckpt_r, ckpt_rsum, key) = carry
            z, r, grad, logp = _leapfrog(logp_and_grad, inv_mass,
                                         direction * step, z, r, grad)
            energy = -logp + _kinetic(inv_mass, r)
            # pin the scalar bookkeeping to the state dtype: a log-density
            # that returns f64 under jax_enable_x64 (e.g. f64 data with f32
            # chain state) would otherwise promote the while_loop carry and
            # break its type invariant
            delta = (energy - energy0).astype(z.dtype)
            div_new = (~jnp.isfinite(energy)) | (delta > _DELTA_MAX)
            log_w_leaf = jnp.where(div_new, -jnp.inf, -delta)
            accept = jnp.minimum(1.0, jnp.exp(-delta))
            accept = jnp.where(jnp.isfinite(accept), accept, 0.0)

            # multinomial (progressive) proposal within the subtree
            log_w_new = jnp.logaddexp(log_w, log_w_leaf)
            key, sub = jax.random.split(key)
            take = (jnp.log(jax.random.uniform(sub)) < (log_w_leaf - log_w_new))
            z_prop = jnp.where(take, z, z_prop)
            logp_prop = jnp.where(take, logp, logp_prop)
            grad_prop = jnp.where(take, grad, grad_prop)

            r_sum = r_sum + r

            # checkpoint bookkeeping: even leaves store, odd leaves check
            pc = _popcount(i)
            is_even = (i % 2) == 0
            ckpt_z = jnp.where(is_even, ckpt_z.at[pc].set(z), ckpt_z)
            ckpt_r = jnp.where(is_even, ckpt_r.at[pc].set(r), ckpt_r)
            ckpt_rsum = jnp.where(is_even, ckpt_rsum.at[pc].set(r_sum - r),
                                  ckpt_rsum)

            t_ones = _trailing_ones(i)
            idx_max = pc - 1
            idx_min = pc - t_ones

            def check_turn(k, turn):
                valid = (~is_even) & (k >= idx_min) & (k <= idx_max)
                seg_rsum = r_sum - ckpt_rsum[k]
                turn_k = _is_turning(inv_mass, ckpt_r[k], r, seg_rsum)
                return turn | (valid & turn_k)

            turning = jax.lax.fori_loop(0, max_depth + 1, check_turn, turning)

            return (z, r, grad, z_prop, logp_prop, grad_prop, log_w_new,
                    r_sum, sum_acc + accept, turning, diverging | div_new,
                    ckpt_z, ckpt_r, ckpt_rsum, key)

        def cond(carry_i):
            i, carry = carry_i
            turning, diverging = carry[9], carry[10]
            return (i < n_leaves) & (~turning) & (~diverging)

        def body_wrap(carry_i):
            i, carry = carry_i
            return i + 1, body(i, carry)

        init = (z, r, grad, z, jnp.zeros_like(logp0), grad,
                jnp.asarray(-jnp.inf, z.dtype), jnp.zeros_like(r),
                jnp.asarray(0.0, z.dtype),
                jnp.asarray(False), jnp.asarray(False),
                ckpt_z, ckpt_r, ckpt_rsum, key)
        _, out = jax.lax.while_loop(cond, body_wrap, (0, init))
        (z_e, r_e, grad_e, z_prop, logp_prop, grad_prop, log_w, r_sum,
         sum_acc, turning, diverging, *_rest) = out
        return (z_e, r_e, grad_e, z_prop, logp_prop, grad_prop, log_w, r_sum,
                sum_acc, turning, diverging)

    # initial singleton tree = the current point
    tree0 = Tree(z_left=z0, r_left=r0, grad_left=grad0,
                 z_right=z0, r_right=r0, grad_right=grad0,
                 z_prop=z0, logp_prop=logp0, grad_prop=grad0,
                 log_weight=jnp.asarray(0.0, z0.dtype),
                 r_sum=r0, sum_accept=jnp.asarray(0.0, z0.dtype),
                 n_leaf=jnp.asarray(0, jnp.int32),
                 turning=jnp.asarray(False), diverging=jnp.asarray(False))

    def doubling_cond(carry):
        depth, tree, key = carry
        return (depth < max_depth) & (~tree.turning) & (~tree.diverging)

    def doubling_body(carry):
        depth, tree, key = carry
        key, k_dir, k_sub, k_acc = jax.random.split(key, 4)
        going_right = jax.random.bernoulli(k_dir)

        z_edge = jnp.where(going_right, tree.z_right, tree.z_left)
        r_edge = jnp.where(going_right, tree.r_right, tree.r_left)
        g_edge = jnp.where(going_right, tree.grad_right, tree.grad_left)

        n_leaves = jnp.asarray(2 ** depth, jnp.int32)
        (z_e, r_e, g_e, z_prop_n, logp_prop_n, grad_prop_n, log_w_n, r_sum_n,
         sum_acc_n, turn_n, div_n) = build_subtree(
            n_leaves, going_right, z_edge, r_edge, g_edge, k_sub)

        # biased progressive sampling across the doubling
        accept_new = jnp.exp(jnp.minimum(0.0, log_w_n - tree.log_weight))
        take = (jax.random.uniform(k_acc) < accept_new) & (~turn_n) & (~div_n)
        z_prop = jnp.where(take, z_prop_n, tree.z_prop)
        logp_prop = jnp.where(take, logp_prop_n, tree.logp_prop)
        grad_prop = jnp.where(take, grad_prop_n, tree.grad_prop)

        z_left = jnp.where(going_right, tree.z_left, z_e)
        r_left = jnp.where(going_right, tree.r_left, r_e)
        g_left = jnp.where(going_right, tree.grad_left, g_e)
        z_right = jnp.where(going_right, z_e, tree.z_right)
        r_right = jnp.where(going_right, r_e, tree.r_right)
        g_right = jnp.where(going_right, g_e, tree.grad_right)

        r_sum = tree.r_sum + r_sum_n
        turning_total = turn_n | _is_turning(inv_mass, r_left, r_right, r_sum)

        new_tree = Tree(z_left=z_left, r_left=r_left, grad_left=g_left,
                        z_right=z_right, r_right=r_right, grad_right=g_right,
                        z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
                        log_weight=jnp.logaddexp(tree.log_weight, log_w_n),
                        r_sum=r_sum,
                        sum_accept=tree.sum_accept + sum_acc_n,
                        n_leaf=tree.n_leaf + n_leaves,
                        turning=turning_total, diverging=div_n)
        return depth + 1, new_tree, key

    depth, tree, _ = jax.lax.while_loop(doubling_cond, doubling_body,
                                        (0, tree0, key_tree))

    accept_prob = tree.sum_accept / jnp.maximum(tree.n_leaf, 1)
    return NutsState(z=tree.z_prop, logp=tree.logp_prop, grad=tree.grad_prop,
                     step=step, inv_mass=inv_mass, rng=rng,
                     accept_prob=accept_prob, diverging=tree.diverging,
                     n_leapfrog=tree.n_leaf)


def _popcount(i):
    i = i - ((i >> 1) & 0x55555555)
    i = (i & 0x33333333) + ((i >> 2) & 0x33333333)
    return (((i + (i >> 4)) & 0x0F0F0F0F) * 0x01010101) >> 24


def _trailing_ones(i):
    # i ^ (i+1) has bits set at all trailing ones plus the next zero bit
    return _popcount(i ^ (i + 1)) - 1


# ---------------------------------------------------------------------------
# Warmup adaptation (dual averaging + diagonal mass, cross-chain averaged)
# ---------------------------------------------------------------------------

class WarmupState(NamedTuple):
    nuts: NutsState
    log_step_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    welford_mean: jnp.ndarray
    welford_m2: jnp.ndarray
    welford_n: jnp.ndarray


def _dual_avg_update(ws: WarmupState, t, target_accept=0.8,
                     gamma=0.05, t0=10.0, kappa=0.75,
                     cross_chain_mean=None):
    """Nesterov dual averaging on log(step).  ``cross_chain_mean`` reduces the
    accept-prob statistic across chains (psum/pmean on a mesh axis)."""
    a = ws.nuts.accept_prob
    if cross_chain_mean is not None:
        a = cross_chain_mean(a)
    h_bar = (1.0 - 1.0 / (t + t0)) * ws.h_bar + (target_accept - a) / (t + t0)
    log_step = ws.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_step_bar = eta * log_step + (1 - eta) * ws.log_step_bar
    return ws._replace(
        nuts=ws.nuts._replace(step=jnp.exp(log_step)),
        log_step_bar=log_step_bar, h_bar=h_bar)


def _welford_update(ws: WarmupState):
    """Per-chain Welford accumulation; the resulting variances are averaged
    across chains when the mass matrix is set."""
    z = ws.nuts.z
    n = ws.welford_n + 1
    delta = z - ws.welford_mean
    mean = ws.welford_mean + delta / n
    m2 = ws.welford_m2 + delta * (z - mean)
    return ws._replace(welford_mean=mean, welford_m2=m2, welford_n=n)


def run_nuts(logp_fn: Callable, z0: jnp.ndarray, key: jax.Array,
             n_warmup: int = 500, n_samples: int = 500,
             max_depth: int = 8, target_accept: float = 0.8,
             init_step: float = 0.1, cross_chain_mean=None):
    """Warmup + sampling for a single chain; vmap over (z0, key) for many
    chains.  Returns (samples (n_samples, n), diagnostics dict)."""
    logp_and_grad = jax.value_and_grad(logp_fn)

    def lg(z):
        v, g = logp_and_grad(z)
        v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return v, g

    n = z0.shape[0]
    logp0, grad0 = lg(z0)
    nuts0 = NutsState(z=z0, logp=logp0, grad=grad0,
                      step=jnp.asarray(init_step, z0.dtype),
                      inv_mass=jnp.ones(n, z0.dtype), rng=key,
                      accept_prob=jnp.asarray(0.0, z0.dtype),
                      diverging=jnp.asarray(False),
                      n_leapfrog=jnp.asarray(0, jnp.int32))
    ws0 = WarmupState(nuts=nuts0,
                      log_step_bar=jnp.log(jnp.asarray(init_step, z0.dtype)),
                      h_bar=jnp.asarray(0.0, z0.dtype),
                      mu=jnp.log(10.0 * jnp.asarray(init_step, z0.dtype)),
                      welford_mean=jnp.zeros(n, z0.dtype),
                      welford_m2=jnp.zeros(n, z0.dtype),
                      welford_n=jnp.asarray(0.0, z0.dtype))

    mass_update_start = n_warmup // 3
    mass_update_end = (5 * n_warmup) // 6

    def warmup_body(t, ws):
        nuts = nuts_step(lg, ws.nuts, max_depth)
        ws = ws._replace(nuts=nuts)
        ws = _dual_avg_update(ws, t + 1.0, target_accept,
                              cross_chain_mean=cross_chain_mean)
        in_window = (t >= mass_update_start) & (t < mass_update_end)
        ws = jax.lax.cond(in_window, _welford_update, lambda w: w, ws)

        def set_mass(w):
            var = w.welford_m2 / jnp.maximum(w.welford_n - 1, 1)
            var = jnp.where(var > 0, var, 1.0)
            if cross_chain_mean is not None:
                var = cross_chain_mean(var)
            return w._replace(nuts=w.nuts._replace(inv_mass=var))

        ws = jax.lax.cond(t == mass_update_end - 1, set_mass, lambda w: w, ws)
        return ws

    ws = jax.lax.fori_loop(0, n_warmup, warmup_body, ws0)
    nuts = ws.nuts._replace(step=jnp.exp(ws.log_step_bar))

    def sample_body(nuts, _):
        nuts = nuts_step(lg, nuts, max_depth)
        return nuts, (nuts.z, nuts.logp, nuts.accept_prob, nuts.diverging,
                      nuts.n_leapfrog)

    nuts, (zs, logps, accepts, divs, n_lf) = jax.lax.scan(
        sample_body, nuts, None, length=n_samples)
    diag = {"logp": logps, "accept_prob": accepts, "diverging": divs,
            "n_leapfrog": n_lf, "step_size": nuts.step,
            "inv_mass": nuts.inv_mass}
    return zs, diag


# ---------------------------------------------------------------------------
# Checkpointed long runs (SURVEY.md section 5.3: restart for long NUTS runs)
# ---------------------------------------------------------------------------

def save_chain_state(path: str, states: NutsState):
    """Persist a (possibly chain-batched) NutsState to npz."""
    import numpy as np
    np.savez(path, z=np.asarray(states.z), logp=np.asarray(states.logp),
             grad=np.asarray(states.grad), step=np.asarray(states.step),
             inv_mass=np.asarray(states.inv_mass),
             rng=np.asarray(states.rng))


def load_chain_state(path: str) -> NutsState:
    import numpy as np
    d = np.load(path)
    return NutsState(z=jnp.asarray(d["z"]), logp=jnp.asarray(d["logp"]),
                     grad=jnp.asarray(d["grad"]), step=jnp.asarray(d["step"]),
                     inv_mass=jnp.asarray(d["inv_mass"]),
                     rng=jnp.asarray(d["rng"], jnp.uint32),
                     accept_prob=jnp.zeros_like(d["logp"]),
                     diverging=jnp.zeros(d["logp"].shape, bool),
                     n_leapfrog=jnp.zeros(d["logp"].shape, jnp.int32))


def run_nuts_checkpointed(logp_fn: Callable, z0: jnp.ndarray,
                          keys: jax.Array, checkpoint_path: str,
                          n_warmup: int = 500, n_samples: int = 500,
                          segment: int = 100, max_depth: int = 8,
                          resume: bool = True, **kw):
    """Vmapped multi-chain NUTS in segments with an npz checkpoint after each
    segment; on restart (``resume`` and the checkpoint exists) warmup is
    skipped and sampling continues from the stored chain states."""
    import os
    import numpy as np

    logp_and_grad = jax.value_and_grad(logp_fn)

    def lg(z):
        v, g = logp_and_grad(z)
        return (jnp.where(jnp.isfinite(v), v, -jnp.inf),
                jnp.where(jnp.isfinite(g), g, 0.0))

    step_seg = jax.jit(jax.vmap(
        lambda st: jax.lax.scan(
            lambda s, _: ((lambda s2: (s2, (s2.z, s2.diverging)))(
                nuts_step(lg, s, max_depth))), st, None, length=segment)))

    if resume and os.path.isfile(checkpoint_path):
        state = load_chain_state(checkpoint_path)
    else:
        # warmup once via run_nuts, then reconstruct per-chain states
        warm = jax.jit(jax.vmap(lambda z, k: run_nuts(
            logp_fn, z, k, n_warmup=n_warmup, n_samples=1,
            max_depth=max_depth, **kw)))
        zs, diag = warm(z0, keys)
        z_last = zs[:, -1]
        logp0, grad0 = jax.vmap(lg)(z_last)
        state = NutsState(z=z_last, logp=logp0, grad=grad0,
                          step=diag["step_size"], inv_mass=diag["inv_mass"],
                          rng=jax.vmap(lambda k: jax.random.fold_in(k, 17))(keys),
                          accept_prob=jnp.zeros_like(logp0),
                          diverging=jnp.zeros(logp0.shape, bool),
                          n_leapfrog=jnp.zeros(logp0.shape, jnp.int32))
        save_chain_state(checkpoint_path, state)

    all_z = []
    n_seg = -(-n_samples // segment)
    for _ in range(n_seg):
        state, (z_seg, _div) = step_seg(state)
        all_z.append(np.asarray(z_seg))
        save_chain_state(checkpoint_path, state)
    zs = np.concatenate(all_z, axis=1)[:, :n_samples]
    return zs, state
