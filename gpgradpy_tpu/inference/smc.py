"""Tempered sequential Monte Carlo over the hyperparameter posterior.

Adaptive-temperature SMC with systematic resampling and random-walk
Metropolis mutation; the particle population is a batch axis that shards over
the device mesh exactly like NUTS chains.  Additive capability per
BASELINE.json.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SmcResult(NamedTuple):
    particles: jnp.ndarray      # (n_particles, n)
    log_weights: jnp.ndarray
    betas: jnp.ndarray          # temperature ladder actually used
    ess_trace: jnp.ndarray


def _systematic_resample(key, log_w, n):
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u)


def run_smc(logp_fn: Callable, prior_sample: Callable, key: jax.Array,
            n_particles: int = 512, n_stages: int = 20, n_mcmc: int = 5,
            ess_threshold: float = 0.5, rw_scale: float = 0.3):
    """Anneal from the prior (beta=0) to the posterior (beta=1) over a fixed
    ladder with ESS-triggered systematic resampling and RW-Metropolis moves.

    ``prior_sample(key, n)`` draws the initial population;
    ``logp_fn`` is the full (unnormalized) log posterior.
    """
    key, k0 = jax.random.split(key)
    particles = prior_sample(k0, n_particles)
    n = particles.shape[1]
    logp = jax.vmap(logp_fn)
    lp = logp(particles)
    lp = jnp.where(jnp.isfinite(lp), lp, -1e12)
    log_w = jnp.zeros(n_particles, particles.dtype)

    betas = jnp.linspace(0.0, 1.0, n_stages + 1)

    def stage(carry, i):
        particles, lp, log_w, key = carry
        db = betas[i + 1] - betas[i]
        log_w = log_w + db * lp

        ess = jnp.exp(2 * jax.nn.logsumexp(log_w) -
                      jax.nn.logsumexp(2 * log_w)) / n_particles

        key, k_rs = jax.random.split(key)

        def resample(args):
            particles, lp, log_w, key = args
            idx = _systematic_resample(k_rs, log_w, n_particles)
            return particles[idx], lp[idx], jnp.zeros_like(log_w), key

        particles, lp, log_w, key = jax.lax.cond(
            ess < ess_threshold, resample, lambda a: a,
            (particles, lp, log_w, key))

        # RW-Metropolis mutation at temperature beta_{i+1}
        def mcmc(carry, k):
            particles, lp = carry
            k1, k2 = jax.random.split(k)
            prop = particles + rw_scale * jax.random.normal(
                k1, particles.shape, particles.dtype)
            lp_prop = logp(prop)
            lp_prop = jnp.where(jnp.isfinite(lp_prop), lp_prop, -1e12)
            log_acc = betas[i + 1] * (lp_prop - lp)
            accept = jnp.log(jax.random.uniform(k2, (n_particles,))) < log_acc
            particles = jnp.where(accept[:, None], prop, particles)
            lp = jnp.where(accept, lp_prop, lp)
            return (particles, lp), jnp.mean(accept)

        key, k_m = jax.random.split(key)
        (particles, lp), _ = jax.lax.scan(mcmc, (particles, lp),
                                          jax.random.split(k_m, n_mcmc))
        return (particles, lp, log_w, key), ess

    (particles, lp, log_w, key), ess_trace = jax.lax.scan(
        stage, (particles, lp, log_w, key), jnp.arange(n_stages))
    return SmcResult(particles=particles, log_weights=log_w, betas=betas,
                     ess_trace=ess_trace)
