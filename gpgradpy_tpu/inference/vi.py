"""Mean-field variational inference (ADVI) over the same log-posterior used
by NUTS -- diagonal-Gaussian family in the unconstrained space, reparameterized
gradients, optax Adam.  Additive capability per BASELINE.json ("VI and SMC
over hyperparameters reuse the same vectorized log-prob")."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ViResult(NamedTuple):
    mu: jnp.ndarray          # variational mean (unconstrained space)
    log_sigma: jnp.ndarray   # variational log std
    elbo_trace: jnp.ndarray


def run_advi(logp_fn: Callable, z0: jnp.ndarray, key: jax.Array,
             n_steps: int = 1000, n_mc: int = 8,
             learning_rate: float = 5e-2) -> ViResult:
    """Maximize the ELBO  E_q[logp(z)] + H[q]  for q = N(mu, diag(sigma^2))."""
    n = z0.shape[0]
    params = {"mu": z0, "log_sigma": jnp.full((n,), -1.0, z0.dtype)}
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (n_mc, n), z0.dtype)
        sigma = jnp.exp(params["log_sigma"])
        zs = params["mu"] + eps * sigma
        logps = jax.vmap(logp_fn)(zs)
        logps = jnp.where(jnp.isfinite(logps), logps, -1e12)
        entropy = jnp.sum(params["log_sigma"])  # + const
        return -(jnp.mean(logps) + entropy)

    def step(carry, key):
        params, opt_state = carry
        loss, g = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, n_steps)
    (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)
    return ViResult(mu=params["mu"], log_sigma=params["log_sigma"],
                    elbo_trace=elbos)


def sample_vi(result: ViResult, key: jax.Array, n_samples: int):
    eps = jax.random.normal(key, (n_samples, result.mu.shape[0]),
                            result.mu.dtype)
    return result.mu + eps * jnp.exp(result.log_sigma)
