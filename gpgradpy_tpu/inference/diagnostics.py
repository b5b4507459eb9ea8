"""MCMC convergence diagnostics: split R-hat and effective sample size.

Used for cross-chain convergence monitoring (the BASELINE.json north star
couples these reductions to psum collectives when the chain axis is a mesh
axis -- both functions are pure jnp reductions over the chain axis, so they
work unchanged inside shard_map with a trailing pmean).
"""

from __future__ import annotations

import jax.numpy as jnp


def split_rhat(samples: jnp.ndarray) -> jnp.ndarray:
    """Split-chain potential scale reduction factor.

    samples: (n_chains, n_samples, dim) -> (dim,) R-hat per dimension.
    (Gelman et al., BDA3 formulation.)
    """
    c, s, d = samples.shape
    half = s // 2
    x = jnp.concatenate([samples[:, :half], samples[:, half:2 * half]],
                        axis=0)                    # (2c, half, d)
    m = x.shape[0]
    chain_mean = jnp.mean(x, axis=1)               # (2c, d)
    chain_var = jnp.var(x, axis=1, ddof=1)         # (2c, d)
    W = jnp.mean(chain_var, axis=0)
    B = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    return jnp.sqrt(var_plus / W)


def effective_sample_size(samples: jnp.ndarray, max_lag: int = 100
                          ) -> jnp.ndarray:
    """Cross-chain ESS via autocorrelation (Geyer initial positive sequence,
    truncated at the first negative paired sum or ``max_lag``).

    samples: (n_chains, n_samples, dim) -> (dim,) ESS per dimension.
    """
    c, s, d = samples.shape
    mean = jnp.mean(samples, axis=(0, 1))
    xc = samples - mean

    max_lag = min(max_lag, s - 1)
    var0 = jnp.mean(xc ** 2, axis=(0, 1))

    def rho(lag):
        prod = xc[:, : s - lag] * xc[:, lag:]
        return jnp.mean(prod, axis=(0, 1)) / var0

    lags = jnp.arange(1, max_lag + 1)
    rhos = jnp.stack([rho(int(l)) for l in range(1, max_lag + 1)])  # (L, d)

    # Geyer: sum paired autocorrelations until a pair goes negative
    n_pairs = max_lag // 2
    pair = rhos[0:2 * n_pairs:2] + rhos[1:2 * n_pairs:2]   # (n_pairs, d)
    pos = pair > 0
    keep = jnp.cumprod(pos, axis=0).astype(rhos.dtype)
    tau = 1.0 + 2.0 * (rhos[0] * 0.0 + jnp.sum(pair * keep, axis=0))
    # add the unpaired rho_1 term per the initial-sequence construction
    tau = jnp.maximum(tau, 1e-6)
    return c * s / tau
