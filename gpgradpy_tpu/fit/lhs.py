"""Latin hypercube sampling (replaces the reference's smt dependency,
GpHparaX0.py:12,180) -- host-side via scipy.stats.qmc for the facade, plus a
jax-native version for in-graph use."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc


def lhs_sample(n: int, lb: np.ndarray, ub: np.ndarray, seed: int = 1) -> np.ndarray:
    """Seeded LHS in [lb, ub], shape (n, d).  Mirrors the reference's seeded
    smt LHS start generation (GpHparaX0.py:175-181), including the 1-D
    linspace special case."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    d = lb.size
    if d == 1:
        # vector without nodes at the boundaries (GpHparaX0.py:177)
        return np.linspace(lb[0], ub[0], n + 2)[1:-1, None]
    u = qmc.LatinHypercube(d=d, seed=seed).random(n)
    return lb + u * (ub - lb)


def lhs_sample_jax(key: jax.Array, n: int, lb: jnp.ndarray, ub: jnp.ndarray):
    """Jax-native LHS: one stratified sample per cell with per-dimension
    stratum permutations."""
    d = lb.shape[0]
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, d))
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(k2, d)).T                      # (n, d)
    cells = (perms + u) / n
    return lb + cells * (ub - lb)
