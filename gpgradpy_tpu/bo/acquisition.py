"""Acquisition functions with analytic gradients.

The reference defines UCB / EI inline in its driver
(/root/reference/gpgradpy/plt/plt_acq.py:36-41) and leaves the acquisition
optimizer outside the library (SURVEY.md section 2.2); here they are
first-class, with gradients assembled from the surrogate's (mu, sigma,
dmu/dx, dsigma/dx) so acquisition optimization is gradient-based and batched.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm


def ucb(mu, sig, dmudx=None, dsigdx=None, beta: float = 2.0):
    """Lower-confidence bound for minimization: acq = mu - beta sig
    (plt_acq.py:36-37).  Returns (acq, dacq/dx or None)."""
    acq = mu - beta * sig
    if dmudx is None:
        return acq, None
    return acq, dmudx - beta * dsigdx


def expected_improvement(mu, sig, fval_best, dmudx=None, dsigdx=None,
                         sig_min: float = 1e-12):
    """Negative expected improvement (to minimize):
    -EI = -[(f* - mu) Phi(z) + sig phi(z)], z = (f* - mu)/sig
    (plt_acq.py:39-41), with d(-EI)/dx = Phi(z) dmu/dx - phi(z) dsig/dx
    (the standard EI gradient after cancellations)."""
    sig_safe = jnp.maximum(sig, sig_min)
    z = (fval_best - mu) / sig_safe
    ei = (fval_best - mu) * norm.cdf(z) + sig_safe * norm.pdf(z)
    acq = -ei
    if dmudx is None:
        return acq, None
    dacq = norm.cdf(z)[..., None] * dmudx - norm.pdf(z)[..., None] * dsigdx
    return acq, dacq
