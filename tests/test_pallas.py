"""Pallas tiled covariance assembly: interpreter-mode equivalence with the
closed-form XLA assembly (real-TPU runs are exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gpgradpy_tpu.ops import kernels, pallas_assembly, rtensor

CASES = [("SqExp", None), ("Ma5f2", None), ("RatQu", 2.0)]


@pytest.mark.parametrize("ktype,alpha", CASES)
def test_pallas_assembly_matches_closed_form(ktype, alpha):
    rng = np.random.default_rng(0)
    n, d = 20, 3
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)
    want = kernels.kern_grad(ktype, rtensor.calc_rtensor(x, x),
                             theta, alpha)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_assembly.kern_grad_pallas(ktype, x, x, theta, alpha,
                                               block=8)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-6)


def test_pallas_custom_vjp_gradient():
    """The custom-VJP wrapper's theta-gradient equals the XLA path's."""
    from gpgradpy_tpu.model.assembly import _pallas_kern_ad
    rng = np.random.default_rng(1)
    n, d = 12, 2
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    theta = jnp.asarray([0.8, 1.3], jnp.float32)
    adj = jnp.asarray(rng.standard_normal(((1 + d) * n, (1 + d) * n)),
                      jnp.float32)

    f = _pallas_kern_ad("SqExp")

    def loss_pallas(th):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(f(x, th, jnp.asarray(0.0, jnp.float32)) * adj)

    def loss_xla(th):
        return jnp.sum(kernels.kern_grad("SqExp", rtensor.calc_rtensor(x, x),
                                         th) * adj)

    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss_pallas)(theta)
    g_x = jax.grad(loss_xla)(theta)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4)


@pytest.mark.parametrize("ktype,alpha", CASES)
def test_pallas_vjp_theta_matches_xla(ktype, alpha):
    """The fused backward contraction equals the XLA closed-form VJP's
    theta-cotangent for an arbitrary covariance cotangent."""
    rng = np.random.default_rng(4)
    n, d = 20, 3
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)
    gbar = jnp.asarray(rng.standard_normal(((1 + d) * n, (1 + d) * n)),
                       jnp.float32)

    def ref(th):
        return kernels.kern_grad(ktype, rtensor.calc_rtensor(x, x), th,
                                 alpha)
    _, vjp = jax.vjp(ref, theta)
    want, = vjp(gbar)

    with pltpu.force_tpu_interpret_mode():
        got = pallas_assembly.kern_grad_pallas_vjp_theta(
            ktype, x, x, theta, alpha, gbar, block=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("ktype,alpha", CASES)
def test_pallas_cross_covariance_matches_closed_form(ktype, alpha):
    """Rectangular x1 != x2 case (the predict cross-covariance layout,
    predict._cross_cov pallas branch)."""
    rng = np.random.default_rng(3)
    n1, n2, d = 24, 10, 3
    x1 = jnp.asarray(rng.uniform(-1, 1, (n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(-1, 1, (n2, d)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0.5, 2, d), jnp.float32)
    want = kernels.kern_grad(ktype, rtensor.calc_rtensor(x1, x2),
                             theta, alpha)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_assembly.kern_grad_pallas(ktype, x1, x2, theta, alpha,
                                               block=8)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-6)
