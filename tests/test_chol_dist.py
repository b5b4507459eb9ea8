"""Distributed blocked Cholesky (parallel/chol_dist.py) vs the single-device
factorization, on the 8-virtual-device CPU mesh (SURVEY 5.7's direct-
factorization alternative to the CG/SLQ path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpgradpy_tpu.parallel.chol_dist import cholesky_dist
from gpgradpy_tpu.parallel.sharded_matvec import make_data_mesh

pytestmark = pytest.mark.heavy


def _spd(n, seed=0, cond=1e4):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.geomspace(1.0 / cond, 1.0, n)
    return (Q * ev) @ Q.T


@pytest.mark.parametrize("n,block", [(256, 32), (384, 16)])
def test_cholesky_dist_matches_dense(n, block):
    mesh = make_data_mesh()
    assert mesh.size == 8
    A = jnp.asarray(_spd(n), jnp.float64)
    L, logdet = cholesky_dist(mesh, A, block=block)
    L = np.asarray(jax.device_get(L))
    L_ref = np.asarray(jnp.linalg.cholesky(A))
    np.testing.assert_allclose(L, L_ref, rtol=1e-9, atol=1e-11)
    sign, logdet_ref = np.linalg.slogdet(np.asarray(A))
    assert sign > 0
    np.testing.assert_allclose(float(logdet), logdet_ref, rtol=1e-10)


def test_cholesky_dist_gep_covariance():
    """Factor a real gradient-enhanced covariance (the production shape):
    identity-padded to the mesh*block bucket, the pad rows contribute 0 to
    the logdet exactly like DataSpec.pad_mask's masking."""
    from gpgradpy_tpu import GpConfig, GpData, Hypers, make_data_spec
    from gpgradpy_tpu.model import assembly

    dim, n_pts = 3, 100
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (n_pts, dim))
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon")
    spec = make_data_spec(dim, True, n_pts, std_fval=np.zeros(n_pts),
                          std_grad=np.zeros((n_pts, dim)))
    data = GpData(x=jnp.asarray(x), fval=jnp.zeros(n_pts),
                  std_fval=jnp.zeros(n_pts),
                  grad=jnp.zeros((n_pts, dim)),
                  std_grad=jnp.zeros((n_pts, dim)))
    hp = Hypers(beta=None, theta=jnp.asarray([1.0, 2.0, 0.5]), kernel=None,
                varK=None, var_fval=None, var_fgrad=None)
    ops = assembly.assemble_keta(cfg, spec, data, hp, eta_const=1e-6)
    M = np.asarray(ops.M)                       # (400, 400) preconditioned
    n = M.shape[0]
    mesh = make_data_mesh()
    block = 16
    n_pad = (-n) % (mesh.size * block)
    Mp = np.eye(n + n_pad)
    Mp[:n, :n] = M
    L, logdet = cholesky_dist(mesh, jnp.asarray(Mp), block=block)
    np.testing.assert_allclose(float(logdet), float(ops.logdet)
                               - 2.0 * float(jnp.sum(jnp.log(ops.pvec))),
                               rtol=1e-9)
    L = np.asarray(jax.device_get(L))[:n, :n]
    np.testing.assert_allclose(L, np.linalg.cholesky(M), rtol=1e-8,
                               atol=1e-10)
