#!/usr/bin/env python3
"""Large-n distributed GP demo: fit + predict WITHOUT ever materializing the
covariance, with the training-point axis sharded over a device mesh.

Pipeline (the SURVEY.md section 5.7 scaling axis, absent from the reference
whose dense Cholesky caps n_data at a few hundred):
  1. theta fit by L-BFGS on the determinant-free iterative MLL gradient
     (CG solves + Hutchinson trace through the sharded matvec);
  2. posterior mean/std at query points via predict_iter (cross-covariance
     assembled per shard, query solves batched into one CG call).

Run on CPU with 8 virtual devices:
  JAX_PLATFORMS=cpu PYTHONPATH= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/large_n_demo.py --n 512
On TPU hardware the same code runs with the mesh over real chips.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpgradpy_tpu import GpConfig, GpData, make_data_spec  # noqa: E402
from gpgradpy_tpu.bo.problems import rosenbrock  # noqa: E402
from gpgradpy_tpu.model import (conditioning, likelihood_iter,  # noqa: E402
                                predict_iter)
from gpgradpy_tpu.parallel import sharded_matvec as sm  # noqa: E402
from gpgradpy_tpu.types import Hypers  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512,
                    help="n_eval (n_data = n*(1+dim)); must divide the mesh")
    ap.add_argument("--dim", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    n, d = args.n, args.dim
    mesh = sm.make_data_mesh()
    n -= n % mesh.size
    print(f"devices: {mesh.size}, n_eval={n}, n_data={n * (1 + d)}")

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (n, d))
    f, g = rosenbrock(x)
    xq = rng.uniform(-2, 2, (64, d))
    fq, _ = rosenbrock(xq)

    cfg = GpConfig(dim=d, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", cond_max_target=1e6)
    spec = make_data_spec(d, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, d)))
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    data = GpData(x=jnp.asarray(x, dt), fval=jnp.asarray(f, dt),
                  std_fval=jnp.zeros(n, dt), grad=jnp.asarray(g, dt),
                  std_grad=jnp.zeros((n, d), dt))
    eta = conditioning.calc_etaK(cfg, n)

    # --- 1. theta fit: plain gradient descent in log-space on the
    # determinant-free iterative MLL (keeps the demo dependency-free; the
    # facade's L-BFGS would work identically on this gradient)
    log_theta = jnp.zeros(d, dt) - 1.0
    key = jax.random.PRNGKey(0)
    lr = 0.15
    t0 = time.time()
    for it in range(args.steps):
        hp = Hypers(theta=10.0 ** log_theta)
        val, gth, info = likelihood_iter.neg_mll_iterative_and_grad(
            cfg, spec, data, hp, eta, jax.random.fold_in(key, it),
            n_probes=8, max_cg_iters=400, cg_tol=1e-8, mesh=mesh)
        # chain rule to log10 space; clip to a per-step trust region (the
        # stochastic trace estimate makes raw gradients heavy-tailed) and
        # keep theta inside the usual optimization box
        glog = gth * (10.0 ** log_theta) * np.log(10.0)
        log_theta = jnp.clip(log_theta - lr * jnp.clip(glog, -1.0, 1.0),
                             -4.0, 2.0)
        if it % 10 == 0 or it == args.steps - 1:
            print(f"  step {it:3d}: -lnL = {float(val):10.2f}  "
                  f"theta = {np.round(np.asarray(10.0 ** log_theta), 4)}  "
                  f"cg_resid = {float(info.cg_resid):.1e}")
    print(f"fit: {time.time() - t0:.1f}s")

    # --- 2. distributed posterior prediction
    hp = Hypers(theta=10.0 ** log_theta)
    t0 = time.time()
    mu, sig, beta, varK, res = predict_iter.predict_iterative(
        cfg, spec, data, hp, eta, jnp.asarray(xq, dt), max_cg_iters=300,
        mesh=mesh)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - fq) ** 2)))
    print(f"predict: {time.time() - t0:.1f}s  held-out rmse = {rmse:.4g} "
          f"({rmse / np.std(fq):.2%} of f-scale), mean sig = "
          f"{float(jnp.mean(sig)):.4g}")


if __name__ == "__main__":
    main()
