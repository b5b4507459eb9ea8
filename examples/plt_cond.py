#!/usr/bin/env python3
"""Condition-number study: cond(K) and the scaled marginal log-likelihood as
2-D contour maps over (gamma_1, gamma_2) for each kernel and conditioning
method, on Rosenbrock data.

Equivalent of /root/reference/gpgradpy/plt/plt_cond.py (:99, :156-242) --
the (n_gamma x n_gamma) grid of likelihood/cond evaluations is one vmapped
device call instead of a double Python loop.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from gpgradpy_tpu import GpConfig, GpData, Hypers, make_data_spec  # noqa: E402
from gpgradpy_tpu.bo.problems import rosenbrock  # noqa: E402
from gpgradpy_tpu.fit import lhs  # noqa: E402
from gpgradpy_tpu.model import conditioning, likelihood  # noqa: E402
from gpgradpy_tpu.ops import kernels  # noqa: E402


def main(kernel_type="SqExp", wellcond_mtds=("base", "precon"),
         n_eval=10, n_gamma=30, out_png="plt_cond.png"):
    dim = 2
    x_eval = lhs.lhs_sample(n_eval, np.full(dim, -1.5), np.full(dim, 1.5),
                            seed=2)
    fval, grad = rosenbrock(x_eval)

    gamma_vec = np.logspace(-2, 2, n_gamma)
    G1, G2 = np.meshgrid(gamma_vec, gamma_vec)
    th_grid = np.stack([
        np.asarray(kernels.gamma2theta(kernel_type, jnp.asarray(G1.ravel()))),
        np.asarray(kernels.gamma2theta(kernel_type, jnp.asarray(G2.ravel()))),
    ], axis=1)

    fig, axes = plt.subplots(len(wellcond_mtds), 2,
                             figsize=(11, 4.5 * len(wellcond_mtds)))
    axes = np.atleast_2d(axes)

    for row, mtd in enumerate(wellcond_mtds):
        cfg = GpConfig(dim=dim, use_grad=True, kernel_type=kernel_type,
                       wellcond_mtd=mtd)
        spec = make_data_spec(dim, True, n_eval, std_fval=np.zeros(n_eval),
                              std_grad=np.zeros((n_eval, dim)))
        data = GpData(x=jnp.asarray(x_eval), fval=jnp.asarray(fval),
                      std_fval=jnp.zeros(n_eval), grad=jnp.asarray(grad),
                      std_grad=jnp.zeros((n_eval, dim)))
        eta = conditioning.calc_etaK(cfg, n_eval)

        def one(th):
            lkd = likelihood.calc_lkd(cfg, spec, data, Hypers(theta=th), eta,
                                      calc_cond=True)
            return lkd.ln_lkd, lkd.cond, lkd.ok

        lkd_v, cond_v, ok_v = jax.vmap(one)(jnp.asarray(th_grid))
        lkd_v = np.where(np.asarray(ok_v), np.asarray(lkd_v), np.nan)
        cond_v = np.asarray(cond_v)

        lkd_map = lkd_v.reshape(n_gamma, n_gamma)
        cond_map = np.log10(cond_v.reshape(n_gamma, n_gamma))

        for col, (mp, title) in enumerate(
                [(cond_map, r"$\log_{10}$ cond"),
                 (lkd_map, "scaled ln lkd")]):
            ax = axes[row, col]
            if col == 1 and np.any(np.isfinite(mp)):
                lo, hi = np.nanmin(mp), np.nanmax(mp)
                mp = (mp - lo) / max(hi - lo, 1e-30)
            cs = ax.contourf(G1, G2, mp, cmap="viridis")
            ax.set_xscale("log")
            ax.set_yscale("log")
            ax.set_xlabel(r"$\gamma_1$")
            ax.set_ylabel(r"$\gamma_2$")
            ax.set_title(f"{mtd}: {title}")
            fig.colorbar(cs, ax=ax)

    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"saved {out_png}")


if __name__ == "__main__":
    main()
