#!/usr/bin/env python3
"""Nugget study: condition number vs gamma for several nugget policies on a
2-D Rosenbrock dataset (LHS points).

Equivalent of /root/reference/gpgradpy/plt/plt_nugget_1d.py (analytic eta
formulas :82-83), vmapped over the gamma sweep.
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
from gpgradpy_tpu.model import assembly, conditioning  # noqa: E402
from gpgradpy_tpu.ops import kernels  # noqa: E402


def main(kernel_type="SqExp", n_eval=10, n_gamma=60,
         out_png="plt_nugget_1d.png"):
    dim = 2
    x_eval = lhs.lhs_sample(n_eval, np.full(dim, -1.5), np.full(dim, 1.5),
                            seed=2)
    fval, grad = rosenbrock(x_eval)
    spec = make_data_spec(dim, True, n_eval, std_fval=np.zeros(n_eval),
                          std_grad=np.zeros((n_eval, dim)))
    data = GpData(x=jnp.asarray(x_eval), fval=jnp.asarray(fval),
                  std_fval=jnp.zeros(n_eval), grad=jnp.asarray(grad),
                  std_grad=jnp.zeros((n_eval, dim)))

    gamma_vec = np.logspace(-2, 2, n_gamma)
    theta_vec = np.asarray(kernels.gamma2theta(kernel_type,
                                               jnp.asarray(gamma_vec)))

    fig, ax = plt.subplots(figsize=(7, 5))

    cases = [
        ("base, eta = n/(kappa-1)", "base", {}),
        ("base, eta = 1e-8", "base", {"cond_eta_set_mtd": "dflt_eta",
                                      "cond_eta_dflt": 1e-8}),
        ("precon", "precon", {}),
    ]
    for label, mtd, extra in cases:
        cfg = GpConfig(dim=dim, use_grad=True, kernel_type=kernel_type,
                       wellcond_mtd=mtd, **extra)
        eta = conditioning.calc_etaK(cfg, n_eval)

        def one(th):
            hp = Hypers(theta=jnp.full((dim,), th))
            ops = assembly.assemble_keta(cfg, spec, data, hp, eta)
            return assembly.calc_cond(ops)

        conds = np.asarray(jax.vmap(one)(jnp.asarray(theta_vec)))
        ax.loglog(gamma_vec, conds, label=label)

    ax.axhline(1e10, color="k", ls="--", lw=1, label=r"$\kappa_{\max}$")
    ax.set_xlabel(r"$\gamma$")
    ax.set_ylabel("cond")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"saved {out_png}")


if __name__ == "__main__":
    main()
