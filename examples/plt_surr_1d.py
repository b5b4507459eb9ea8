#!/usr/bin/env python3
"""1-D surrogate demo: fit sin(x) + sin(10x/3), sweep the likelihood over
gamma, and plot the posterior fits at the local MLL maxima.

Equivalent of /root/reference/gpgradpy/plt/plt_surr_1d.py (objective
:57-65, likelihood sweep :84-103, model eval/plot :187-243), with the sweep
vmapped into one batched device call instead of a Python loop.
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
from scipy.signal import argrelextrema  # noqa: E402

from examples.surr_plt import SurrPlt  # noqa: E402
from gpgradpy_tpu import GaussianProcess, GpConfig, GpData, Hypers, make_data_spec  # noqa: E402
from gpgradpy_tpu.model import conditioning, likelihood  # noqa: E402
from gpgradpy_tpu.ops import kernels  # noqa: E402


def calc_obj(x):
    x1 = np.asarray(x)[:, 0]
    return np.sin(x1) + np.sin(10 * x1 / 3.0)


def calc_grad(x):
    x1 = np.asarray(x)[:, 0]
    return (np.cos(x1) + (10.0 / 3.0) * np.cos(10 * x1 / 3.0))[:, None]


def main(use_grad=True, kernel_type="SqExp", wellcond_mtd="precon",
         out_png="plt_surr_1d.png"):
    xmin, xmax = 2.5, 7.5
    n_eval, n_exa = 6, 400
    x_eval = np.linspace(xmin, xmax, n_eval + 2)[1:-1, None]
    x_exa = np.linspace(xmin, xmax, n_exa)[:, None]
    fval = calc_obj(x_eval)
    grad = calc_grad(x_eval)

    # --- likelihood sweep over gamma (vmapped; plt_surr_1d.py:84-103) ---
    cfg = GpConfig(dim=1, use_grad=use_grad, kernel_type=kernel_type,
                   wellcond_mtd=wellcond_mtd)
    spec = make_data_spec(1, use_grad, n_eval, std_fval=np.zeros(n_eval),
                          std_grad=np.zeros((n_eval, 1)))
    data = GpData(x=jnp.asarray(x_eval), fval=jnp.asarray(fval),
                  std_fval=jnp.zeros(n_eval),
                  grad=jnp.asarray(grad) if use_grad else None,
                  std_grad=jnp.zeros((n_eval, 1)) if use_grad else None)
    eta = conditioning.calc_etaK(cfg, n_eval)

    gamma_vec = np.logspace(-2, 1.5, 200)
    theta_vec = np.asarray(kernels.gamma2theta(kernel_type,
                                               jnp.asarray(gamma_vec)))

    def lkd_of_theta(th):
        hp = Hypers(theta=jnp.atleast_1d(th))
        return likelihood.calc_lkd(cfg, spec, data, hp, eta).ln_lkd

    lkd_vals = np.asarray(jax.vmap(lkd_of_theta)(jnp.asarray(theta_vec)))

    # local maxima of the likelihood
    idx_max = argrelextrema(lkd_vals, np.greater)[0]
    if len(idx_max) == 0:
        idx_max = [int(np.argmax(lkd_vals))]
    print("local MLL maxima at gamma =", gamma_vec[idx_max])

    # --- plot: likelihood sweep + surrogate fits at each maximum ---
    n_fits = len(idx_max)
    fig, axes = plt.subplots(1, n_fits + 1, figsize=(5 * (n_fits + 1), 4))
    axes = np.atleast_1d(axes)
    axes[0].semilogx(gamma_vec, lkd_vals, "b-")
    axes[0].semilogx(gamma_vec[idx_max], lkd_vals[idx_max], "r*", ms=12)
    axes[0].set_xlabel(r"$\gamma$")
    axes[0].set_ylabel("marginal log-likelihood")

    splt = SurrPlt()
    f_exa = calc_obj(x_exa)
    for k, idx in enumerate(idx_max):
        gp = GaussianProcess(1, use_grad, kernel_type, wellcond_mtd)
        gp.set_data(x_eval, fval, np.zeros(n_eval),
                    grad if use_grad else None,
                    np.zeros((n_eval, 1)) if use_grad else None)
        gp.set_hpara("set", 0, hp_vals=gp.make_hp_class(
            theta=np.atleast_1d(theta_vec[idx])))
        mu, sig = gp.eval_model(x_exa)[:2]
        splt.plot_surr(axes[k + 1], x_exa, f_exa, x_eval, fval, mu, sig)
        axes[k + 1].set_title(rf"$\gamma = {gamma_vec[idx]:.3f}$")

    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"saved {out_png}")
    return gamma_vec, lkd_vals, idx_max


if __name__ == "__main__":
    main()
