#!/usr/bin/env python3
"""Acquisition-function demo on the 1-D test problem: surrogate + UCB and EI
curves.  Equivalent of /root/reference/gpgradpy/plt/plt_acq.py (acquisition
definitions :36-41) using the library's first-class bo.acquisition module."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from examples.plt_surr_1d import calc_grad, calc_obj  # noqa: E402
from examples.surr_plt import SurrPlt  # noqa: E402
from gpgradpy_tpu import GaussianProcess  # noqa: E402
from gpgradpy_tpu.bo import acquisition  # noqa: E402


def main(use_grad=True, kernel_type="SqExp", wellcond_mtd="precon",
         out_png="plt_acq.png"):
    xmin, xmax = 2.5, 7.5
    x_eval = np.array([3.5, 4.5, 5.5, 6.5])[:, None]
    n_eval = x_eval.shape[0]
    x_exa = np.linspace(xmin, xmax, 500)[:, None]
    fval = calc_obj(x_eval)
    grad = calc_grad(x_eval)

    gp = GaussianProcess(1, use_grad, kernel_type, wellcond_mtd)
    gp.init_optz_surr(2)
    gp.set_data(x_eval, fval, np.zeros(n_eval),
                grad if use_grad else None,
                np.zeros((n_eval, 1)) if use_grad else None)
    gp.set_hpara("optz", 0)

    mu, sig = gp.eval_model(x_exa)[:2]
    acq_ucb, _ = acquisition.ucb(mu, sig, beta=2.0)
    acq_ei, _ = acquisition.expected_improvement(mu, sig, float(np.min(fval)))

    fig, axes = plt.subplots(2, 1, figsize=(7, 7), sharex=True,
                             height_ratios=[2, 1])
    splt = SurrPlt()
    splt.plot_surr(axes[0], x_exa, calc_obj(x_exa), x_eval, fval, mu, sig)
    splt.plot_acq(axes[1], x_exa, [np.asarray(acq_ucb), np.asarray(acq_ei)],
                  labels=[r"UCB ($\mu - 2\sigma$)", r"$-$EI"])
    axes[1].set_xlabel("x")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"saved {out_png}")


if __name__ == "__main__":
    main()
