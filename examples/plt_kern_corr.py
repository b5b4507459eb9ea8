#!/usr/bin/env python3
"""Kernel correlation plots: k(r), k'(r), -k''(r) for the three kernel
families.  Equivalent of /root/reference/gpgradpy/plt/plt_kern_corr.py
(closed-form 1-D correlations :54-60), computed via autodiff of the scalar
kernel instead of hand-written formulas."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from gpgradpy_tpu.ops import kernels  # noqa: E402


def main(out_png="plt_kern_corr.png"):
    r = np.linspace(-4, 4, 401)
    theta = jnp.ones(1)
    cases = [("SqExp", None), ("Ma5f2", None), ("RatQu", 2.0)]

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for ktype, alpha in cases:
        def k(ri):
            return kernels.scalar_kernel(ktype, jnp.asarray([ri]),
                                         jnp.zeros(1), theta, alpha)

        kv = jax.vmap(k)(jnp.asarray(r))
        dk = jax.vmap(jax.grad(k))(jnp.asarray(r))
        d2k = jax.vmap(jax.grad(jax.grad(k)))(jnp.asarray(r))
        axes[0].plot(r, kv, label=ktype)
        axes[1].plot(r, dk, label=ktype)
        axes[2].plot(r, -np.asarray(d2k), label=ktype)

    for ax, title in zip(axes, ["$k(r)$", "$k'(r)$", "$-k''(r)$"]):
        ax.set_title(title)
        ax.set_xlabel("r")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"saved {out_png}")


if __name__ == "__main__":
    main()
