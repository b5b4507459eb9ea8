"""2-D marginal-likelihood contour debug plot.

Reference: GpHparaOptz.plt_debug_lkd
(/root/reference/gpgradpy/src/optz/GpHparaOptz.py:233-289) -- a 10x10
double Python loop of likelihood evaluations over the first two
hyperparameters, min-max normalized, contourf'd with the multistart points
(red squares) and the optimum (magenta star) overlaid.

TPU-native version: the whole grid is ONE jitted vmapped batch through the
same ``neg_mll`` the optimizer uses (fit/multistart._jit_batch_nll), so the
n_grid^2 evaluations cost one device dispatch; any pair of hp-vector
components can be scanned (the reference hardcodes hp 0/1), the remaining
components held at a base point (the current fit by default).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lkd_grid(gp, dims=(0, 1), n_grid=10, base_hp_vec=None, bounds=None,
             i_optz=0):
    """Evaluate the negative MLL on an n_grid x n_grid log10-space grid over
    hp-vector components ``dims``; returns (vec_i, vec_j, lkd_val) with
    lkd_val[i, j] at (vec_j[j], vec_i[i]) (meshgrid 'xy' layout, like the
    reference).  ``i_optz`` selects that optimization round's
    history-dependent hp bounds (the window the reference's optz_bound
    argument carries, GpHparaOptz.py:233-289)."""
    from ..fit import multistart

    cfg, spec, info = gp.cfg, gp.spec, gp.hp_info_optz_lkd
    if bounds is None:
        b = multistart.get_hp_bounds(cfg, info, gp.history, i_optz)
        lb, ub = np.asarray(b.box_lb), np.asarray(b.box_ub)
    else:
        lb, ub = map(np.asarray, bounds)
    if base_hp_vec is None:
        if getattr(gp, "hp_vals", None) is not None:
            from ..types import hypers_to_hp_vec
            base_hp_vec = np.asarray(hypers_to_hp_vec(info, gp.hp_vals))
        else:
            base_hp_vec = 0.5 * (lb + ub)
    base_hp_vec = np.asarray(base_hp_vec, float)

    i, j = dims
    vec_i = np.linspace(lb[i], ub[i], n_grid)
    vec_j = np.linspace(lb[j], ub[j], n_grid)
    Xi, Xj = np.meshgrid(vec_i, vec_j)          # (n_grid, n_grid)

    grid = np.tile(base_hp_vec, (n_grid * n_grid, 1))
    grid[:, i] = Xi.ravel()
    grid[:, j] = Xj.ravel()

    dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    batch_nll = multistart._jit_batch_nll(cfg, spec, info)
    vals = batch_nll(jnp.asarray(grid, dt), gp.data, gp._eta_for_core())
    lkd_val = np.asarray(vals, float).reshape(n_grid, n_grid)
    return vec_i, vec_j, lkd_val


def plt_debug_lkd(gp, i_optz=0, dims=(0, 1), n_grid=10, hp_x0=None,
                  hp_optz=None, base_hp_vec=None, path=None, show=False):
    """Contour plot of the (min-max normalized) negative MLL over two
    hyperparameters, with multistart points and the optimum overlaid.

    ``hp_x0``: (n_start, n_hp) starts in optimization (log10) space;
    ``hp_optz``: (n_hp,) the fitted optimum.  Saves to ``path`` if given.
    """
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vec_i, vec_j, lkd_val = lkd_grid(gp, dims, n_grid, base_hp_vec,
                                     i_optz=i_optz)
    finite = np.isfinite(lkd_val)
    if finite.any():
        lo, hi = np.nanmin(lkd_val[finite]), np.nanmax(lkd_val[finite])
        norm = (lkd_val - lo) / max(hi - lo, 1e-300)
    else:
        # whole grid non-finite (e.g. every Cholesky failed): still render
        # the debug plot rather than crash exactly when it is most needed
        norm = np.zeros_like(lkd_val)

    Xi, Xj = np.meshgrid(10.0 ** vec_i, 10.0 ** vec_j)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.set_title(f"i optz = {i_optz}")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(rf"$\gamma_{{{dims[0] + 1}}}$")
    ax.set_ylabel(rf"$\gamma_{{{dims[1] + 1}}}$", rotation=0)
    ax.grid(True)
    cs = ax.contourf(Xi, Xj, norm, cmap="viridis")
    if hp_x0 is not None:
        hp_x0 = np.atleast_2d(np.asarray(hp_x0, float))
        ax.plot(10.0 ** hp_x0[:, dims[0]], 10.0 ** hp_x0[:, dims[1]], "rs")
    if hp_optz is not None:
        hp_optz = np.asarray(hp_optz, float)
        ax.plot(10.0 ** hp_optz[dims[0]], 10.0 ** hp_optz[dims[1]], "m*",
                markersize=12)
    fig.colorbar(cs)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    if show:
        plt.show()
    plt.close(fig)
    return lkd_val
