"""Typed configuration for the TPU-native gradient-enhanced GP framework.

Mirrors the option surface of the reference facade
(/root/reference/gpgradpy/src/GaussianProcess.py:27-133) as a frozen,
hashable dataclass so it can be passed as a static argument through ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

KERNEL_TYPES = ("SqExp", "Ma5f2", "RatQu")

# Conditioning methods (reference GaussianProcess.py:84-89)
WELLCOND_MTD_AVAIL = (
    "base",              # only use a positive nugget
    "precon",            # diagonal preconditioner on the correlation matrix
    "rescale_origin",    # rescaling method, vmin depends on n_eval, const eta
    "rescale_eta_vary",  # rescaling with set vmin and variable eta
    "dflt_vmin",         # set min point distance to cond_dist_min_dflt
    "dflt_vmax",         # set max point distance to cond_dist_max_dflt
)


@dataclass(frozen=True)
class GpConfig:
    """Static configuration. All fields hashable -> usable as jit static arg."""

    # --- structural choices (reference __init__ args, GaussianProcess.py:138) ---
    dim: int = 1
    use_grad: bool = True
    kernel_type: str = "SqExp"
    wellcond_mtd: str = "precon"
    mean_fun_type: str = "poly_ord_0"   # 'poly_ord_0' or 'poly_ord_1'

    # --- hyperparameter optimization (reference :35-43) ---
    optz_mtd: str = "lbfgs"          # 'lbfgs' (vmapped, TPU-native) or 'slsqp' (scipy parity path)
    optz_n_x0: int = 5               # no. of multistarts (if lkd_optz_start_mtd == 'lhs')
    optz_iter_max: int = 250
    optz_tol_obj: float = 1e-12
    optz_tol_x: float = 1e-12

    optz_log_hp_theta: bool = True
    optz_log_hp_var: bool = True
    optz_log_hp_kernel: bool = True

    # --- marginal log-likelihood (reference :45-58) ---
    lkd_optz_start_mtd: str = "hp_best"   # 'hp_best' or 'lhs'
    lkd_hp_best_n_eval: int = 40

    lkd_varK_pnlt_use: bool = False
    lkd_varK_pnlt_lb_var: float = 0.1
    lkd_varK_pnlt_c1: float = 1.0
    lkd_varK_pnlt_c2: float = 10.0

    # --- hyperparameter init / ranges (reference :60-79) ---
    hp_const_n_eval: int = 1
    hp_lhs_bound_factor: float = 1e3
    hp_box_bound_factor: float = 1e5
    hp_median_n_idx: int = 5

    hp_theta_init: float = 1e-2
    hp_varK_init: float = 1.0
    hp_var_fval_init: float = 0.0
    hp_var_fgrad_init: float = 0.0

    hp_theta_range: Tuple[float, float] = (1e-18, 1e24)
    hp_varK_range: Tuple[float, float] = (1e-24, 1e14)
    hp_var_fval_range: Tuple[float, float] = (1e-8, 1e8)
    hp_var_fgrad_range: Tuple[float, float] = (1e-8, 1e8)

    # --- conditioning policy (reference :81-113) ---
    cond_eta_set_mtd: str = "Kbase_eta"   # 'Kbase_eta' | 'Kbase_eta_w_dim' | 'dflt_eta'
    cond_eta_is_const: bool = True
    cond_eta_dflt: float = 1e-8

    cond_max_target: float = 1e10
    cond_max: float = 1e10
    cond_max_abs: float = 1e16
    cond_norm: int = 2                    # 2 (spectral, eigh) or 'fro'
                                          # (Frobenius via Cholesky solves);
                                          # dispatched wherever the cond
                                          # number is evaluated
                                          # (GpHparaCon.py:135-261)

    cond_dist_min_dflt: float = 1.0
    cond_dist_max_dflt: float = 1.0

    cond_vreq_max_iter: int = 3
    vmin_rescale_eta_vary: float = 1.0
    cond_vreq_iter_tol: float = 1e-1

    # --- misc ---
    b_optz_hp_kernel: bool = True
    varK_min: float = 1e-32
    dtype: str = "float64"                # 'float64' (parity) or 'float32' (TPU fast path)
    n_refine_predict: int = 0             # mixed-precision prediction: assemble the
                                          # covariance in f64, factor in f32, and run
                                          # this many iterative-refinement steps on
                                          # every predict-path solve (needs
                                          # jax_enable_x64; meaningful with
                                          # dtype='float32' and cond<=~1e7)
    polish_cond_target: float = 0.0       # > 0: after the main (f32) multistart
                                          # fit, warm-start a single-start f64
                                          # re-fit at this condition target and
                                          # run the predict path in f64 at it
                                          # too.  The TPU full-quality recipe:
                                          # the cheap f32 fit at cond 1e6 finds
                                          # the basin, ~15 emulated-f64 L-BFGS
                                          # iterations at cond 1e10 recover the
                                          # f64-parity hyperparameters (needs
                                          # jax_enable_x64)
    polish_iter_max: int = 20             # L-BFGS iterations for the polish fit
    use_pallas: bool = True               # Pallas tiled covariance assembly on
                                          # TPU training paths (f32, full grad
                                          # set; ignored on CPU / f64 / partial
                                          # gradients -- see assembly.calc_kern).
                                          # Measured v5e (auto tile, branch
                                          # dispatch): n_data=8192 641 GB/s vs
                                          # 127 XLA; 4096 671 vs 214; 2048 485
                                          # vs 227; engages n_data>=2048
    pad_n_eval_multiple: int = 0          # shape bucketing: pad n_eval up to a
                                          # multiple so growing datasets (BO)
                                          # reuse one compiled program

    # --- large-n iterative solver (facade entry for SURVEY 5.7) ---
    solver: str = "dense"                 # 'dense' (Cholesky, O(n^3)),
                                          # 'iterative' (matrix-free CG+SLQ,
                                          # O(n^2) time / O(n*block) memory;
                                          # model/likelihood_iter.py), or
                                          # 'dense_dist' (mid-n direct:
                                          # distributed blocked Cholesky over
                                          # the device mesh,
                                          # fit/dense_dist_driver.py)
    iter_n_probes: int = 16               # Hutchinson/SLQ probe vectors
    iter_max_cg: int = 1024               # CG iteration cap: the diagonal
                                          # (precon-trick) preconditioner
                                          # needs ~sqrt(cond) iterations, so
                                          # ~1e3 at cond_max_target 1e6 (pair
                                          # the iterative solver with a
                                          # moderate cond target)
    iter_cg_tol: float = 1e-10            # CG relative-residual tolerance
    iter_row_block: int = 256             # covariance row-tile height
    iter_n_x0: int = 2                    # multistarts for the iterative fit
    iter_use_mesh: bool = False           # shard matvecs over all local
                                          # devices (point axis on a 1-D mesh;
                                          # mesh size must divide n_eval)
    dist_chol_block: int = 64             # block size of the distributed
                                          # blocked Cholesky (solver=
                                          # 'dense_dist'; n_data must be a
                                          # multiple of mesh.size * block --
                                          # use pad_n_eval_multiple)

    def __post_init__(self):
        assert self.kernel_type in KERNEL_TYPES, f"unknown kernel {self.kernel_type}"
        assert self.wellcond_mtd in WELLCOND_MTD_AVAIL, (
            f"Requested method not available, wellcond_mtd : {self.wellcond_mtd}"
        )
        # reference forces 'base' when gradients are off (GaussianProcess.py:202)
        if not self.use_grad and self.wellcond_mtd != "base":
            object.__setattr__(self, "wellcond_mtd", "base")
        assert self.solver in ("dense", "iterative", "dense_dist"), \
            f"unknown solver {self.solver}"
        if self.solver == "iterative":
            # dense-path-only features: polish re-fit (warm f64 Cholesky
            # refit) has no iterative analog; the Pallas dense assembly is
            # simply not reachable matrix-free, so drop it silently
            assert not self.polish_cond_target, (
                "solver='iterative' does not combine with polish_cond_target "
                "(a dense-factorization feature)")
            object.__setattr__(self, "use_pallas", False)
        if self.wellcond_mtd == "rescale_eta_vary":
            object.__setattr__(self, "cond_eta_is_const", False)

    # -- derived, mirrors reference set_wellcond_mtd (GaussianProcess.py:192-217)
    @property
    def b_use_cond_cstr(self) -> bool:
        return self.wellcond_mtd != "precon"

    @property
    def b_use_data_scl(self) -> bool:
        return ("rescale" in self.wellcond_mtd) or ("dflt_v" in self.wellcond_mtd)

    @property
    def kernel_has_hp(self) -> bool:
        return self.kernel_type == "RatQu"

    @property
    def hp_kernel_default(self) -> Optional[float]:
        return 2.0 if self.kernel_type == "RatQu" else None

    @property
    def hp_kernel_range(self) -> Tuple[float, float]:
        return (1e-3, 10.0) if self.kernel_type == "RatQu" else (float("nan"), float("nan"))

    @property
    def n_beta_coeff(self) -> int:
        if self.mean_fun_type == "poly_ord_0":
            return 1
        if self.mean_fun_type == "poly_ord_1":
            return 1 + self.dim
        raise ValueError(f"mean_fun_type = {self.mean_fun_type} not available")

    def replace(self, **kw) -> "GpConfig":
        return dataclasses.replace(self, **kw)
