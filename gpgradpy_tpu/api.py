"""Stateful GaussianProcess facade over the functional TPU-native core.

Mirrors the public API of the reference facade
(/root/reference/gpgradpy/src/GaussianProcess.py): constructor signature,
``set_data`` / ``set_hpara`` / ``optz_hp`` / ``setup_eval_model`` /
``eval_model`` / ``eval_model_var``, hyperparameter containers, per-iteration
history with npz checkpointing, data rescaling, and the option surface
(exposed both as constructor kwargs and as mutable attributes, since the
reference's tests configure by attribute assignment, e.g.
unit_test/test_grad_lkd.py:109-110).
"""

from __future__ import annotations

import dataclasses
import time
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import GpConfig
from .fit import multistart, scipy_driver
from .fit.history import FitHistory
from .model import conditioning, likelihood, predict, rescale
from .ops import rtensor
from .types import (DataSpec, GpData, HpInfo, Hypers, hp_vec_to_hypers,
                    hypers_to_hp_vec, make_data_spec)

_CFG_FIELDS = {f.name for f in dataclasses.fields(GpConfig)}


@lru_cache(maxsize=256)
def _jit_lkd(cfg, spec, calc_cond):
    return jax.jit(lambda data, hp, eta: likelihood.calc_lkd(
        cfg, spec, data, hp, eta, calc_cond=calc_cond))


@lru_cache(maxsize=256)
def _jit_lkd_cast(cfg, spec, calc_cond):
    """Like _jit_lkd but promoting f32 data/hp to the cfg's (predict)
    precision inside the traced program — the polish-mode closed form."""
    from .types import cast_float_tree

    def run(data, hp, eta):
        dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        return likelihood.calc_lkd(cfg, spec, cast_float_tree(data, dt),
                                   cast_float_tree(hp, dt), eta,
                                   calc_cond=calc_cond)
    return jax.jit(run)


@lru_cache(maxsize=256)
def _jit_setup_eval(cfg, spec, calc_cond):
    return jax.jit(lambda data, hp, eta: predict.setup_eval(
        cfg, spec, data, hp, eta, calc_cond=calc_cond))


@lru_cache(maxsize=256)
def _jit_eval_model(cfg, spec, calc_grad, calc_hess):
    return jax.jit(lambda data, state, xq: predict.eval_model(
        cfg, spec, data, state, xq, calc_grad=calc_grad, calc_hess=calc_hess))


@lru_cache(maxsize=256)
def _jit_eval_var(cfg, spec, calc_grad, calc_hess):
    return jax.jit(lambda data, state, xq: predict.eval_model_var(
        cfg, spec, data, state, xq, calc_grad=calc_grad, calc_hess=calc_hess))


def _iter_kw(cfg):
    return dict(max_cg_iters=cfg.iter_max_cg, cg_tol=cfg.iter_cg_tol,
                row_block=cfg.iter_row_block)


@lru_cache(maxsize=64)
def _jit_closed_iter(cfg, spec, mesh):
    from .model import likelihood_iter
    return jax.jit(lambda data, hp, eta: likelihood_iter.closed_form_iterative(
        cfg, spec, data, hp, eta, mesh=mesh, **_iter_kw(cfg)))


@lru_cache(maxsize=64)
def _jit_setup_eval_iter(cfg, spec, mesh):
    from .model import predict_iter
    return jax.jit(lambda data, hp, eta: predict_iter.setup_eval_iterative(
        cfg, spec, data, hp, eta, mesh=mesh, **_iter_kw(cfg)))


@lru_cache(maxsize=64)
def _jit_eval_iter(cfg, spec, calc_grad, mesh):
    from .model import predict_iter

    def run(data, state, eta, xq):
        return predict_iter.eval_model_iterative(
            cfg, spec, data, state, eta, xq, calc_sig=True,
            calc_grad=calc_grad, mesh=mesh, **_iter_kw(cfg))

    return jax.jit(run)


class GaussianProcess:

    def __init__(self, dim: int, use_grad: bool,
                 kernel_type: str = "SqExp",
                 wellcond_mtd: str = "precon",
                 mean_fun_type: str = "poly_ord_0",
                 path_data_surr: str = "baye_data_surr",
                 surr_name: str = "obj_",
                 **config_overrides):
        assert isinstance(dim, int), "dim must be an integer"
        assert isinstance(use_grad, bool), "use_grad must be of type bool"
        assert isinstance(kernel_type, str), "kernel_type must be of type str"

        if wellcond_mtd is None:
            wellcond_mtd = "base"

        object.__setattr__(self, "_overrides", {})
        self._overrides.update(
            dim=dim, use_grad=use_grad, kernel_type=kernel_type,
            wellcond_mtd=wellcond_mtd, mean_fun_type=mean_fun_type,
            **config_overrides)
        self._cfg_cache = None

        self.path_data_surr = path_data_surr
        self.surr_name = surr_name
        self.path_surr_npz = path_data_surr + ".npz"
        self.path_surr_txt = path_data_surr + ".txt"

        self.spec: Optional[DataSpec] = None
        self.data: Optional[GpData] = None
        self.hp_vals: Optional[Hypers] = None
        self.hp_info_optz_lkd: Optional[HpInfo] = None
        self.history: Optional[FitHistory] = None
        self.DataScl: Optional[rescale.Rescaling] = None
        self._eval_state = None
        self._hp_vals_model_setup = None
        self._eta_Kbase = self._eta_Kgrad = self._etaK = np.nan
        self._vmin_init = np.nan
        self._vmin_req_grad = np.nan
        self._time_chofac = 0.0
        self._fit_seed = 1

    # ------------------------------------------------------------------
    # config plumbing: option surface as mutable attributes
    # ------------------------------------------------------------------

    def __setattr__(self, name, value):
        if name in _CFG_FIELDS:
            self._overrides[name] = value
            object.__setattr__(self, "_cfg_cache", None)
        else:
            object.__setattr__(self, name, value)

    def __getattr__(self, name):
        # only called when normal lookup fails
        if name in _CFG_FIELDS:
            return getattr(self.cfg, name)
        raise AttributeError(name)

    @property
    def cfg(self) -> GpConfig:
        if self._cfg_cache is None:
            ov = dict(self._overrides)
            for rng in ("hp_theta_range", "hp_varK_range", "hp_var_fval_range",
                        "hp_var_fgrad_range"):
                if rng in ov:
                    ov[rng] = tuple(ov[rng])
            object.__setattr__(self, "_cfg_cache", GpConfig(**ov))
        return self._cfg_cache

    @property
    def dtype(self):
        return jnp.float64 if self.cfg.dtype == "float64" else jnp.float32

    @property
    def _predict_dtype(self):
        """Dtype of the predict path: query points must be cast with THIS
        (casting to the f32 FIT dtype in polish mode would truncate query
        coordinates to ~1e-7 relative precision before the f64 predict
        program re-promotes them)."""
        return (jnp.float64 if self.cfg_predict.dtype == "float64"
                else jnp.float32)

    @property
    def cfg_predict(self) -> GpConfig:
        """Config the predict path (and closed-form beta/varK) runs under.
        With polish enabled the model is evaluated in f64 at the tighter
        polish condition target even though the main fit ran in f32."""
        cfg = self.cfg
        if cfg.polish_cond_target:
            self._require_x64("polish_cond_target")
            return dataclasses.replace(
                cfg, dtype="float64", cond_max_target=cfg.polish_cond_target,
                use_pallas=False)
        if cfg.n_refine_predict:
            self._require_x64("n_refine_predict")
        return cfg

    @staticmethod
    def _require_x64(option: str):
        """The f64 polish/refine paths silently degrade to f32 without x64
        (cast_float_tree(..., float64) becomes a no-op), which at a tight
        cond target is WORSE than the plain f32 path -- fail loudly."""
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                f"{option} requires jax_enable_x64: without it the 'f64' "
                f"re-fit/predict actually runs f32 at the tight condition "
                f"target, which destabilizes the Cholesky.  Enable it with "
                f"jax.config.update('jax_enable_x64', True) before creating "
                f"arrays, or unset {option}.")

    def _eta_for_predict(self) -> float:
        cfg = self.cfg
        if cfg.polish_cond_target:
            return float(conditioning.calc_etaK(self.cfg_predict, self.n_eval))
        return self._eta_for_core()

    # convenience mirrors of derived reference attributes
    @property
    def b_use_cond_cstr(self):
        return self.cfg.b_use_cond_cstr

    @property
    def b_use_data_scl(self):
        return self.cfg.b_use_data_scl

    @property
    def b_has_noisy_data(self):
        return None if self.spec is None else self.spec.b_has_noisy_data

    @property
    def n_data(self):
        return self.spec.n_data

    @property
    def n_beta_coeff(self):
        return self.cfg.n_beta_coeff

    # ------------------------------------------------------------------
    # data ingestion (reference set_data, GaussianProcess.py:219-363)
    # ------------------------------------------------------------------

    def set_data(self, x_eval, fval, std_fval=None, grad=None, std_grad=None,
                 bvec_use_grad=None):
        cfg = self.cfg
        x_eval = np.asarray(x_eval, float)
        fval = np.atleast_1d(np.asarray(fval, float)).ravel()
        n_eval = fval.size
        assert x_eval.ndim == 2, "x_eval must be a 2D array"
        assert x_eval.shape[0] == n_eval, "x_eval/fval size mismatch"
        if grad is not None:
            grad = np.asarray(grad, float)
            assert cfg.use_grad, "grad provided but use_grad is False"
        else:
            assert not cfg.use_grad, "use_grad is True but no grad provided"

        if std_fval is not None and np.any(np.isnan(std_fval)):
            std_fval = None
        if std_grad is not None and np.any(np.isnan(std_grad)):
            std_grad = None

        self.n_eval = n_eval
        self._x_eval_in = x_eval
        self._fval_in = fval
        self._std_fval_in = None if std_fval is None else np.asarray(std_fval, float).ravel()
        self._grad_in = grad
        self._std_grad_in = None if std_grad is None else np.asarray(std_grad, float)
        self.bvec_use_grad = bvec_use_grad

        n_pad = 0
        if cfg.pad_n_eval_multiple > 1 and cfg.solver != "iterative":
            # the iterative path masks missing-gradient rows structurally but
            # keeps shapes static via its own full layout -- no bucketing.
            # Rescaled frames pad fine: _refresh_core_data pads AFTER the
            # frame transform and the assembly masks the padded rows, so the
            # vreq/vmin computations (which use the unpadded x) are unchanged
            n_pad = (-n_eval) % cfg.pad_n_eval_multiple
        if cfg.solver == "dense_dist":
            # auto-pad so n_data_tot lands on the mesh.size * dist_chol_block
            # grid the distributed blocked Cholesky factorizes over
            # (parallel/chol_dist.py grid contract).  Padding points add ONE
            # identity row each (value row, no gradient rows -- DataSpec
            # layout), so any n_data_tot can be reached exactly; the padded
            # rows are masked like bucket padding (tests/test_padding.py)
            # and callers no longer size their data by hand.  Applied on top
            # of any bucket padding so shape bucketing keeps working.
            if bvec_use_grad is None:
                n_grad_rows = cfg.dim * n_eval if cfg.use_grad else 0
            else:
                n_grad_rows = cfg.dim * int(
                    np.count_nonzero(np.asarray(bvec_use_grad)))
            grid = self._iter_mesh().size * cfg.dist_chol_block
            n_rows = n_eval + n_grad_rows + n_pad
            n_pad += (-n_rows) % grid
        self.spec = make_data_spec(cfg.dim, cfg.use_grad, n_eval,
                                   std_fval=self._std_fval_in,
                                   std_grad=self._std_grad_in,
                                   bvec_use_grad=bvec_use_grad,
                                   n_pad_eval=n_pad)
        self.n_grad = self.spec.n_grad

        # nugget bounds (GaussianProcess.py:331-332)
        self._eta_Kbase, self._eta_Kgrad = conditioning.calc_nugget(cfg, n_eval)
        self._etaK = self._eta_Kgrad if cfg.use_grad else self._eta_Kbase
        self._vmin_init = float(rtensor.calc_dist_min(jnp.asarray(x_eval))) \
            if n_eval > 1 else np.nan

        self.hp_info_optz_lkd = self.set_hp_optz_info()

        # rescaling frame (GaussianProcess.py:342-363)
        if cfg.b_use_data_scl:
            if cfg.wellcond_mtd == "rescale_origin":
                dist_set = conditioning.calc_mtd_rescale_origin_vreq(n_eval, cfg.dim)
                self._vmin_req_grad = dist_set
                method = "set_vmin"
            elif cfg.wellcond_mtd == "rescale_eta_vary":
                dist_set, method = cfg.vmin_rescale_eta_vary, "set_vmin"
            elif cfg.wellcond_mtd == "dflt_vmin":
                dist_set, method = cfg.cond_dist_min_dflt, "set_vmin"
            else:  # dflt_vmax
                dist_set, method = cfg.cond_dist_max_dflt, "set_vmax"
            self.DataScl = rescale.Rescaling(x_eval, x_scl_method=method,
                                             dist_set=dist_set)
            self.DataScl.set_obj_data(fval, self._std_fval_in, grad,
                                      self._std_grad_in)
        else:
            self.DataScl = None

        self._refresh_core_data()
        self._eval_state = None

    def _refresh_core_data(self):
        """Rebuild the jnp GpData pytree in the working (scaled) frame."""
        dt = self.dtype
        if self.DataScl is not None:
            x = self.DataScl.get_scl_x()
            f, std_f, g, std_g = self.DataScl.get_scl_obj_data()
        else:
            x, f = self._x_eval_in, self._fval_in
            std_f, g, std_g = self._std_fval_in, self._grad_in, self._std_grad_in

        # note: grad arrives with one row per USED gradient already
        # (reference set_data semantics, GaussianProcess.py:254)
        n_pad = self.spec.n_pad_eval
        if n_pad:
            x = np.concatenate([np.asarray(x), np.tile(np.asarray(x)[:1],
                                                       (n_pad, 1))])
            f = np.concatenate([np.asarray(f), np.zeros(n_pad)])
            if std_f is not None:
                std_f = np.concatenate([np.asarray(std_f), np.zeros(n_pad)])
        self.data = GpData(
            x=jnp.asarray(x, dt), fval=jnp.asarray(f, dt),
            std_fval=None if std_f is None else jnp.asarray(std_f, dt),
            grad=None if g is None else jnp.asarray(g, dt),
            std_grad=None if std_g is None else jnp.asarray(std_g, dt))

    # ------------------------------------------------------------------
    # hyperparameter containers (GpHpara)
    # ------------------------------------------------------------------

    def make_hp_class(self, beta=None, theta=None, kernel=None, varK=None,
                      var_fval=None, var_fgrad=None) -> Hypers:
        def arr(v):
            return None if v is None else jnp.asarray(v, self.dtype)
        return Hypers(beta=arr(beta), theta=arr(theta), kernel=arr(kernel),
                      varK=arr(varK), var_fval=arr(var_fval),
                      var_fgrad=arr(var_fgrad))

    def set_custom_hp(self, beta=None, theta=None, kernel=None, varK=None,
                      var_fval=None, var_fgrad=None):
        if varK is not None:
            assert varK > 0, f"varK must be positive but it is {varK}"
        self.hp_vals = self.make_hp_class(beta, theta, kernel, varK,
                                          var_fval, var_fgrad)

    def hp_vec2dataclass(self, hp_optz_info: HpInfo, hp_vec) -> Hypers:
        return hp_vec_to_hypers(hp_optz_info, jnp.asarray(hp_vec, self.dtype))

    def set_hp_from_idx(self, i_optz: int):
        h = self.history
        assert h is not None, "init_optz_surr must be called first"
        var_fval = h.hp_var_fval[i_optz]
        var_fgrad = h.hp_var_fgrad[i_optz]
        self.hp_vals = self.make_hp_class(
            h.hp_beta[i_optz], h.hp_theta[i_optz],
            None if np.isnan(h.hp_kernel[i_optz]) else h.hp_kernel[i_optz],
            h.hp_varK[i_optz],
            None if np.isnan(var_fval) else var_fval,
            None if np.isnan(var_fgrad) else var_fgrad)

    def set_hp_optz_info(self) -> HpInfo:
        """Index layout for the numerically-optimized hyperparameters
        (GpHparaOptz.setup_hp_idx4optz, GpHparaOptz.py:187-196)."""
        cfg, spec = self.cfg, self.spec
        return HpInfo(dim=cfg.dim,
                      has_theta=True,
                      has_kernel=cfg.b_optz_hp_kernel and cfg.kernel_has_hp,
                      has_varK=spec.b_has_noisy_data,
                      has_var_fval=spec.b_optz_var_fval,
                      has_var_fgrad=spec.b_optz_var_fgrad,
                      log_theta=cfg.optz_log_hp_theta,
                      log_kernel=cfg.optz_log_hp_kernel,
                      log_var=cfg.optz_log_hp_var)

    setup_hp_idx4optz = set_hp_optz_info

    def get_init_hp_vals(self) -> Hypers:
        """Initial hyperparameters used while n_eval <= hp_const_n_eval
        (GpHparaOptz.get_init_hp_vals, GpHparaOptz.py:198-218)."""
        cfg, spec = self.cfg, self.spec
        theta = cfg.hp_theta_init * np.ones(cfg.dim)
        fval = np.asarray(self.data.fval)
        beta = np.zeros(cfg.n_beta_coeff)
        beta[0] = float(np.mean(fval))
        var_fval = None if spec.known_eps_fval else cfg.hp_var_fval_init
        var_fgrad = (None if (not cfg.use_grad or spec.known_eps_fgrad)
                     else cfg.hp_var_fgrad_init)
        return self.make_hp_class(beta, theta, cfg.hp_kernel_default,
                                  cfg.hp_varK_init, var_fval, var_fgrad)

    # ------------------------------------------------------------------
    # likelihood entry points (CalcLkd.calc_lkd_all equivalents)
    # ------------------------------------------------------------------

    def calc_lkd_all(self, hp_vals: Hypers, calc_lkd=True, calc_cond=False,
                     calc_grad=False):
        """Returns (LkdInfo, b_chofac_good)."""
        fn = _jit_lkd(self.cfg, self.spec, bool(calc_cond))
        lkd = fn(self.data, hp_vals, self._eta_for_core())
        return lkd, bool(lkd.ok)

    def _eta_for_core(self) -> float:
        return float(self._etaK)

    # ------------------------------------------------------------------
    # training (set_hpara / optz_hp)
    # ------------------------------------------------------------------

    def init_optz_surr(self, n_optz_max: int):
        self.history = FitHistory(n_optz_max, self.cfg.dim,
                                  self.cfg.n_beta_coeff)

    def finish_optz_surr(self, n_optz_final: int):
        assert self.history is not None
        self.history.finish(n_optz_final)

    def export_data_surr(self, save2file=True, file2save=None):
        assert self.history is not None
        path = (file2save or self.path_surr_npz) if save2file else None
        return self.history.export(path or "", self.surr_name) \
            if path else self.history.to_dict(self.surr_name)

    def load_data_surr(self, all_data=None, path=None):
        assert self.history is not None
        self.history.load(all_data if all_data is not None
                          else (path or self.path_surr_npz), self.surr_name)

    def store_new_para_surr(self, i_optz, hp_vals, surr_optz_info=None,
                            cond_val=np.nan, time_hp_optz=np.nan,
                            time_chofac=np.nan, time_pick_hp0=np.nan,
                            ln_lkd=np.nan):
        self.hp_vals = hp_vals
        if self.history is None:
            return
        self.history.store(
            i_optz, hp_vals, surr_optz_info, cond_val, self.cfg.cond_max,
            self._eta_Kbase, self._eta_Kgrad, self.cfg.use_grad,
            self._vmin_init, self._vmin_req_grad,
            None if self.DataScl is None else self.DataScl.xvec_scale,
            self._fval_in, ln_lkd, time_hp_optz, time_chofac, time_pick_hp0)

    def optz_hp(self, i_optz: int):
        """One hyperparameter-training round (GpHparaOptz.optz_hp,
        GpHparaOptz.py:140-185)."""
        cfg, spec = self.cfg, self.spec
        if self.n_eval <= cfg.hp_const_n_eval:
            hp_vals = self.get_init_hp_vals()
            lkd, _ = self.calc_lkd_all(hp_vals, calc_cond=True)
            self.store_new_para_surr(i_optz, hp_vals, None, float(lkd.cond))
            return

        t0 = time.time()
        if "rescale" in cfg.wellcond_mtd and cfg.cond_vreq_max_iter > 1:
            fit = self._optz_hp_rescale_loop(i_optz)
        else:
            fit = self._run_fit(i_optz)
        if cfg.polish_cond_target:
            fit = self._polish_fit(fit, i_optz)
        t_optz = time.time() - t0

        dtp = (jnp.float64 if self.cfg_predict.dtype == "float64"
               else self.dtype)
        hp_vals = hp_vec_to_hypers(self.hp_info_optz_lkd,
                                   jnp.asarray(fit.hp_vec, dtp))
        hp_vals = self._closed_form(hp_vals)
        # pull the hp pytree to host in one transfer before the per-field
        # history writes (scalar pulls are expensive on remote-TPU links)
        hp_host = jax.device_get(hp_vals)
        self.hp_vals = hp_vals
        if self.history is not None:
            self.history.store(
                i_optz, hp_host, fit.info, float(fit.cond),
                self.cfg.cond_max, self._eta_Kbase, self._eta_Kgrad,
                self.cfg.use_grad, self._vmin_init, self._vmin_req_grad,
                None if self.DataScl is None else self.DataScl.xvec_scale,
                self._fval_in, -float(fit.neg_lkd), t_optz,
                getattr(self, "_time_chofac_last", np.nan), np.nan)

    def plt_debug_lkd(self, i_optz=0, dims=(0, 1), n_grid=10, hp_x0=None,
                      hp_optz=None, path=None, show=False):
        """MLL 2-D contour debug hook (GpHparaOptz.plt_debug_lkd,
        GpHparaOptz.py:233-289): normalized negative-MLL contours over two
        hyperparameters with the starts/optimum overlaid -- the whole grid
        is one vmapped jitted batch instead of the reference's n^2 loop."""
        from .utils.lkd_contour import plt_debug_lkd as _plt
        return _plt(self, i_optz=i_optz, dims=dims, n_grid=n_grid,
                    hp_x0=hp_x0, hp_optz=hp_optz, path=path, show=show)

    def _iter_mesh(self):
        """1-D device mesh for the iterative solver's sharded matvecs (or
        None).  Cached: jit closures key on mesh identity."""
        if not (self.cfg.iter_use_mesh or self.cfg.solver == "dense_dist"):
            return None
        m = getattr(self, "_iter_mesh_cache", None)
        if m is None:
            from .parallel.sharded_matvec import make_data_mesh
            m = make_data_mesh()
            object.__setattr__(self, "_iter_mesh_cache", m)
        return m

    def _run_fit(self, i_optz, x0_override=None):
        cfg = self.cfg
        if cfg.solver == "iterative":
            from .fit import iterative_driver
            return iterative_driver.fit_map_iterative(
                cfg, self.spec, self.hp_info_optz_lkd, self.data,
                self._eta_for_core(), history=self.history, i_optz=i_optz,
                seed=self._fit_seed, x0_override=x0_override,
                mesh=self._iter_mesh())
        if cfg.solver == "dense_dist":
            from .fit import dense_dist_driver
            return dense_dist_driver.fit_map_dense_dist(
                cfg, self.spec, self.hp_info_optz_lkd, self.data,
                self._eta_for_core(), history=self.history, i_optz=i_optz,
                seed=self._fit_seed, x0_override=x0_override,
                mesh=self._iter_mesh(), hp_prev=self._prev_hp_vec())
        use_scipy = (cfg.optz_mtd in ("slsqp", "SLSQP", "trust-constr")
                     or cfg.b_use_cond_cstr)
        fitter = scipy_driver.fit_map_scipy if use_scipy else multistart.fit_map
        return fitter(cfg, self.spec, self.hp_info_optz_lkd, self.data,
                      self._eta_for_core(), history=self.history,
                      i_optz=i_optz, seed=self._fit_seed,
                      x0_override=x0_override, hp_prev=self._prev_hp_vec())

    def _prev_hp_vec(self):
        """Previous round's converged hp as an optimization-space vector (or
        None): joins the start-candidate pool of the next fit.  Guarded
        against layout changes (e.g. the noise regime toggling which
        hyperparameters are numeric) and non-finite leftovers."""
        if self.hp_vals is None:
            return None
        try:
            v = np.asarray(hypers_to_hp_vec(self.hp_info_optz_lkd,
                                            self.hp_vals), float)
        except (TypeError, ValueError):
            return None
        if v.size != self.hp_info_optz_lkd.n_hp or not np.all(np.isfinite(v)):
            return None
        return v

    def _polish_fit(self, fit, i_optz):
        """Warm single-start f64 re-fit at cfg.polish_cond_target.

        The TPU full-quality recipe: the f32 multistart at cond~1e6 finds the
        basin fast; ~15 emulated-f64 L-BFGS iterations at the tight target
        (e.g. 1e10) recover the f64-parity hyperparameters.  The final
        eigh-based condition number is skipped (f64 eigh costs minutes of
        XLA compile time on TPU); the main fit's cond is kept for telemetry.
        """
        from .types import cast_float_tree
        cfgp = dataclasses.replace(self.cfg_predict,
                                   optz_iter_max=self.cfg.polish_iter_max)
        data64 = cast_float_tree(self.data, jnp.float64)
        x0 = np.asarray(fit.hp_vec, np.float64)[None, :]
        fit2 = multistart.fit_map(
            cfgp, self.spec, self.hp_info_optz_lkd, data64,
            float(conditioning.calc_etaK(cfgp, self.n_eval)),
            history=self.history, i_optz=i_optz, x0_override=x0,
            with_cond=False)
        return fit2._replace(cond=fit.cond, info=fit.info)

    def _optz_hp_rescale_loop(self, i_optz):
        """Rescaling fixed-point outer loop
        (OptzLkd.optz_hp_max_lkd_mtd_rescale, OptzLkd.py:116-183)."""
        cfg = self.cfg
        fit = self._run_fit(i_optz)
        if self.n_eval <= 1:
            return fit

        info = self.hp_info_optz_lkd
        max_iter = cfg.cond_vreq_max_iter
        theta_all = np.full((max_iter, cfg.dim), np.nan)
        dist_all = np.full(max_iter, np.nan)
        scale_all = np.full((max_iter, cfg.dim), np.nan)

        best_hp = np.asarray(fit.hp_vec)
        theta_new = best_hp[:cfg.dim]          # log10 theta
        cnt = 0
        while True:
            theta_new, est_dist, xvec_new = self._rescale_w_theta_sol(theta_new)
            theta_all[cnt] = theta_new
            dist_all[cnt] = est_dist
            scale_all[cnt] = xvec_new
            if cnt == max_iter - 1 or est_dist < cfg.cond_vreq_iter_tol:
                break
            # warm-start the next inner fit from the previous best hp with
            # the rescaled theta as its single start (OptzLkd.py:165-168)
            warm = best_hp.copy()
            warm[:cfg.dim] = theta_new
            fit = self._run_fit(i_optz, x0_override=warm[None, :])
            best_hp = np.asarray(fit.hp_vec)
            theta_new = best_hp[:cfg.dim]
            cnt += 1

        idx = int(np.nanargmin(dist_all))
        self.DataScl.set_xscale_data(xvec_scale_in=scale_all[idx])
        self._refresh_core_data()
        final_hp = best_hp.copy()
        final_hp[:cfg.dim] = theta_all[idx]
        return fit._replace(hp_vec=jnp.asarray(final_hp))

    def _rescale_w_theta_sol(self, hp_theta_log):
        """GpWellCondVreq.rescaling_data_w_theta_sol (GpWellCond.py:42-76)."""
        cfg = self.cfg
        if cfg.optz_log_hp_theta:
            theta_sol = 10.0 ** np.asarray(hp_theta_log)
            log_theta = np.asarray(hp_theta_log)
        else:
            theta_sol = np.asarray(hp_theta_log)
            log_theta = np.log10(theta_sol)
        vreq = conditioning.calc_mtd_rescale_origin_vreq(self.n_eval, cfg.dim)

        x_scl = self.DataScl.get_scl_x()
        xvec_scale_v1 = self.DataScl.xvec_scale
        theta_star = 10.0 ** np.mean(log_theta)
        xvec_v2 = np.sqrt(theta_sol / theta_star)
        x_v2 = x_scl * xvec_v2[None, :]
        d2 = np.sqrt(np.sum((x_v2[:, None] - x_v2[None, :]) ** 2, -1))
        np.fill_diagonal(d2, np.inf)
        min_dist = max(float(d2.min()), 1e-15)
        correction = vreq / min_dist
        xvec_new = xvec_scale_v1 * xvec_v2 * correction

        dist2 = (np.dot(log_theta, log_theta)
                 - np.dot(log_theta, np.ones(cfg.dim)) ** 2 / cfg.dim)
        theta_est = np.ones(cfg.dim) * theta_star / correction ** 2
        theta_out = (np.log10(theta_est) if cfg.optz_log_hp_theta else theta_est)
        return theta_out, dist2, xvec_new

    def _closed_form(self, hp_vals: Hypers) -> Hypers:
        if self.cfg.solver == "iterative":
            fn = _jit_closed_iter(self.cfg, self.spec, self._iter_mesh())
            t0 = time.time()
            hp2 = jax.block_until_ready(
                fn(self.data, hp_vals, self._eta_for_core()))
            self._time_chofac_last = time.time() - t0
            self._time_chofac += self._time_chofac_last
            return hp2
        # closed-form beta/varK at the PREDICT precision/conditioning: these
        # feed the surrogate directly, so under polish they are recovered
        # from the f64 cond-target covariance, not the f32 fit one
        fn = _jit_lkd_cast(self.cfg_predict, self.spec, False)
        t0 = time.time()
        lkd = jax.block_until_ready(
            fn(self.data, hp_vals, self._eta_for_predict()))
        # time of one assembly+factorization dispatch at the final hp -- the
        # TPU-native observable closest to the reference's cumulative
        # in-optimizer Cholesky timer (Kernel.py:304-305), which cannot be
        # probed inside the fused XLA fit program
        self._time_chofac_last = time.time() - t0
        self._time_chofac += self._time_chofac_last
        varK = hp_vals.varK if self.spec.b_has_noisy_data else lkd.varK
        return hp_vals._replace(beta=lkd.beta, varK=varK)

    def set_hpara(self, method2set_hp: str, i_optz: int, hp_vals=None,
                  calc_cond: bool = False):
        """(GaussianProcess.set_hpara, GaussianProcess.py:365-395)."""
        assert isinstance(method2set_hp, str)
        if method2set_hp == "stored":
            assert i_optz >= 0
            self.set_hp_from_idx(i_optz)
        elif method2set_hp == "optz":
            self.optz_hp(i_optz)
        elif method2set_hp == "current":
            assert self.hp_vals is not None
        elif method2set_hp == "set":
            assert hp_vals is not None
            self.hp_vals = hp_vals
        else:
            raise ValueError(f"Unknown method2set_hp = {method2set_hp}")
        if self.hp_vals.beta is None or self.hp_vals.varK is None:
            self.hp_vals = self._closed_form(self.hp_vals)
        self.setup_eval_model(calc_cond=calc_cond)

    # ------------------------------------------------------------------
    # prediction (GpEvalModel equivalents)
    # ------------------------------------------------------------------

    def setup_eval_model(self, calc_cond: bool = False):
        assert self.hp_vals is not None, "hyperparameters not set"
        self._hp_vals_model_setup = self.hp_vals
        if self.cfg.solver == "iterative":
            # no factorization to probe for a condition number; the CG
            # residual/iteration telemetry lives on the state instead
            fn = _jit_setup_eval_iter(self.cfg, self.spec, self._iter_mesh())
            self._eval_state = fn(self.data, self.hp_vals,
                                  self._eta_for_core())
            self.condK = None
            return
        fn = _jit_setup_eval(self.cfg_predict, self.spec, bool(calc_cond))
        self._eval_state = fn(self.data, self.hp_vals,
                              self._eta_for_predict())
        self.condK = (float(self._eval_state.cond) if calc_cond else None)

    def _check_eval_ready(self):
        assert self._eval_state is not None, \
            "setup_eval_model() must be called before eval_model()"
        assert self.hp_vals is self._hp_vals_model_setup, \
            "Cannot change hp_vals between setup_eval_model() and eval_model()"

    def eval_model(self, x2model_in, calc_grad=False, calc_hess=False,
                   squeeze_nx=False):
        self._check_eval_ready()
        if calc_hess:
            assert calc_grad, "calc_hess requires calc_grad"
        xq = np.atleast_2d(np.asarray(x2model_in, float))
        nx = xq.shape[0]
        if squeeze_nx:
            assert nx == 1

        if self.DataScl is not None:
            xq = self.DataScl.x_init_2_scl(xq)

        if self.cfg.solver == "iterative":
            assert not calc_hess, \
                "iterative predict: Hessians not supported (use solver='dense')"
            fn = _jit_eval_iter(self.cfg, self.spec, bool(calc_grad),
                                self._iter_mesh())
            mu, sig, dmu, dsig = fn(self.data, self._eval_state,
                                    self._eta_for_core(),
                                    jnp.asarray(xq, self.dtype))
            d2mu = d2sig = None
        else:
            fn = _jit_eval_model(self.cfg_predict, self.spec, bool(calc_grad),
                                 bool(calc_hess))
            mu, sig, dmu, dsig, d2mu, d2sig = fn(
                self.data, self._eval_state,
                jnp.asarray(xq, self._predict_dtype))
        if self.DataScl is not None:
            mu, sig, dmu, dsig, d2mu, d2sig = self.DataScl.obj_scl_2_init(
                mu, sig, dmu, dsig, d2mu, d2sig)

        out = [np.asarray(v) if v is not None else None
               for v in (mu, sig, dmu, dsig, d2mu, d2sig)]
        if squeeze_nx:
            out = [None if v is None else v[0] for v in out]
        return tuple(out)

    def make_predict_fn(self, calc_grad: bool = False,
                        calc_hess: bool = False):
        """Serving path: returns a jitted callable ``xq -> (mu, sig, ...)``
        that closes over the device-resident factorization (no host round
        trips besides the query itself).  Rescaling frames are not supported
        here (use eval_model)."""
        self._check_eval_ready()
        assert self.DataScl is None, "make_predict_fn: no rescaling frames"
        data, state, dt = self.data, self._eval_state, self.dtype
        if self.cfg.solver == "iterative":
            assert not calc_hess, \
                "iterative predict: Hessians not supported (use solver='dense')"
            fni = _jit_eval_iter(self.cfg, self.spec, bool(calc_grad),
                                 self._iter_mesh())
            eta = self._eta_for_core()

            def predict_i(xq):
                mu, sig, dmu, dsig = fni(data, state, eta,
                                         jnp.asarray(xq, dt))
                return mu, sig, dmu, dsig, None, None

            return predict_i
        fn = _jit_eval_model(self.cfg_predict, self.spec, bool(calc_grad),
                             bool(calc_hess))

        def predict(xq):
            return fn(data, state, jnp.asarray(xq, dt))

        return predict

    def eval_model_var(self, x2model_in, calc_grad=False, calc_hess=False,
                       squeeze_nx=False):
        """Variance (not std) and derivatives.  Unlike the reference
        (GpEvalModel.py:256 raises for rescaled data), the rescaling frames
        are supported: var_init = var_scl / obj_scale^2 with 1/xvec_scale
        chain factors per x-derivative."""
        self._check_eval_ready()
        xq = np.atleast_2d(np.asarray(x2model_in, float))
        if squeeze_nx:
            assert xq.shape[0] == 1
        if self.DataScl is not None:
            xq = self.DataScl.x_init_2_scl(xq)
        if self.cfg.solver == "iterative":
            assert not calc_hess, \
                "iterative predict: Hessians not supported (use solver='dense')"
            fn = _jit_eval_iter(self.cfg, self.spec, bool(calc_grad),
                                self._iter_mesh())
            _, sig, _, dsig = fn(self.data, self._eval_state,
                                 self._eta_for_core(),
                                 jnp.asarray(xq, self.dtype))
            sig2 = sig ** 2
            dsig2 = None if dsig is None else 2.0 * sig[:, None] * dsig
            d2sig2 = None
        else:
            fn = _jit_eval_var(self.cfg_predict, self.spec, bool(calc_grad),
                               bool(calc_hess))
            sig2, dsig2, d2sig2 = fn(self.data, self._eval_state,
                                     jnp.asarray(xq, self._predict_dtype))
        out = [np.asarray(v) if v is not None else None
               for v in (sig2, dsig2, d2sig2)]
        if self.DataScl is not None:
            s = self.DataScl
            o2 = s.obj_scale ** 2
            if out[0] is not None:
                out[0] = out[0] / o2
            if out[1] is not None:
                out[1] = out[1] * (s.xvec_scale[None, :] / o2)
            if out[2] is not None:
                out[2] = out[2] * (np.outer(s.xvec_scale, s.xvec_scale)[None]
                                   / o2)
        if squeeze_nx:
            out = [None if v is None else v[0] for v in out]
        return tuple(out)

    def calc_model_mean_w_data_init(self, x2model_init, fval_init,
                                    grad_init=None, calc_grad: bool = True):
        """Posterior mean (and its x-gradient) using the CURRENT
        factorization and hyperparameters but a different data vector
        (GpEvalModel.calc_model_mean_w_data_init, GpEvalModel.py:384-393)."""
        self._check_eval_ready()
        xq = np.atleast_2d(np.asarray(x2model_init, float))
        fval = np.asarray(fval_init, float)
        if self.DataScl is not None:
            xq_s = self.DataScl.x_init_2_scl(xq)
            fval_s, _, grad_s, _ = self.DataScl.obj_init_2_scl(
                fval, None, grad_init, None)[:4]
        else:
            xq_s, fval_s, grad_s = xq, fval, grad_init
        return self.calc_model_mean_w_data_scl(xq_s, fval_s, grad_s,
                                               calc_grad=calc_grad)

    def calc_model_mean_w_data_scl(self, x2model_scl, fval_scl,
                                   grad_scl=None, calc_grad: bool = True):
        """Scaled-frame twin of ``calc_model_mean_w_data_init``: query point
        and data vector are already in the rescaling frame; results are
        mapped back to the init frame like the reference's
        GpEvalModel.calc_model_mean_w_data_scl (GpEvalModel.py:397-440).
        Without an active rescaling the two frames coincide.

        Note: the reference's implementation is broken as shipped -- it
        passes raw point arrays where its bound kernel expects an Rtensor
        (GpEvalModel.py:401 calls calc_KernGrad(x2model_scl, xeval_scl,
        theta) against e.g. sq_exp_calc_KernGrad(Rtensor, theta, hp_kernel),
        raising ValueError on the shape unpack).  This implements the
        intended semantics; tests/test_api_extras.py golden-checks it
        against the reference formula with the missing Rtensor step
        restored."""
        self._check_eval_ready()
        from .model.predict import _cross_cov
        from .ops import rtensor as _rt

        xq_s = np.atleast_2d(np.asarray(x2model_scl, float))
        fval_s = np.asarray(fval_scl, float)
        grad_s = grad_scl

        hp = self.hp_vals
        spec, cfg = self.spec, self.cfg
        data_vec = _rt.make_data_vec(
            jnp.asarray(fval_s, self.dtype),
            None if grad_s is None else jnp.asarray(grad_s, self.dtype))
        from .model import mean as _mean
        vand = _mean.calc_aug_vand(cfg.mean_fun_type, self.data.x,
                                   spec.use_grad, spec.idx_grad_arr)
        sol = self._eval_state.ops.solve(data_vec - vand @ hp.beta)

        Kyx, dKxy_dx = _cross_cov(cfg, spec, self.data.x,
                                  jnp.asarray(xq_s, self.dtype), hp)
        mval, mgrad, _ = _mean.eval_mean_fun(cfg.mean_fun_type,
                                             jnp.asarray(xq_s, self.dtype),
                                             hp.beta)
        mu = np.asarray(mval + Kyx.T @ sol)
        dmu = None
        if calc_grad:
            nx, dim = xq_s.shape
            dmu = np.asarray((dKxy_dx @ sol).reshape(dim, nx).T + mgrad)
        if self.DataScl is not None:
            mu, _, dmu = self.DataScl.obj_scl_2_init(mu, None, dmu)[:3]
        return mu, dmu

    # ------------------------------------------------------------------
    # Bayesian hyperparameter posteriors (additive capability)
    # ------------------------------------------------------------------

    def sample_posterior(self, n_chains: int = 8, n_warmup: int = 400,
                         n_samples: int = 400, max_depth: int = 8,
                         seed: int = 0, use_mesh: bool = False):
        """NUTS posterior over the numerically-optimized hyperparameters
        (box-uniform prior on the optimization-space vector within the
        current bounds).  Returns (hp_samples (chains, samples, n_hp) in
        VALUE space, diagnostics dict).  With ``use_mesh`` the chains are
        sharded over all local devices with pooled psum adaptation."""
        import jax as _jax
        from .fit.multistart import get_hp_bounds
        from .inference import nuts as _nuts

        cfg, spec, info = self.cfg, self.spec, self.hp_info_optz_lkd
        bounds = get_hp_bounds(cfg, info, self.history, 0)
        logpost, z_to_hp, hp_to_z = _nuts.make_gp_logpost(
            cfg, spec, info, self.data, self._eta_for_core(),
            bounds.box_lb, bounds.box_ub)

        if self.hp_vals is not None and self.hp_vals.theta is not None:
            from .types import hypers_to_hp_vec
            hp_vec0 = hypers_to_hp_vec(info, self.hp_vals)
            z_init = hp_to_z(jnp.asarray(hp_vec0, self.dtype))
        else:
            z_init = jnp.zeros(info.n_hp, self.dtype)
        rng = _jax.random.PRNGKey(seed)
        k_init, k_chains = _jax.random.split(rng)
        z0 = z_init[None, :] + 0.1 * _jax.random.normal(
            k_init, (n_chains, info.n_hp), self.dtype)
        keys = _jax.random.split(k_chains, n_chains)

        if use_mesh:
            from .parallel import mesh as _pm
            m = _pm.make_mesh()
            zs, diag = _pm.run_nuts_sharded(
                logpost, z0, keys, m, n_warmup=n_warmup,
                n_samples=n_samples, max_depth=max_depth)
        else:
            run = _jax.jit(_jax.vmap(lambda z, k: _nuts.run_nuts(
                logpost, z, k, n_warmup=n_warmup, n_samples=n_samples,
                max_depth=max_depth)))
            zs, diag = run(z0, keys)

        hp_vecs = _jax.vmap(_jax.vmap(z_to_hp))(zs)
        bvec = info.bvec_log
        hp_vals = np.array(hp_vecs, copy=True)
        hp_vals[..., bvec] = 10.0 ** hp_vals[..., bvec]
        return hp_vals, {k: np.asarray(v) for k, v in diag.items()}

    # ------------------------------------------------------------------
    # frames / data access (GaussianProcess.py:399-457)
    # ------------------------------------------------------------------

    def get_scl_x_w_dist(self):
        x = np.asarray(self.data.x)
        return x, np.asarray(rtensor.calc_rtensor(self.data.x, self.data.x))

    def x_init_2_scl(self, x):
        return x if self.DataScl is None else self.DataScl.x_init_2_scl(x)

    def x_scl_2_init(self, x):
        return x if self.DataScl is None else self.DataScl.x_scl_2_init(x)

    def get_init_eval_data(self):
        return self._fval_in, self._std_fval_in, self._grad_in, self._std_grad_in

    def get_scl_eval_data(self):
        if self.DataScl is None:
            return self.get_init_eval_data()
        return self.DataScl.get_scl_obj_data()

    def data_init_2_scl(self, *args, **kw):
        if self.DataScl is None:
            return args if args else None
        return self.DataScl.obj_init_2_scl(*args, **kw)

    def data_scl_2_init(self, *args, **kw):
        if self.DataScl is None:
            return args if args else None
        return self.DataScl.obj_scl_2_init(*args, **kw)

    # ------------------------------------------------------------------
    # observability (GpInfo equivalent; utils/info.py renders the tables)
    # ------------------------------------------------------------------

    def get_txt_info_surr(self, i_max: Optional[int] = None) -> str:
        from .utils.info import get_txt_info_surr
        return get_txt_info_surr(self, i_max)
