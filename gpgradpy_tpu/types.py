"""Core pytrees and static specs.

The reference carries all state on a mutable mixin object; here data,
hyperparameters and static shape/flag information are split into immutable
pytrees (traced) and frozen dataclasses (static jit args), so every function
in the library is jit/vmap/shard_map compatible.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class GpData(NamedTuple):
    """Training data (traced pytree).

    Mirrors the inputs of the reference ``set_data``
    (/root/reference/gpgradpy/src/GaussianProcess.py:219-300).
    ``grad`` has one row per *used* gradient (n_grad rows); ``std_*`` hold the
    known noise standard deviations or zeros when unknown/noise-free.
    """
    x: jnp.ndarray                      # (n_eval, dim)
    fval: jnp.ndarray                   # (n_eval,)
    std_fval: Optional[jnp.ndarray]     # (n_eval,) or None
    grad: Optional[jnp.ndarray]         # (n_grad, dim) or None
    std_grad: Optional[jnp.ndarray]     # (n_grad, dim) or None


class Hypers(NamedTuple):
    """Hyperparameter values (traced pytree); fields may be None.

    Mirrors HparaOptzVal (/root/reference/gpgradpy/src/base/GpHpara.py:12-19).
    """
    beta: Optional[jnp.ndarray] = None      # mean-function coefficients
    theta: Optional[jnp.ndarray] = None     # (dim,) inverse length-scales
    kernel: Optional[jnp.ndarray] = None    # extra kernel hp (RatQuad alpha)
    varK: Optional[jnp.ndarray] = None      # kernel variance
    var_fval: Optional[jnp.ndarray] = None  # noise variance on f
    var_fgrad: Optional[jnp.ndarray] = None # noise variance on grad f


@dataclass(frozen=True)
class DataSpec:
    """Static description of a dataset (hashable -> jit static arg).

    Derived in the facade from the raw inputs, mirroring the flag logic of
    the reference ``set_data`` (GaussianProcess.py:304-332).

    ``n_pad_eval`` > 0 means the arrays carry that many PADDING points after
    the real ones (shape bucketing so growing-dataset workloads like the BO
    loop reuse one compiled program).  Padded points are structurally masked
    out of the model: identity rows/cols in the covariance, zero mean-basis
    rows, zero data entries, and count corrections in the MLL -- the
    likelihood is exactly that of the unpadded dataset.
    """
    dim: int
    n_eval: int             # real evaluation points
    n_grad: int
    use_grad: bool
    known_eps_fval: bool
    known_eps_fgrad: bool
    b_fval_zero: bool       # known noise on f is (numerically) zero
    b_fgrad_zero: bool
    idx_grad: Optional[Tuple[int, ...]] = None  # which points contribute grads
    n_pad_eval: int = 0     # padding points appended after the real ones

    @property
    def n_eval_tot(self) -> int:
        return self.n_eval + self.n_pad_eval

    @property
    def n_data(self) -> int:
        """Real data count (MLL normalization)."""
        return self.n_eval + self.n_grad * self.dim

    @property
    def n_data_tot(self) -> int:
        """Padded matrix size."""
        return self.n_eval_tot + self.n_grad * self.dim

    @property
    def b_has_noisy_data(self) -> bool:
        return not (self.b_fval_zero and self.b_fgrad_zero)

    @property
    def b_optz_var_fval(self) -> bool:
        return not self.known_eps_fval

    @property
    def b_optz_var_fgrad(self) -> bool:
        return self.use_grad and not self.known_eps_fgrad

    @property
    def idx_grad_arr(self) -> Optional[np.ndarray]:
        if self.idx_grad is None:
            return None
        if self.n_pad_eval == 0 and len(self.idx_grad) == self.n_eval:
            return None
        # with padding, gradient rows must be selected explicitly even when
        # every real point contributes one (the x array has padded rows)
        return np.asarray(self.idx_grad, dtype=np.int32)

    def pad_mask(self) -> Optional[np.ndarray]:
        """(n_data_tot,) float mask: 1 for real entries, 0 for padding;
        None when there is no padding."""
        if self.n_pad_eval == 0:
            return None
        m = np.ones(self.n_data_tot)
        m[self.n_eval:self.n_eval_tot] = 0.0
        return m


def make_data_spec(dim: int, use_grad: bool, n_eval: int,
                   std_fval=None, std_grad=None,
                   bvec_use_grad=None, n_pad_eval: int = 0) -> DataSpec:
    """Host-side construction of the static spec from raw numpy inputs."""
    if use_grad:
        if bvec_use_grad is None:
            idx_grad = tuple(range(n_eval))
        else:
            idx_grad = tuple(int(i) for i in np.nonzero(np.asarray(bvec_use_grad))[0])
        n_grad = len(idx_grad)
    else:
        idx_grad = None
        n_grad = 0

    known_eps_fval = std_fval is not None and not np.any(np.isnan(std_fval))
    known_eps_fgrad = (use_grad and std_grad is not None
                       and not np.any(np.isnan(std_grad)))

    b_fval_zero = bool(known_eps_fval and np.max(std_fval) < 1e-10)
    if not known_eps_fval:
        b_fval_zero = False
    if not use_grad:
        b_fgrad_zero = True
    elif known_eps_fgrad:
        b_fgrad_zero = bool(np.max(std_grad) < 1e-10)
    else:
        b_fgrad_zero = False

    return DataSpec(dim=dim, n_eval=n_eval, n_grad=n_grad, use_grad=use_grad,
                    known_eps_fval=known_eps_fval,
                    known_eps_fgrad=known_eps_fgrad,
                    b_fval_zero=b_fval_zero, b_fgrad_zero=b_fgrad_zero,
                    idx_grad=idx_grad, n_pad_eval=n_pad_eval)


@dataclass(frozen=True)
class HpInfo:
    """Static layout of the flat hyperparameter optimization vector.

    Index layout [theta | kernel | varK | var_fval | var_fgrad] with per-entry
    log10 bits, mirroring HparaOptzInfo
    (/root/reference/gpgradpy/src/optz/GpHparaOptz.py:18-138).
    """
    dim: int
    has_theta: bool = True
    has_kernel: bool = False
    has_varK: bool = False
    has_var_fval: bool = False
    has_var_fgrad: bool = False
    log_theta: bool = True
    log_kernel: bool = True
    log_var: bool = True

    @property
    def n_hp(self) -> int:
        return (self.has_theta * self.dim + self.has_kernel + self.has_varK
                + self.has_var_fval + self.has_var_fgrad)

    @property
    def idx_theta(self):
        return np.arange(self.dim) if self.has_theta else np.array([], int)

    def _offset(self, field: str) -> int:
        off = self.has_theta * self.dim
        for name in ("kernel", "varK", "var_fval", "var_fgrad"):
            if name == field:
                return off
            off += getattr(self, f"has_{name}")
        raise KeyError(field)

    @property
    def idx_kernel(self):
        return self._offset("kernel") if self.has_kernel else None

    @property
    def idx_varK(self):
        return self._offset("varK") if self.has_varK else None

    @property
    def idx_var_fval(self):
        return self._offset("var_fval") if self.has_var_fval else None

    @property
    def idx_var_fgrad(self):
        return self._offset("var_fgrad") if self.has_var_fgrad else None

    @property
    def bvec_log(self) -> np.ndarray:
        bits = []
        if self.has_theta:
            bits += [self.log_theta] * self.dim
        if self.has_kernel:
            bits += [self.log_kernel]
        for has in (self.has_varK, self.has_var_fval, self.has_var_fgrad):
            if has:
                bits += [self.log_var]
        return np.asarray(bits, dtype=bool)


def hp_vec_to_hypers(info: HpInfo, hp_vec: jnp.ndarray) -> Hypers:
    """Undo the log10 parameterization and scatter into a Hypers pytree
    (reference GpHpara.hp_vec2dataclass, GpHpara.py:56-103).

    Differentiable: the 10**x transform is part of the traced graph, so
    ``jax.grad`` of any downstream scalar automatically includes the log10
    chain rule the reference applies by hand (OptzLkd.py:65-73).
    """
    bvec = jnp.asarray(info.bvec_log)
    vals = jnp.where(bvec, 10.0 ** hp_vec, hp_vec)
    theta = vals[: info.dim] if info.has_theta else None
    kernel = vals[info.idx_kernel] if info.has_kernel else None
    varK = vals[info.idx_varK] if info.has_varK else None
    var_fval = vals[info.idx_var_fval] if info.has_var_fval else None
    var_fgrad = vals[info.idx_var_fgrad] if info.has_var_fgrad else None
    return Hypers(beta=None, theta=theta, kernel=kernel, varK=varK,
                  var_fval=var_fval, var_fgrad=var_fgrad)


def hypers_to_hp_vec(info: HpInfo, hp: Hypers) -> jnp.ndarray:
    """Inverse of hp_vec_to_hypers (values -> optimization space)."""
    parts = []
    if info.has_theta:
        parts.append(jnp.atleast_1d(hp.theta))
    if info.has_kernel:
        parts.append(jnp.atleast_1d(hp.kernel))
    if info.has_varK:
        parts.append(jnp.atleast_1d(hp.varK))
    if info.has_var_fval:
        parts.append(jnp.atleast_1d(hp.var_fval))
    if info.has_var_fgrad:
        parts.append(jnp.atleast_1d(hp.var_fgrad))
    vec = jnp.concatenate(parts) if parts else jnp.zeros((0,))
    bvec = jnp.asarray(info.bvec_log)
    return jnp.where(bvec, jnp.log10(vec), vec)


def cast_float_tree(tree, dt):
    """Cast every floating-point leaf of a pytree to dtype ``dt`` (used by the
    mixed-precision predict/polish paths to promote f32-stored data/hypers to
    f64 inside a traced program)."""
    import jax

    def c(a):
        if (a is not None and hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dt):
            return a.astype(dt)
        return a
    return jax.tree_util.tree_map(c, tree)
