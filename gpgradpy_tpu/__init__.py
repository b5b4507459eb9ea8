"""gpgradpy_tpu: a TPU-native gradient-enhanced Gaussian-process framework.

Built from scratch on JAX/XLA/Pallas with the capability set of the reference
library marchildon/gpgradpy (gradient-enhanced GPs with the preconditioned /
rescaled well-conditioning schemes), extended with vmapped multistart MAP
fitting, NUTS/VI/SMC hyperparameter posteriors sharded over device meshes,
and a Bayesian-optimization loop.
"""

import os as _os

import jax as _jax

# persistent XLA compilation cache: compiles through the remote-TPU tunnel
# take minutes (f64-emulated eigh alone is ~2 min); caching them across
# processes makes warm startup near-instant.  NOT enabled for CPU-forced
# processes (tests): the remote compile service produces CPU AOT code with
# the remote host's ISA features (avx512/amx), which this host may lack --
# loading those entries risks SIGILL.
if (_jax.config.jax_compilation_cache_dir is None
        and (_jax.config.jax_platforms or "") != "cpu"):
    _cache = _os.environ.get(
        "GPGRADPY_TPU_JAX_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gpgradpy_tpu_jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # read-only fs etc. -- cache is best-effort
        pass

from .config import GpConfig  # noqa: F401
from .types import (  # noqa: F401
    DataSpec, GpData, HpInfo, Hypers, hp_vec_to_hypers, hypers_to_hp_vec,
    make_data_spec,
)

__version__ = "0.1.0"


def __getattr__(name):
    # heavier modules loaded lazily to keep import fast
    if name == "GaussianProcess":
        from .api import GaussianProcess
        return GaussianProcess
    raise AttributeError(name)
