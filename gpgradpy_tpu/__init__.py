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
# processes makes warm startup near-instant.  CPU-forced processes (tests,
# the BO trace campaign workers) get a SEPARATE cache directory keyed by
# this host's CPU feature set: CPU AOT code embeds ISA extensions
# (avx512/amx), so entries must never be shared across hosts with different
# flags (SIGILL risk) nor mixed with code produced by the remote compile
# service.  Keying the directory on a fingerprint of /proc/cpuinfo flags
# makes reuse safe while letting N campaign workers share one compile of
# the (identical) multistart fit program per shape bucket.
def _cpu_fingerprint():
    """Hash of BOTH the cpuinfo flags line and the model name.  The flags
    cover the ISA extensions AOT code may use; the model name covers
    model-keyed LLVM/XLA tuning features (e.g. prefer-no-gather on some
    Xeons) that are embedded in the AOT result but invisible in the flags
    -- two hosts with identical flags but different models produced
    mismatched-target AOT loads in round 4.  Returns None when cpuinfo is
    unreadable: the caller must then SKIP the persistent cache entirely
    (an 'unknown' shared directory would reintroduce the cross-host SIGILL
    risk this key exists to prevent)."""
    try:
        model = flags = ""
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name") and not model:
                    model = line
                elif line.startswith("flags") and not flags:
                    flags = line
                if model and flags:
                    break
        if flags:
            import hashlib
            return hashlib.sha1((model + flags).encode()).hexdigest()[:12]
    except OSError:
        pass
    return None


if _jax.config.jax_compilation_cache_dir is None:
    _cache = _os.environ.get(
        "GPGRADPY_TPU_JAX_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gpgradpy_tpu_jax"))
    if (_jax.config.jax_platforms or "") == "cpu":
        _fp = _cpu_fingerprint()
        _cache = None if _fp is None else _cache + "_cpu_" + _fp
    if _cache is not None:
        try:
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                               1.0)
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
