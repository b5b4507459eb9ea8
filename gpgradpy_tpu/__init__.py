"""gpgradpy_tpu: a TPU-native gradient-enhanced Gaussian-process framework.

Built from scratch on JAX/XLA/Pallas with the capability set of the reference
library marchildon/gpgradpy (gradient-enhanced GPs with the preconditioned /
rescaled well-conditioning schemes), extended with vmapped multistart MAP
fitting, NUTS/VI/SMC hyperparameter posteriors sharded over device meshes,
and a Bayesian-optimization loop.
"""

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
