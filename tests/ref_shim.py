"""Import the reference library (read-only, /root/reference) for golden-value
parity tests.

The reference depends on numba (jit decorators on its assembly loops) and smt
(LHS sampling), neither of which is installed here.  Both are shimmed with
behavior-preserving stand-ins: numba.jit becomes a no-op decorator (the loops
run as plain numpy) and smt's LHS is backed by scipy.stats.qmc.  No reference
code is copied -- it is executed in place as the oracle.
"""

import sys
import types

import numpy as np


def _install_numba_stub():
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        def deco(fn):
            return fn
        return deco

    numba.jit = jit
    numba.njit = jit
    sys.modules["numba"] = numba


def _install_smt_stub():
    if "smt.sampling_methods" in sys.modules:
        return
    from scipy.stats import qmc

    class LHS:
        def __init__(self, xlimits=None, random_state=None, **kw):
            self.xlimits = np.asarray(xlimits)
            self.random_state = random_state

        def __call__(self, n):
            d = self.xlimits.shape[0]
            sampler = qmc.LatinHypercube(d=d, seed=self.random_state)
            u = sampler.random(n)
            lo, hi = self.xlimits[:, 0], self.xlimits[:, 1]
            return lo + u * (hi - lo)

    smt = types.ModuleType("smt")
    sm = types.ModuleType("smt.sampling_methods")
    sm.LHS = LHS
    smt.sampling_methods = sm
    sys.modules["smt"] = smt
    sys.modules["smt.sampling_methods"] = sm


def load_reference():
    """Returns the reference GaussianProcess class, or None if unavailable."""
    _install_numba_stub()
    _install_smt_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from gpgradpy.src import GaussianProcess  # noqa
        return GaussianProcess
    except Exception as e:  # pragma: no cover
        print(f"reference unavailable: {e}")
        return None
