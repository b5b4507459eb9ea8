"""Instrumented single-start BO run to diagnose the exploitation cascade.

Run:  PYTHONPATH= python scratch/diag_bo.py --seed 0 --n-iter 100
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from functools import partial  # noqa: E402

from gpgradpy_tpu.bo import loop, problems  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--n-iter", type=int, default=100)
ap.add_argument("--dim", type=int, default=5)
ap.add_argument("--exploit-frac", type=float, default=0.5)
ap.add_argument("--wellcond", default="precon")
ap.add_argument("--dtype", default="float64")
args = ap.parse_args()

d = args.dim
obj = partial(problems.rosenbrock, a=10.0)
lb = np.full(d, -2.0)
ub = np.full(d, 2.0)

t0 = time.time()
trace = loop.run_bo(obj, lb, ub, args.n_iter, n_init=d + 2,
                    wellcond_mtd=args.wellcond, acq="ei",
                    exploit_frac=args.exploit_frac, exploit_local=True,
                    seed=args.seed, verbose=True,
                    gp_options={"dtype": args.dtype})
m = trace.merit_all[np.isfinite(trace.merit_all)]
o = trace.opt_all[np.isfinite(trace.opt_all)]
print(f"TOTAL {time.time()-t0:.1f}s  best merit {np.min(m):.3e}  "
      f"best opt {np.min(o):.3e}")
