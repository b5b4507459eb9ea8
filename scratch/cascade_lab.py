"""Exploitation-cascade lab: start from a localized dataset and run ONLY
exploit iterations; print merit / |x - x*| per iteration to measure the
contraction rate without paying for the exploration phase.

PYTHONPATH= python scratch/cascade_lab.py --n-iter 40
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
from gpgradpy_tpu.fit import lhs  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--n-iter", type=int, default=40)
ap.add_argument("--dim", type=int, default=5)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--e0", type=float, default=0.1,
                help="initial localization scale around x*")
ap.add_argument("--n-near", type=int, default=6)
args = ap.parse_args()

d = args.dim
obj = partial(problems.rosenbrock, a=10.0)
lb = np.full(d, -2.0)
ub = np.full(d, 2.0)
x_star = np.ones(d)
rng = np.random.default_rng(args.seed)

# post-exploration state: global LHS + a handful of near-optimum points
x_data = lhs.lhs_sample(20, lb, ub, seed=args.seed)
near = x_star[None, :] + args.e0 * rng.standard_normal((args.n_near, d)) \
    * (0.5 ** np.arange(args.n_near))[:, None]
x_data = np.vstack([x_data, near])
f_data, g_data = obj(x_data)

t0 = time.time()
state = {}
diam = float(np.linalg.norm(ub - lb))
rng_tr = np.random.default_rng(999)
for i in range(args.n_iter):
    dbg = {}
    fbest = float(np.min(f_data))
    x_new = loop._propose_local_exploit(
        x_data, f_data, g_data, lb, ub, "SqExp",
        n_local=min(x_data.shape[0], max(4, (d + 3) // 2 + 2)),
        dtype="float64", state=state, debug=dbg)
    dmin = float(np.min(np.linalg.norm(x_data - x_new[None, :], axis=1)))
    if dmin < loop._TR_FLOOR_REL * diam:
        delta = state.get("delta", diam)
        if delta <= 4.0 * loop._TR_FLOOR_REL * diam:
            print(f"it {i:3d}  FLOOR stop (dmin={dmin:.1e})")
            break
        state["delta"] = delta / 4.0
        u = rng_tr.standard_normal(d)
        u = u / max(np.linalg.norm(u), 1e-300)
        x_new = np.clip(state["x_inc"] + 0.5 * delta * u, lb, ub)
        dbg["branch"] = "ball"
    f_new, g_new = obj(x_new[None, :])
    step_len = float(np.linalg.norm(x_new - state["x_inc"]))
    if f_new[0] < fbest:
        state["delta"] = min(max(state["delta"], 4.0 * step_len), 0.25 * diam)
    else:
        state["delta"] = max(step_len / 4.0, loop._TR_FLOOR_REL * diam)
    e = np.linalg.norm(x_new - x_star)
    print(f"it {i:3d}  f={f_new[0]:9.3e}  e={e:9.3e}  "
          f"[{dbg.get('branch','?'):9s}] r_loc={dbg.get('r_loc', np.nan):.2e} "
          f"delta={dbg.get('delta', np.nan):.2e} "
          f"acc={dbg.get('n_accept', -1)} step={dbg.get('step_norm', np.nan):.2e}",
          flush=True)
    x_data = np.vstack([x_data, x_new[None, :]])
    f_data = np.concatenate([f_data, f_new])
    g_data = np.vstack([g_data, g_new])

print(f"TOTAL {time.time()-t0:.1f}s best f={np.min(f_data):.3e} "
      f"best e={np.min(np.linalg.norm(x_data - x_star, axis=1)):.3e}")
