#!/usr/bin/env python3
"""Profile one explore-phase iteration of the d=10 Baseline trace at the
committed checkpoint's state: where do the ~300-600 s/iter go?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from functools import partial
from gpgradpy_tpu.api import GaussianProcess
from gpgradpy_tpu.bo import loop, problems

z = np.load("results_data/full_d10/Rosen_a10_d10_Baseline_s0.npz",
            allow_pickle=True)
m = z["merit_all"]; fin = np.isfinite(m); n_done = int(fin.sum())
x = np.asarray(z["x_all"], float)[:n_done]
obj = partial(problems.rosenbrock, a=10.0)
f, g = obj(x)
dim = 10
std_f = np.zeros(n_done); std_g = np.zeros((n_done, dim))

gp = GaussianProcess(dim, True, "SqExp", "base",
                     pad_n_eval_multiple=8, cond_norm="fro")
gp.init_optz_surr(167)

t0 = time.time()
gp.set_data(x, f, std_f, g, std_g)
t_sd = time.time() - t0
t0 = time.time()
gp.set_hpara("optz", 40)
t_fit = time.time() - t0
print(f"set_data {t_sd:.1f}s  fit(cold) {t_fit:.1f}s", flush=True)

t0 = time.time()
xn = loop.propose_next(gp, np.full(dim, -2.0), np.full(dim, 2.0),
                       float(f.min()), acq="ei", seed=123)
t_acq = time.time() - t0
print(f"propose_next(cold) {t_acq:.1f}s", flush=True)

# warm repeat: same bucket, one more datum
x2 = np.vstack([x, xn[None, :]])
f2, g2 = obj(x2)
t0 = time.time()
gp.set_data(x2, f2, np.zeros(n_done+1), g2, np.zeros((n_done+1, dim)))
gp.set_hpara("optz", 41)
t_fit2 = time.time() - t0
t0 = time.time()
xn2 = loop.propose_next(gp, np.full(dim, -2.0), np.full(dim, 2.0),
                        float(f2.min()), acq="ei", seed=124)
t_acq2 = time.time() - t0
print(f"warm same-bucket: fit {t_fit2:.1f}s  propose {t_acq2:.1f}s", flush=True)
