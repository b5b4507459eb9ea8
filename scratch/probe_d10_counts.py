#!/usr/bin/env python3
"""Count SLSQP program evals for one d=10 Baseline fit at the checkpoint."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from functools import partial
from gpgradpy_tpu.api import GaussianProcess
from gpgradpy_tpu.bo import problems
from gpgradpy_tpu.fit import scipy_driver

z = np.load("results_data/full_d10/Rosen_a10_d10_Baseline_s0.npz",
            allow_pickle=True)
m = z["merit_all"]; n_done = int(np.isfinite(m).sum())
x = np.asarray(z["x_all"], float)[:n_done]
obj = partial(problems.rosenbrock, a=10.0)
f, g = obj(x)
dim = 10

gp = GaussianProcess(dim, True, "SqExp", "base",
                     pad_n_eval_multiple=8, cond_norm="fro")
gp.init_optz_surr(167)
gp.set_data(x, f, np.zeros(n_done), g, np.zeros((n_done, dim)))

t0 = time.time()
fit = scipy_driver.fit_map_scipy(gp.cfg, gp.spec, gp.hp_info_optz_lkd,
                                 gp.data, gp._eta_for_core(), seed=1)
t1 = time.time() - t0
print(f"fit(cold) {t1:.1f}s  tele={fit.info}", flush=True)
t0 = time.time()
fit = scipy_driver.fit_map_scipy(gp.cfg, gp.spec, gp.hp_info_optz_lkd,
                                 gp.data, gp._eta_for_core(), seed=2)
t1 = time.time() - t0
print(f"fit(warm) {t1:.1f}s  tele={fit.info}", flush=True)
