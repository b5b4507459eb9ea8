#!/usr/bin/env python3
"""Production runner for the paper-parity BO quality traces.

Produces the Rosenbrock (a=10) gradient-enhanced BO traces for the
Baseline / Rescaling / Precondition conditioning methods in the exact npz
schema of the reference's bundled results
(/root/reference/gpgradpy/results/data_paper_precon/Rosen_a10_d{5,10}/,
loader semantics /root/reference/gpgradpy/results/PltOptzResults.py:44-57),
so `PltOptzResults` compares them head-to-head with the paper numbers.

Quality traces are a math property, not a speed benchmark: they are run on
the CPU backend in float64 (the reference's own environment was CPU
float64; TPU speed is measured separately by bench.py).  float64 is
REQUIRED -- without x64 the global surrogate runs f32, the exploration
phase never localizes the optimum, and the exploit cascade starves (the
round-1 full_d5 stall).

Worker mode (one (method, start) per process -- parallelize externally):
  python examples/run_paper_traces.py --dim 5 --worker Precondition 0
Merge mode (stack per-start npz into the reference schema):
  python examples/run_paper_traces.py --dim 5 --merge --out-dir results_data/full_d5
Summary mode (compare against the bundled reference traces):
  python examples/run_paper_traces.py --dim 5 --summary --out-dir results_data/full_d5
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# --platform tpu runs the f64 trace math on the TPU backend (emulated f64;
# cond_norm='fro' so no eigh program is ever built -- CLAUDE.md measurement
# notes).  Parse the flag before configuring jax: the platform choice must
# precede any jax usage.
_PLATFORM = "cpu"
if "--platform" in sys.argv:
    _PLATFORM = sys.argv[sys.argv.index("--platform") + 1]
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from gpgradpy_tpu.bo import loop, problems  # noqa: E402
from gpgradpy_tpu.results import PltOptzResults  # noqa: E402

REF_DATA = "/root/reference/gpgradpy/results/data_paper_precon"

WELLCOND_BY_METHOD = {
    "Baseline": "base",
    "Rescaling": "rescale_origin",
    "Precondition": "precon",
}
REF_FILES = {
    "Baseline": "Baye_Kern_SE_n500_Grad_T_None_all.npz",
    "Rescaling": "Baye_Kern_SE_n500_Grad_T_Vreq_all.npz",
    "Precondition": "Baye_Kern_SE_n500_Grad_T_Precon_all.npz",
}
METHODS = list(WELLCOND_BY_METHOD)


def start_path(out_dir, dim, method, j):
    return os.path.join(out_dir, f"Rosen_a10_d{dim}_{method}_s{j}.npz")


def all_path(out_dir, dim, method):
    return os.path.join(out_dir, f"Rosen_a10_d{dim}_{method}_all.npz")


def run_one(dim, method, j, n_iter, out_dir, seed0=0, variant="default",
            cond_norm=None):
    """One (method, start) trace.  variant:
    - 'default':   exploit cascade ON, local trust-region GP preconditioned
                   for every method (disclosed design choice: the local
                   solver is shared optimizer infrastructure; see STATUS.md)
    - 'honest':    exploit cascade ON, local GP runs the NAMED conditioning
                   end-to-end (per-method ablation)
    - 'noexploit': cascade OFF — pure EI through the named method, the
                   closest protocol to the reference's exploration-driven
                   traces (shows the paper's method contrast directly)
    - 'noexploit_lcb': cascade OFF with the reference's OWN acquisition —
                   the lower-confidence bound mu - 2 sigma (its plotting
                   driver defines UCB/LCB inline and has EI commented OUT,
                   plt_acq.py:113-132), probing whether the bundled traces'
                   deep merits come from the LCB's intrinsic exploitation
                   (docs/PARITY.md 'pure-EI gap')
    """
    obj = partial(problems.rosenbrock, a=10.0)
    lb, ub = np.full(dim, -2.0), np.full(dim, 2.0)
    path = start_path(out_dir, dim, method, j)
    kw = dict(exploit_frac=0.5, exploit_local=True, exploit_wellcond="precon")
    acq = "ei"
    if variant == "honest":
        kw["exploit_wellcond"] = None
    elif variant == "noexploit":
        kw = dict(exploit_frac=0.0, exploit_local=False)
    elif variant == "noexploit_lcb":
        kw = dict(exploit_frac=0.0, exploit_local=False)
        acq = "ucb"
    if _PLATFORM == "tpu":
        # coarse shape buckets (few expensive f64 TPU compiles, persistent
        # cache shared across starts).  NOTE: measured (round 3) the f64
        # emulation makes the sequential L-BFGS fit ~10-50x SLOWER than the
        # 2-core CPU at trace sizes -- keep trace campaigns on --platform
        # cpu; this mode exists for experimentation only.
        kw.setdefault("gp_options", {})["pad_n_eval_multiple"] = 32
        cond_norm = cond_norm or "fro"
    if cond_norm:
        # 'fro' = the Cholesky-based Frobenius condition number (the
        # reference's own cheap option, GpHparaCon.py:237-261): at d=10+
        # the spectral (eigh) cond costs seconds per SLSQP evaluation.
        # cond_fro >= cond_2, so the cond <= 1e10 constraint is
        # CONSERVATIVE w.r.t. the reference's spectral norm.
        kw.setdefault("gp_options", {})["cond_norm"] = cond_norm

    def cb(partial_trace, completed=False):
        np.savez(path, x_all=partial_trace.x_all,
                 merit_all=partial_trace.merit_all,
                 opt_all=partial_trace.opt_all,
                 fsb_all=partial_trace.fsb_all,
                 time_iter=partial_trace.time_iter,
                 variant=np.str_(variant),
                 completed=np.bool_(completed))

    # resume from a partial checkpoint (a worker killed mid-run, e.g. by a
    # round boundary): replay the recorded prefix instead of re-running it
    resume = None
    if os.path.isfile(path):
        try:
            z = np.load(path, allow_pickle=True)
            if "completed" in z and bool(z["completed"]):
                print(f"[{method} start {j}] already completed; skipping")
                return
            if z["merit_all"].size == dim + 2 + n_iter:
                resume = loop.BoTrace(
                    x_all=z["x_all"], merit_all=z["merit_all"],
                    opt_all=z["opt_all"], fsb_all=z["fsb_all"],
                    time_iter=z["time_iter"])
                n_fin = int(np.isfinite(z["merit_all"]).sum())
                print(f"[{method} start {j}] resuming from checkpoint "
                      f"({n_fin} evaluations recorded)")
            else:
                # a size mismatch means the run was re-launched with a
                # different --n-iter; falling through would let the fresh
                # run's first periodic checkpoint overwrite the recorded
                # progress.  Refuse instead of silently discarding it.
                raise SystemExit(
                    f"[{method} start {j}] checkpoint {path} holds "
                    f"{z['merit_all'].size - dim - 2} iterations but "
                    f"--n-iter {n_iter} was requested; re-run with "
                    f"--n-iter {z['merit_all'].size - dim - 2} to resume "
                    f"it, or delete the file to start fresh")
        except Exception as e:
            print(f"[{method} start {j}] checkpoint unreadable ({e}); "
                  f"starting fresh")

    t0 = time.time()
    trace = loop.run_bo(
        obj, lb, ub, n_iter, n_init=dim + 2,
        wellcond_mtd=WELLCOND_BY_METHOD[method], acq=acq,
        seed=seed0 + j, verbose=True, checkpoint_cb=cb,
        checkpoint_every=4, resume_trace=resume, **kw)
    cb(trace, completed=True)
    m = trace.merit_all[np.isfinite(trace.merit_all)]
    o = trace.opt_all[np.isfinite(trace.opt_all)]
    print(f"[{method} start {j}] done in {time.time()-t0:.0f}s: "
          f"best merit {np.min(m):.3e}, best opt {np.min(o):.3e}")


def merge(dim, out_dir, n_x0, methods):
    for method in methods:
        paths = [start_path(out_dir, dim, method, j) for j in range(n_x0)]
        paths = [p for p in paths if os.path.isfile(p)]
        if not paths:
            print(f"[merge] no per-start files for {method}; skipped")
            continue
        runs = [np.load(p) for p in paths]
        n_tot = max(r["merit_all"].size for r in runs)
        dim_x = runs[0]["x_all"].shape[1]

        def pad(a, fill=np.nan):
            out = np.full((len(runs),) + (n_tot,) + a(runs[0]).shape[1:], fill)
            for i, r in enumerate(runs):
                v = a(r)
                out[i, :v.shape[0]] = v
            return out

        x0_all = pad(lambda r: r["x_all"])
        merit = pad(lambda r: r["merit_all"])
        opt = pad(lambda r: r["opt_all"])
        fsb = pad(lambda r: r["fsb_all"])
        out = all_path(out_dir, dim, method)
        np.savez(out, x0_all=x0_all, merit_all=merit, opt_all=opt,
                 fsb_all=fsb, merit_wo_noise_all=merit,
                 opt_wo_noise_all=opt, fsb_wo_noise_all=fsb)
        print(f"[merge] {out}: {len(runs)} starts x {n_tot} iters "
              f"(dim {dim_x})")


def summary(dim, out_dir, methods):
    files = [os.path.basename(all_path(out_dir, dim, m)) for m in methods
             if os.path.isfile(all_path(out_dir, dim, m))]
    names = [m for m in methods if os.path.isfile(all_path(out_dir, dim, m))]
    if files:
        merit, opt, _ = PltOptzResults.load_npz_data(out_dir, files,
                                                     n_iter_max=None)
        mm, mo = PltOptzResults.summarize(merit, opt)
        for m, a, b in zip(names, mm, mo):
            print(f"[ours]  {m:13s}: best merit (median) = {a:.3e}, "
                  f"best ||grad|| (median) = {b:.3e}")
        PltOptzResults.plt_conv_nx0(
            merit, names, os.path.join(out_dir, f"conv_merit_d{dim}.png"),
            ylabel="merit")
        PltOptzResults.plt_conv_nx0(
            opt, names, os.path.join(out_dir, f"conv_opt_d{dim}.png"),
            ylabel=r"$\|\nabla f\|_2$")
    ref_dir = os.path.join(REF_DATA, f"Rosen_a10_d{dim}")
    if os.path.isdir(ref_dir):
        ref_files = [REF_FILES[m] for m in names
                     if os.path.isfile(os.path.join(ref_dir, REF_FILES[m]))]
        if ref_files:
            rm, ro, _ = PltOptzResults.load_npz_data(ref_dir, ref_files,
                                                     n_iter_max=None)
            rmm, rmo = PltOptzResults.summarize(rm, ro)
            for m, a, b in zip(names, rmm, rmo):
                print(f"[paper] {m:13s}: best merit (median) = {a:.3e}, "
                      f"best ||grad|| (median) = {b:.3e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=5)
    ap.add_argument("--n-iter", type=int, default=150)
    ap.add_argument("--n-x0", type=int, default=5)
    ap.add_argument("--out-dir", default="results_data/full_d5")
    ap.add_argument("--methods", nargs="+", default=METHODS)
    ap.add_argument("--worker", nargs=2, metavar=("METHOD", "START"))
    ap.add_argument("--variant", default="default",
                    choices=["default", "honest", "noexploit",
                             "noexploit_lcb"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--cond-norm", default=None,
                    help="override GpConfig.cond_norm (e.g. 'fro' for d>=10)")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    if args.worker:
        method, j = args.worker[0], int(args.worker[1])
        assert method in WELLCOND_BY_METHOD, method
        run_one(args.dim, method, j, args.n_iter, args.out_dir,
                variant=args.variant, cond_norm=args.cond_norm)
        return
    if args.merge:
        merge(args.dim, args.out_dir, args.n_x0, args.methods)
    if args.summary or args.merge:
        summary(args.dim, args.out_dir, args.methods)
        return
    # serial fallback: run everything in-process
    for method in args.methods:
        for j in range(args.n_x0):
            run_one(args.dim, method, j, args.n_iter, args.out_dir)
    merge(args.dim, args.out_dir, args.n_x0, args.methods)
    summary(args.dim, args.out_dir, args.methods)


if __name__ == "__main__":
    main()
