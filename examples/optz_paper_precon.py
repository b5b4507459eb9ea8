#!/usr/bin/env python3
"""Paper reproduction: gradient-enhanced BO on Rosenbrock (a=10) comparing
the Baseline / Rescaling / Precondition conditioning methods, plotted next to
the reference's bundled paper traces.

Equivalent of /root/reference/gpgradpy/results/optz_paper_precon.py
(:65-91); our traces are produced by gpgradpy_tpu.bo.loop in the same npz
schema, and the reference's bundled npz files (results/data_paper_precon/)
load through the same PltOptzResults code path.

Usage:
  python examples/optz_paper_precon.py --dim 5 --n-iter 60 --n-x0 3
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=5)
    ap.add_argument("--n-iter", type=int, default=60)
    ap.add_argument("--n-x0", type=int, default=3)
    ap.add_argument("--methods", nargs="+",
                    default=["Baseline", "Precondition"])
    ap.add_argument("--out-dir", default="bo_results")
    args = ap.parse_args()

    d = args.dim
    obj = partial(problems.rosenbrock, a=10.0)
    lb = np.full(d, -2.0)
    ub = np.full(d, 2.0)
    os.makedirs(args.out_dir, exist_ok=True)

    our_files = []
    for method in args.methods:
        out_npz = os.path.join(args.out_dir,
                               f"Rosen_a10_d{d}_{method}_all.npz")
        print(f"=== {method} ({WELLCOND_BY_METHOD[method]}) -> {out_npz}")
        loop.run_bo_multistart(
            obj, lb, ub, n_iter=args.n_iter, n_x0=args.n_x0,
            n_init=d + 2, wellcond_mtd=WELLCOND_BY_METHOD[method],
            acq="ei", exploit_frac=0.5, exploit_local=True,
            save_path=out_npz, verbose=True)
        our_files.append(os.path.basename(out_npz))

    merit, opt, fsb = PltOptzResults.load_npz_data(args.out_dir, our_files,
                                                   n_iter_max=None)
    med_merit, med_opt = PltOptzResults.summarize(merit, opt)
    for m, mm, mo in zip(args.methods, med_merit, med_opt):
        print(f"[ours]  {m:13s}: best merit (median) = {mm:.3e}, "
              f"best ||grad|| (median) = {mo:.3e}")

    # reference bundled traces for the same case, if available
    ref_dir = os.path.join(REF_DATA, f"Rosen_a10_d{d}")
    if os.path.isdir(ref_dir):
        ref_files = [REF_FILES[m] for m in args.methods
                     if os.path.isfile(os.path.join(ref_dir, REF_FILES[m]))]
        if ref_files:
            rmerit, ropt, _ = PltOptzResults.load_npz_data(ref_dir, ref_files,
                                                           n_iter_max=None)
            rmm, rmo = PltOptzResults.summarize(rmerit, ropt)
            for m, mm, mo in zip(args.methods, rmm, rmo):
                print(f"[paper] {m:13s}: best merit (median) = {mm:.3e}, "
                      f"best ||grad|| (median) = {mo:.3e}")

    PltOptzResults.plt_conv_nx0(
        merit, args.methods,
        os.path.join(args.out_dir, f"conv_merit_d{d}.png"), ylabel="merit")
    PltOptzResults.plt_conv_nx0(
        opt, args.methods,
        os.path.join(args.out_dir, f"conv_opt_d{d}.png"),
        ylabel=r"$\|\nabla f\|_2$")
    print(f"plots in {args.out_dir}/")


if __name__ == "__main__":
    main()
