#!/usr/bin/env python3
"""Prepare an extended-budget continuation checkpoint for a completed d=10
trace: the reference's own protocol is a 500-EVALUATION budget (the
`Baye_Kern_SE_n500_*` trace filenames; its bundled traces simply converged
early), so continuing a converged-shape run to n_iter=190 (12 init + 190 =
202 <= 500 evals) is protocol-legitimate.  Writes the padded checkpoint
into results_data/full_d10_ext/ so the 95-iter corpus stays untouched.
Usage: python scratch/extend_d10.py <method> <start> <n_iter_new>
"""
import sys
import numpy as np

method, j, n_new = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
dim = 10
src = f"results_data/full_d10/Rosen_a10_d{dim}_{method}_s{j}.npz"
dst = f"results_data/full_d10_ext/Rosen_a10_d{dim}_{method}_s{j}.npz"
z = np.load(src, allow_pickle=True)
n_tot_new = dim + 2 + n_new
old = z["merit_all"].size
assert n_tot_new > old, (n_tot_new, old)

def pad(a, fill=np.nan):
    out = np.full((n_tot_new,) + a.shape[1:], fill)
    out[:a.shape[0]] = a
    return out

np.savez(dst, x_all=pad(z["x_all"]), merit_all=pad(z["merit_all"]),
         opt_all=pad(z["opt_all"]), fsb_all=pad(z["fsb_all"], 1.0),
         time_iter=pad(z["time_iter"]), variant=np.str_("default"),
         completed=np.bool_(False))
fin = int(np.isfinite(pad(z["merit_all"])).sum())
print(f"{dst}: extended {old} -> {n_tot_new} ({fin} finite evals recorded)")
