#!/usr/bin/env python3
"""Print the d=5 ablation grid (variant x method) from every committed
per-start npz: best merit / best ||grad|| per start, median when >= 2
starts.  Feeds the STATUS.md attribution table."""
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRIDS = [
    ("full_d5 (cascade ON, precon local)", "results_data/full_d5"),
    ("honest_d5 (cascade ON, named local)", "results_data/honest_d5"),
    ("contrast_d5 (cascade OFF, pure EI)", "results_data/contrast_d5"),
    ("contrast_lcb_d5 (cascade OFF, mu-2sig)", "results_data/contrast_lcb_d5"),
]

for label, d in GRIDS:
    print(f"\n== {label} ==")
    for method in ("Baseline", "Rescaling", "Precondition"):
        paths = sorted(glob.glob(
            os.path.join(REPO, d, f"Rosen_a10_d5_{method}_s*.npz")))
        if not paths:
            continue
        bm, bo, tags = [], [], []
        for p in paths:
            z = np.load(p, allow_pickle=True)
            m, o = z["merit_all"], z["opt_all"]
            fin = int(np.isfinite(m).sum())
            if "completed" in z:
                done = bool(z["completed"])
            else:
                # legacy file: a NaN tail after a machine-precision merit is
                # the exploit cascade's early stop (= complete)
                done = fin == m.size or (fin >= 0.55 * m.size
                                         and float(np.nanmin(m)) < 1e-20)
            bm.append(float(np.nanmin(m)))
            bo.append(float(np.nanmin(o)))
            tags.append(f"s{p.split('_s')[-1][0]}:{fin}ev"
                        + ("" if done else "*"))
        agg = "median" if len(bm) >= 2 else "single"
        print(f"  {method:13s} best merit {np.median(bm):9.3e} "
              f"best |g| {np.median(bo):9.3e}  ({agg} of {len(bm)}: "
              f"{' '.join(tags)}; * = incomplete)")
