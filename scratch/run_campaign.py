#!/usr/bin/env python3
"""Round-3 BO trace campaign driver: runs (method, start) workers from a
manifest, N at a time, each as its own process (crash isolation), logging to
scratch/logs/.  Usage:

  python scratch/run_campaign.py manifest.txt [n_parallel]

Manifest lines: dim method start n_iter out_dir variant
Lines whose per-start npz already exists AND has a finished marker row count
(>= 0.55 * n_iter finite merits, or an early-stop NaN tail) are skipped, so
the driver is resumable.
"""

import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, "scratch", "logs")


def is_done(out_dir, dim, method, j, n_iter):
    p = os.path.join(REPO, out_dir, f"Rosen_a10_d{dim}_{method}_s{j}.npz")
    if not os.path.isfile(p):
        return False
    try:
        z = np.load(p, allow_pickle=True)
        if "completed" in z:
            # new-format files carry an explicit marker; incomplete ones are
            # resumed from their checkpoint by run_one, so never skip them
            return bool(z["completed"])
        m = z["merit_all"]
    except Exception:
        return False
    fin = np.isfinite(m)
    if fin.all():
        return True
    # legacy files (no marker): a NaN tail is either the exploit cascade's
    # machine-precision early stop (deep merit, most of the budget spent)
    # or a killed worker.  Killed runs are resumable now, so only the
    # former counts as done.
    last = int(np.max(np.where(fin)[0])) if fin.any() else -1
    return (last >= 0.55 * (m.size - 1)
            and float(np.nanmin(m)) < 1e-20)


def run_job(job):
    dim, method, j, n_iter, out_dir, variant = job
    if is_done(out_dir, dim, method, j, n_iter):
        print(f"[skip] d{dim} {method} s{j} (done)", flush=True)
        return 0
    log = os.path.join(LOGDIR, f"r3_d{dim}_{method[0]}{j}_{variant}.log")
    cmd = [sys.executable, os.path.join(REPO, "examples", "run_paper_traces.py"),
           "--dim", str(dim), "--n-iter", str(n_iter), "--out-dir", out_dir,
           "--variant", variant, "--platform", PLATFORM, *EXTRA,
           "--worker", method, str(j)]
    t0 = time.time()
    print(f"[start] d{dim} {method} s{j} {variant} -> {log}", flush=True)
    with open(log, "w") as fh:
        r = subprocess.run(cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    print(f"[done rc={r.returncode}] d{dim} {method} s{j} {variant} "
          f"in {time.time()-t0:.0f}s", flush=True)
    return r.returncode


PLATFORM = "cpu"
EXTRA = []


def main():
    global PLATFORM
    args = [a for a in sys.argv[1:]]
    if "--platform" in args:
        i = args.index("--platform")
        PLATFORM = args[i + 1]
        del args[i:i + 2]
    if "--cond-norm" in args:
        i = args.index("--cond-norm")
        EXTRA.extend(["--cond-norm", args[i + 1]])
        del args[i:i + 2]
    manifest = args[0]
    n_par = int(args[1]) if len(args) > 1 else 2
    os.makedirs(LOGDIR, exist_ok=True)
    jobs = []
    with open(manifest) as fh:
        for line in fh:
            line = line.split("#")[0].strip()
            if not line:
                continue
            dim, method, j, n_iter, out_dir, variant = line.split()
            jobs.append((int(dim), method, int(j), int(n_iter), out_dir,
                         variant))
    print(f"{len(jobs)} jobs, {n_par} parallel", flush=True)
    with ThreadPoolExecutor(max_workers=n_par) as ex:
        rcs = list(ex.map(run_job, jobs))
    bad = [j for j, rc in zip(jobs, rcs) if rc != 0]
    for j in bad:
        print(f"[FAILED] {j}", flush=True)
    print(f"campaign finished: {len(jobs) - len(bad)}/{len(jobs)} ok",
          flush=True)


if __name__ == "__main__":
    main()
