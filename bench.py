#!/usr/bin/env python3
"""Benchmark: gradient-enhanced GP MAP fit wall-clock vs the reference.

Prints ONE JSON line:
  {"metric": "gp_fit_wall_s", "value": <ours seconds>, "unit": "s",
   "vs_baseline": <reference_seconds / ours_seconds>}

Problem: Rosenbrock d=4, n_eval=64 (n_data = 320), gradient-enhanced,
noise-free, 'precon' conditioning -- one full hyperparameter training round
(hp_best 40-point scan + bounded optimization), the reference's headline
workload (its BO loop runs exactly this fit every iteration).

Ours runs on the default JAX device (TPU under the driver) in float32 with
the preconditioned covariance (TPUs have no native f64; the precon scheme is
what makes f32 viable -- SURVEY.md section 7 hard part (f)).  The baseline is
the reference library itself executed on host CPU in float64 (numba stubbed
to plain numpy -- its hot loops are dimension-loops over vectorized numpy
slices, so the stub penalty is small; scipy SLSQP and cho_factor dominate).
A predictive-quality gate (held-out RMSE within 2x of the reference's)
guards against benchmarking a broken fit.

Extra diagnostics (NUTS samples/s, Cholesky timing, MLL eval throughput) go
to stderr with --verbose; the stdout line stays machine-readable.
"""

import argparse
import json
import os
import sys
import time
import warnings

import numpy as np

REF_BASELINE_CACHE = "/tmp/gpgradpy_ref_baseline.json"


def _problem(n=64, d=4, seed=0):
    from gpgradpy_tpu.bo.problems import rosenbrock
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, (n, d))
    f, g = rosenbrock(x)
    x_test = rng.uniform(-2, 2, (128, d))
    f_test, _ = rosenbrock(x_test)
    return x, f, g, x_test, f_test


def bench_ours(n=64, d=4, repeats=3, verbose=False, fast_mode=False):
    """Full-quality mode (default): on TPU the f32 multistart fit at cond 1e6
    is followed by a warm single-start f64 polish at cond 1e10 and an f64
    predict path -- the SAME predictive quality as the f64 reference (0.17%
    rel RMSE on this problem) at a fraction of its wall clock.  fast_mode
    drops the polish (f32 only, ~3% rel RMSE, another ~10x faster)."""
    import jax
    jax.config.update("jax_enable_x64", True)   # polish/predict f64 path
    from gpgradpy_tpu import GaussianProcess

    x, f, g, x_test, f_test = _problem(n, d)
    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    cond_t = 1e6 if dtype == "float32" else 1e10
    polish = 0.0 if (fast_mode or dtype == "float64") else 1e10

    def one_fit(seed):
        gp = GaussianProcess(d, True, "SqExp", "precon", dtype=dtype,
                             cond_max_target=cond_t,
                             polish_cond_target=polish, polish_iter_max=10)
        gp._fit_seed = seed
        gp.init_optz_surr(2)
        gp.set_data(x, f, np.zeros(n), g, np.zeros((n, d)))
        t0 = time.time()
        gp.set_hpara("optz", 0)
        dt = time.time() - t0
        return gp, dt

    gp, t_compile = one_fit(1)          # includes compilation
    times = []
    for r in range(repeats):
        gp, dt = one_fit(1)
        times.append(dt)
    t_warm = min(times)

    mu = gp.eval_model(x_test)[0]
    rmse = float(np.sqrt(np.mean((mu - f_test) ** 2)))
    if verbose:
        print(f"[ours] platform={platform} dtype={dtype} polish={polish:g} "
              f"compile+run={t_compile:.2f}s warm={t_warm:.3f}s "
              f"rmse={rmse:.4g}", file=sys.stderr)
    return t_warm, rmse, platform


def bench_reference(n=64, d=4, use_cache=True, verbose=False):
    import json as _json
    import os
    key = f"ref_fit_s_n{n}_d{d}"
    if use_cache and os.path.isfile(REF_BASELINE_CACHE):
        with open(REF_BASELINE_CACHE) as fh:
            cache = _json.load(fh)
        if key in cache:
            return cache[key]["time"], cache[key]["rmse"]

    warnings.filterwarnings("ignore")
    sys.path.insert(0, "tests")
    from ref_shim import load_reference
    GP = load_reference()
    if GP is None:
        return float("nan"), float("nan")

    x, f, g, x_test, f_test = _problem(n, d)
    gp = GP(d, True, "SqExp", "precon")
    gp.set_data(x, f, np.zeros(n), g, np.zeros((n, d)))
    gp.init_optz_surr(3)
    gp.store_new_para_surr(0, gp.get_init_hp_vals())
    t0 = time.time()
    gp.optz_hp(1)
    t_ref = time.time() - t0
    gp.setup_eval_model()
    mu = gp.eval_model(x_test)[0]
    rmse = float(np.sqrt(np.mean((mu - f_test) ** 2)))
    if verbose:
        print(f"[reference] fit={t_ref:.2f}s rmse={rmse:.4g}",
              file=sys.stderr)
    cache = {}
    if os.path.isfile(REF_BASELINE_CACHE):
        with open(REF_BASELINE_CACHE) as fh:
            cache = _json.load(fh)
    cache[key] = {"time": t_ref, "rmse": rmse}
    with open(REF_BASELINE_CACHE, "w") as fh:
        _json.dump(cache, fh)
    return t_ref, rmse


def bench_chol(verbose=False, sizes=(1024, 2048, 4096)):
    """Cholesky TFLOP/s on-chip (diagnostic; BASELINE.json metric).  Uses a
    scan of repeated factorizations inside ONE program so the remote-tunnel
    dispatch latency does not pollute the timing (CLAUDE.md measurement
    caveat).  Returns {n: tflops}."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    out = {}
    r_lo, r_hi = 4, 36
    for n in sizes:
        rng = np.random.default_rng(0)
        B = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
        A = (B @ B.T) / 64.0 + n * jnp.eye(n, dtype=jnp.float32)

        @partial(jax.jit, static_argnums=1)
        def many(A, reps):
            def body(c, _):
                L = jnp.linalg.cholesky(A + c * 1e-12)
                return jnp.sum(L[-1]), None
            return jax.lax.scan(body, 0.0, None, length=reps)[0]

        def timed(reps):
            float(many(A, reps))               # host pull = true sync
            t0 = time.time()
            float(many(A, reps))
            return time.time() - t0

        # difference of two chain lengths cancels the tunnel round-trip
        # latency (block_until_ready only measures enqueue on the relay)
        dt = max(timed(r_hi) - timed(r_lo), 1e-9)
        per = dt / (r_hi - r_lo)
        tflops = (n ** 3 / 3.0) / per / 1e12
        out[n] = round(tflops, 2)
        if verbose:
            print(f"[chol] n={n}: {per*1e3:.2f} ms/factor "
                  f"-> {tflops:.2f} TFLOP/s", file=sys.stderr)
    return out


def bench_dense_dist(verbose=False, n_eval=1024, dim=3):
    """solver='dense_dist' on a mesh of ONE real TPU device vs the plain
    dense fit at n_data=(dim+1)*n_eval: quantifies the overhead of routing
    every factorization through the blocked shard_map Cholesky when there is
    nothing to distribute (the worst case for the distributed path; with
    >1 device its O(n^3/n_dev) forward amortizes this).  Warm single-fit
    wall times (one big jitted program each; tunnel-safe per CLAUDE.md)."""
    import jax
    from gpgradpy_tpu.api import GaussianProcess
    from gpgradpy_tpu.bo.problems import rosenbrock

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (n_eval, dim))
    f, g = rosenbrock(x)
    out = {"n_data": (dim + 1) * n_eval, "n_devices": len(jax.devices())}
    for solver in ("dense", "dense_dist"):
        gp = GaussianProcess(dim, True, "SqExp", "precon", dtype="float32",
                             cond_max_target=1e6, solver=solver,
                             dist_chol_block=512, cond_norm="fro",
                             polish_cond_target=None)
        gp.init_optz_surr(4)
        gp.set_data(x, f, np.zeros(n_eval), g, np.zeros((n_eval, dim)))
        gp.set_hpara("optz", 0)          # compile + first fit
        t0 = time.time()
        gp.set_hpara("optz", 1)          # warm fit
        t_warm = time.time() - t0
        out[f"t_fit_{solver}_s"] = round(t_warm, 3)
        if verbose:
            print(f"[dense_dist] {solver}: warm fit {t_warm:.3f} s",
                  file=sys.stderr)
    if out.get("t_fit_dense_s"):
        out["overhead_pct"] = round(
            100.0 * (out["t_fit_dense_dist_s"] / out["t_fit_dense_s"] - 1.0),
            1)
    return out


def bench_assembly(verbose=False, sizes=((1024, 3), (2048, 3)),
                   kernel_types=("SqExp",)):
    """Covariance-assembly throughput, Pallas tiled kernel vs XLA dense, at
    two sizes (n_data = (dim+1)*n_pts = 4096 / 8192).  Latency-cancelling
    scheme (CLAUDE.md measurement caveat): time a jitted scan of R repeated
    assemblies for two chain lengths and difference them so the tunnel
    round-trip drops out.

    The assembled matrix IS the scan carry: each step must write the full
    n_data^2 buffer (loop state), which forces HBM materialization -- a bare
    sum(K[-1]) consumer lets XLA dead-code-eliminate all but one row of the
    assembly (an earlier version measured an impossible 12 TB/s that way).
    theta depends on the previous carry to serialize the steps, and all
    scalars are pinned f32 (bench_ours enables x64; an f64-promoted carry
    silently turns this into an f64 TPU program, which Pallas rejects)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from gpgradpy_tpu.ops import kernels, rtensor, pallas_assembly

    out = []
    R_LO, R_HI = 2, 10
    for (n_pts, dim), kern in [(sz, k) for sz in sizes
                               for k in kernel_types]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-2, 2, (n_pts, dim)), jnp.float32)
        theta0 = jnp.asarray(rng.uniform(0.5, 2.0, dim), jnp.float32)
        n_data = (dim + 1) * n_pts
        nbytes = n_data * n_data * 4
        # RatQu carries a shape hyperparameter alpha (fixed representative
        # value); SqExp/Ma5f2 take theta only
        khp = jnp.float32(2.0) if kern == "RatQu" else None

        def xla_assemble(th, kern=kern, khp=khp):
            R = rtensor.calc_rtensor(x, x)
            return kernels.kern_mat(kern, R, th, khp, use_grad=True)

        def pallas_assemble(th, kern=kern, khp=khp):
            # block=None -> production _auto_block (512 at these sizes)
            return pallas_assembly.kern_grad_pallas(kern, x, x, th,
                                                    alpha=khp)

        def make_many(assemble):
            K_init = jnp.zeros((n_data, n_data), jnp.float32)

            @partial(jax.jit, static_argnums=0)
            def many(reps):
                def body(K_prev, _):
                    th = theta0 * (jnp.float32(1.0)
                                   + jnp.float32(1e-9) * K_prev[0, 0])
                    return assemble(th).astype(jnp.float32), ()
                K_last, _ = jax.lax.scan(body, K_init, None, length=reps)
                return jnp.sum(K_last)
            return many

        for name, assemble in (("xla", xla_assemble),
                               ("pallas", pallas_assemble)):
            many = make_many(assemble)
            try:
                # pilot: estimate per-step cost, then size the chain so the
                # DIFFERENCED work is >> the ~15-60 ms tunnel noise floor
                # (fixed small reps at n_data=4096 once measured an
                # impossible 1.7 TB/s -- pure timing noise).  The pilot is
                # itself differenced ((t_HI-t_LO)/(R_HI-R_LO)) so the fixed
                # dispatch latency cancels and cheap assemblies don't make
                # r_hi undershoot the 250 ms target.
                float(many(R_LO)); float(many(R_HI))
                t0 = time.time(); float(many(R_LO))
                t_lo0 = time.time() - t0
                t0 = time.time(); float(many(R_HI))
                t_hi0 = time.time() - t0
                per0 = max((t_hi0 - t_lo0) / (R_HI - R_LO), 1e-6)
                r_hi = R_LO + int(min(max(0.25 / per0, 32), 512))
                float(many(r_hi))  # compile the long chain
                t = {}
                for reps in (R_LO, r_hi, R_LO, r_hi):
                    t0 = time.time()
                    float(many(reps))
                    t.setdefault(reps, []).append(time.time() - t0)
                diff = min(t[r_hi]) - min(t[R_LO])
                per = max(diff / (r_hi - R_LO), 1e-9)
                if diff < 5e-3:
                    # differenced work below the tunnel noise floor: the
                    # assembly is too cheap to time through the relay
                    out.append({"n_data": n_data, "kernel": kern,
                                "impl": name,
                                "ms_per_assembly": None, "gb_per_s": None,
                                "note": "below tunnel noise floor"})
                    if verbose:
                        print(f"[assembly] n_data={n_data} {kern} {name:6s}: below "
                              f"noise floor ({diff*1e3:.2f} ms diff)",
                              file=sys.stderr)
                    continue
                rec_a = {"n_data": n_data, "kernel": kern, "impl": name,
                         "ms_per_assembly": round(per * 1e3, 3),
                         "gb_per_s": round(nbytes / per / 1e9, 1)}
                if diff < 0.1:
                    # between the 5 ms floor guard and the 250 ms target:
                    # report, but flag the limited differenced work
                    rec_a["note"] = (f"low differenced work "
                                     f"({diff*1e3:.0f} ms): +-noise")
                out.append(rec_a)
                if verbose:
                    print(f"[assembly] n_data={n_data} {kern} {name:6s}: "
                          f"{per*1e3:8.2f} ms -> {nbytes/per/1e9:7.1f} GB/s",
                          file=sys.stderr)
            except Exception as e:
                out.append({"n_data": n_data, "kernel": kern, "impl": name,
                            "error": str(e)[:200]})
                print(f"[assembly] n_data={n_data} {kern} {name}: FAILED {e}",
                      file=sys.stderr)
    return out


def bench_scaling(verbose=False):
    """Multi-device scaling efficiency (examples/scaling_harness.py) on a
    virtual 8-device CPU mesh: NUTS samples/s and fit starts/s vs n_devices
    at fixed total work, JSON on stderr.  On a real multi-chip slice the
    same harness (with --distributed) emits the production >=70%-efficiency
    number from BASELINE.json; a single remote chip can't measure it."""
    import subprocess
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "examples", "scaling_harness.py")
    try:
        out = subprocess.run(
            [sys.executable, script, "--devices", "1", "2", "4", "8",
             "--chains", "16", "--samples", "32", "--warmup", "32",
             "--starts", "16"],
            capture_output=True, text=True, timeout=1200)
        if verbose:
            sys.stderr.write(out.stderr)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(f"[scaling] {line}", file=sys.stderr)
        return json.loads(line) if line else None
    except Exception as e:  # diagnostic only -- never fail the bench
        print(f"[scaling] harness failed: {e}", file=sys.stderr)
        return None


def bench_nuts(verbose=False):
    """NUTS samples/s on the GP hyperparameter posterior (diagnostic)."""
    import jax
    import jax.numpy as jnp
    from gpgradpy_tpu import GpConfig, GpData, HpInfo, make_data_spec
    from gpgradpy_tpu.inference import nuts
    from gpgradpy_tpu.model import conditioning

    n, d = 32, 2
    x, f, g, _, _ = _problem(n, d)
    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    dt = jnp.float32 if dtype == "float32" else jnp.float64
    cfg = GpConfig(dim=d, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", dtype=dtype,
                   cond_max_target=1e6 if dtype == "float32" else 1e10)
    spec = make_data_spec(d, True, n, std_fval=np.zeros(n),
                          std_grad=np.zeros((n, d)))
    data = GpData(x=jnp.asarray(x, dt), fval=jnp.asarray(f, dt),
                  std_fval=jnp.zeros(n, dt), grad=jnp.asarray(g, dt),
                  std_grad=jnp.zeros((n, d), dt))
    info = HpInfo(dim=d)
    eta = conditioning.calc_etaK(cfg, n)
    lb, ub = np.full(info.n_hp, -4.0), np.full(info.n_hp, 2.0)
    logpost, *_ = nuts.make_gp_logpost(cfg, spec, info, data, eta, lb, ub)

    # 256 chains is the BASELINE.json metric configuration ("NUTS ... 256
    # chains"); throughput saturates there (measured 362/656/667 samples/s
    # at 32/128/256 chains on the v5e -- the tiny per-chain matrices are
    # batch-starved below ~128 chains)
    n_chains, n_samples = 256, 128
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    z0 = jnp.zeros((n_chains, info.n_hp), dt)
    run = jax.jit(jax.vmap(lambda z, k: nuts.run_nuts(
        logpost, z, k, n_warmup=64, n_samples=n_samples, max_depth=6)))
    zs, diag = run(z0, keys)
    zs.block_until_ready()
    t0 = time.time()
    zs, diag = run(z0, keys)
    zs.block_until_ready()
    dt_s = time.time() - t0
    rate = n_chains * n_samples / dt_s
    if verbose:
        print(f"[nuts] {n_chains} chains x {n_samples} samples in "
              f"{dt_s:.2f}s -> {rate:.0f} samples/s "
              f"(div={float(np.mean(diag['diverging'])):.3f})",
              file=sys.stderr)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--no-ref", action="store_true",
                    help="skip the reference baseline (use cache or nan)")
    ap.add_argument("--nuts", action="store_true",
                    help="also benchmark NUTS samples/s (stderr)")
    ap.add_argument("--fast", action="store_true",
                    help="fast f32-only mode (no f64 polish; ~3% rel RMSE)")
    ap.add_argument("--assembly", action="store_true",
                    help="also benchmark Pallas vs XLA covariance assembly "
                         "at n_data 4096/8192 (stderr)")
    ap.add_argument("--all-kernels", action="store_true",
                    help="with --assembly: measure Ma5f2/RatQu rows too")
    ap.add_argument("--dense-dist", action="store_true",
                    help="also measure solver='dense_dist' (mesh of 1) vs "
                         "the dense fit at n_data=4096")
    args = ap.parse_args()

    t_ours, rmse_ours, platform = bench_ours(verbose=args.verbose,
                                             fast_mode=args.fast)
    if args.verbose and not args.fast:
        bench_ours(verbose=True, fast_mode=True)   # fast-mode diagnostic
    if args.no_ref:
        t_ref, rmse_ref = bench_reference(use_cache=True, verbose=args.verbose) \
            if True else (float("nan"), float("nan"))
    else:
        t_ref, rmse_ref = bench_reference(verbose=args.verbose)

    extras = {}
    # NUTS samples/s is part of the BASELINE.json metric definition, so it
    # is emitted by DEFAULT into the committed bench record (cheap: one
    # jitted vmapped program); --nuts adds the heavier chol/scaling
    # diagnostics on top.
    try:
        extras["nuts_samples_per_s"] = round(
            bench_nuts(verbose=args.verbose), 1)
    except Exception as e:
        print(f"[nuts] failed: {e}", file=sys.stderr)
        extras["nuts_samples_per_s"] = None
    if args.nuts:
        extras["chol_tflops"] = bench_chol(verbose=True)
        scal = bench_scaling(verbose=True)
        if scal is not None:
            extras["scaling_efficiency"] = scal.get("scaling_efficiency")
            extras["scaling_virtual_mesh"] = scal.get("virtual_mesh")
    if args.assembly:
        kt = (("SqExp", "Ma5f2", "RatQu") if args.all_kernels
              else ("SqExp",))
        extras["assembly_gb_per_s"] = bench_assembly(verbose=True,
                                                     kernel_types=kt)
    if args.dense_dist:
        try:
            extras["dense_dist_fit"] = bench_dense_dist(verbose=True)
        except Exception as e:
            print(f"[dense_dist] failed: {e}", file=sys.stderr)
            extras["dense_dist_fit"] = {"error": str(e)[:200]}

    # quality gate: a fast but broken fit must not count.  The default
    # (polish) mode matches the f64 reference quality (~0.2% rel RMSE on
    # this problem); gate at 1% of the test-function scale so a genuinely
    # broken fit (wrong theta basin, failed Cholesky, broken polish) zeroes
    # the score.
    _, _, _, _, f_test = _problem()
    f_scale = float(np.std(f_test))
    quality_ok = rmse_ours < (0.05 if args.fast else 0.01) * f_scale
    if not quality_ok:
        print(f"[bench] QUALITY GATE FAILED: rmse_ours={rmse_ours:.4g} "
              f"(limit {(0.05 if args.fast else 0.01) * f_scale:.4g}, "
              f"rmse_ref={rmse_ref:.4g})",
              file=sys.stderr)

    # The measured t_ref swings wildly with the host the round happens to
    # run on (observed 4.1 s .. 82.6 s for the same numba-stubbed reference
    # fit across rounds), which made the headline ratio noise.  The headline
    # vs_baseline is therefore PINNED to a canonical reference time read
    # from the committed BASELINE.json artifact ("canonical_ref_fit": the
    # FASTEST reference fit observed across round hosts, i.e. the most
    # conservative choice for the ratio, with provenance metadata); the
    # same-host measured ratio is kept alongside as vs_baseline_measured
    # for audit.  If the artifact is absent the measured ratio becomes the
    # headline.
    T_REF_CANONICAL = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as fh:
            T_REF_CANONICAL = float(
                json.load(fh)["canonical_ref_fit"]["t_ref_s"])
    except Exception:
        pass
    vs_meas = (t_ref / t_ours) if (np.isfinite(t_ref) and quality_ok) else 0.0
    vs = ((T_REF_CANONICAL / t_ours)
          if (quality_ok and T_REF_CANONICAL) else vs_meas)
    # the full auditable record: the reference timing behind vs_baseline, the
    # RMSEs behind the quality gate, and any diagnostics that ran, so the
    # headline ratio can be verified after the fact
    rec = {"metric": "gp_fit_wall_s",
           "value": round(t_ours, 4),
           "unit": "s",
           "vs_baseline": round(vs, 2),
           "t_ref_canonical_s": T_REF_CANONICAL,
           "vs_baseline_measured": round(vs_meas, 2),
           "t_ref_s": round(t_ref, 4) if np.isfinite(t_ref) else None,
           "rmse_ours": round(rmse_ours, 6),
           "rmse_ref": round(rmse_ref, 6) if np.isfinite(rmse_ref) else None,
           "quality_ok": bool(quality_ok),
           "platform": platform,
           # honesty caveats for vs_baseline: the reference runs with its
           # numba JIT stubbed out (numba is not installable in this image,
           # tests/ref_shim.py), so t_ref overstates what the reference
           # achieves in its own environment; and t_ref is host-dependent
           # (single-core speed).  load1 records this host's 1-min load
           # average at measurement time so contention is visible.
           "t_ref_numba_stubbed": True,
           "load1": round(os.getloadavg()[0], 1)}
    rec.update(extras)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
