#!/usr/bin/env python3
"""Multi-device scaling-efficiency harness (SURVEY 5.8 / BASELINE north star:
>=70% scaling efficiency at 2+ hosts).

Measures, at FIXED total work, throughput vs the number of mesh devices:

  * NUTS on the GP hyperparameter posterior: fixed total chains, chain axis
    sharded over the mesh (parallel/mesh.run_nuts_sharded), pooled-adaptation
    collectives riding the mesh axis -> samples/s.
  * Multistart MAP fits: fixed total L-BFGS starts, start axis sharded over
    the mesh -> starts/s.

Efficiency(N) = rate(N) / (N * rate(1)).  On real hardware (a TPU slice or a
multi-host `jax.distributed` job via --distributed) this is the production
scaling number; on this box the same harness runs on a VIRTUAL CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count), where devices share one
physical CPU -- there the emitted numbers validate the measurement path and
the sharded programs, not real speedup.  The JSON records which mode ran.

Usage:
  python examples/scaling_harness.py                    # virtual CPU mesh
  python examples/scaling_harness.py --devices 1 2 4 8 --out scaling.json
  python examples/scaling_harness.py --distributed      # multi-host TPU job

The reference has no analog (single-process NumPy, SURVEY 2.3); this is the
additive parallel-inference capability measured.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_env(max_devices: int, virtual: bool):
    """Re-exec with a clean CPU backend + forced device count if the already
    imported jax (sitecustomize pre-imports it against the TPU tunnel) does
    not expose enough devices."""
    if not virtual:
        return
    want = f"--xla_force_host_platform_device_count={max_devices}"
    if os.environ.get("_SCALING_HARNESS_REEXEC") == "1":
        return
    env = dict(os.environ)
    env["_SCALING_HARNESS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO  # drop the axon sitecustomize
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + want).strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--chains", type=int, default=64,
                    help="fixed TOTAL NUTS chains (divisible by every -d)")
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=128)
    ap.add_argument("--starts", type=int, default=64,
                    help="fixed TOTAL multistart fit starts")
    ap.add_argument("--out", default=None, help="write JSON here too")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (multi-host job; "
                         "uses the REAL devices, no virtual mesh)")
    args = ap.parse_args()

    _ensure_env(max(args.devices), virtual=not args.distributed)

    import jax
    if args.distributed:
        from gpgradpy_tpu.parallel.mesh import distributed_initialize
        distributed_initialize()
    else:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpgradpy_tpu import GpConfig, GpData, HpInfo, make_data_spec
    from gpgradpy_tpu.fit import lhs, multistart
    from gpgradpy_tpu.inference import nuts
    from gpgradpy_tpu.model import conditioning
    from gpgradpy_tpu.parallel import mesh as pmesh

    n_avail = len(jax.devices())
    dev_counts = [d for d in args.devices if d <= n_avail]
    platform = jax.devices()[0].platform
    virtual = not args.distributed and platform == "cpu"

    # --- shared problem: GP hp posterior on a d=2 gradient-enhanced set ---
    rng = np.random.default_rng(0)
    dim, n_data = 2, 24
    dt = jnp.float64 if platform == "cpu" else jnp.float32
    dtype = "float64" if platform == "cpu" else "float32"
    x = rng.uniform(-1.5, 1.5, (n_data, dim))
    fval = np.sum((x - 0.3) ** 2, axis=1)
    fgrad = 2.0 * (x - 0.3)
    cfg = GpConfig(dim=dim, use_grad=True, kernel_type="SqExp",
                   wellcond_mtd="precon", dtype=dtype)
    spec = make_data_spec(dim, True, n_data, std_fval=np.zeros(n_data),
                          std_grad=np.zeros((n_data, dim)))
    data = GpData(x=jnp.asarray(x, dt), fval=jnp.asarray(fval, dt),
                  std_fval=jnp.zeros(n_data, dt),
                  grad=jnp.asarray(fgrad, dt),
                  std_grad=jnp.zeros((n_data, dim), dt))
    info = HpInfo(dim=dim)
    eta = conditioning.calc_etaK(cfg, n_data)
    lb_hp = np.full(info.n_hp, -4.0)
    ub_hp = np.full(info.n_hp, 2.0)

    logpost, _, _ = nuts.make_gp_logpost(cfg, spec, info, data, eta,
                                         lb_hp, ub_hp)

    z0 = jnp.zeros((args.chains, info.n_hp), dt)
    keys = jax.random.split(jax.random.PRNGKey(1), args.chains)

    def time_nuts(n_dev):
        mesh = pmesh.make_mesh(n_dev)

        def run_and_block():
            out = pmesh.run_nuts_sharded(
                logpost, z0, keys, mesh, n_warmup=args.warmup,
                n_samples=args.samples, max_depth=6)
            jax.block_until_ready(out)
            return out

        run_and_block()                       # compile + warm
        t0 = time.perf_counter()
        run_and_block()
        dt = time.perf_counter() - t0
        return args.chains * args.samples / dt, dt

    # --- multistart fit throughput: starts axis sharded over the mesh ---
    x0 = jnp.asarray(lhs.lhs_sample(args.starts, lb_hp + 0.5,
                                    ub_hp - 0.5, 3), dt)
    solver = multistart._jit_solver(cfg, spec, info, 50, 1e-12)
    lbv, ubv = jnp.asarray(lb_hp, dt), jnp.asarray(ub_hp, dt)

    def time_fit(n_dev):
        mesh = pmesh.make_mesh(n_dev)
        x0s = jax.device_put(x0, NamedSharding(mesh, P(pmesh.CHAIN_AXIS)))

        def run_and_block():
            res = solver(x0s, lbv, ubv, data, eta)
            jax.block_until_ready(res.f)
            return res

        run_and_block()
        t0 = time.perf_counter()
        run_and_block()
        dt = time.perf_counter() - t0
        return args.starts / dt, dt

    if not dev_counts:
        sys.exit(f"no requested device count <= {n_avail} available "
                 f"(requested {args.devices})")
    results = {"platform": platform, "virtual_mesh": bool(virtual),
               "n_devices_avail": n_avail,
               "total_chains": args.chains, "nuts_samples": args.samples,
               "total_starts": args.starts, "points": []}
    base = {}
    for n_dev in dev_counts:
        nuts_rate, nuts_dt = time_nuts(n_dev)
        fit_rate, fit_dt = time_fit(n_dev)
        if n_dev == dev_counts[0]:
            # PER-DEVICE baseline rate: eff(n) = rate(n) / (base * n) is then
            # 1.0 at the first point regardless of whether it ran on 1 device
            base = {"nuts": nuts_rate / dev_counts[0],
                    "fit": fit_rate / dev_counts[0]}
        pt = {"n_devices": n_dev,
              "nuts_samples_per_s": round(nuts_rate, 1),
              "fit_starts_per_s": round(fit_rate, 2),
              "nuts_eff": round(nuts_rate / (base["nuts"] * n_dev), 3),
              "fit_eff": round(fit_rate / (base["fit"] * n_dev), 3)}
        results["points"].append(pt)
        print(f"[scaling] n_dev={n_dev}: NUTS {nuts_rate:.0f} samp/s "
              f"(eff {pt['nuts_eff']:.0%}), fit {fit_rate:.2f} starts/s "
              f"(eff {pt['fit_eff']:.0%})", file=sys.stderr)

    last = results["points"][-1]
    results["scaling_efficiency"] = min(last["nuts_eff"], last["fit_eff"])
    results["meets_70pct_target"] = (results["scaling_efficiency"] >= 0.70
                                     and not virtual)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
