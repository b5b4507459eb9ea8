"""On-TPU covariance-assembly throughput: Pallas tiled kernel vs XLA dense.

Latency-cancelling scheme (CLAUDE.md measurement caveat): time a jitted
scan of R repeated assemblies for two chain lengths and difference them, so
the tunnel round-trip drops out.  theta varies per step (scan carry) to
defeat CSE; only one output row is consumed per step so the read-back does
not pollute the write-bandwidth estimate.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gpgradpy_tpu.ops import kernels, rtensor, pallas_assembly  # noqa: E402

R_LO, R_HI = 2, 10


def bench_one(n_pts, dim, block=128, kernel_type="SqExp"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, (n_pts, dim)), jnp.float32)
    theta0 = jnp.asarray(rng.uniform(0.5, 2.0, dim), jnp.float32)
    A = dim + 1
    n_data = A * n_pts
    nbytes = n_data * n_data * 4

    def xla_assemble(th):
        R = rtensor.calc_rtensor(x, x)
        return kernels.kern_mat(kernel_type, R, th, None, use_grad=True)

    def pallas_assemble(th):
        return pallas_assembly.kern_grad_pallas(kernel_type, x, x, th,
                                                block=block)

    def make_many(assemble):
        @partial(jax.jit, static_argnums=0)
        def many(reps):
            def body(c, _):
                K = assemble(theta0 * (1.0 + 1e-6 * c))
                return c + 1.0, jnp.sum(K[-1])
            _, outs = jax.lax.scan(body, 0.0, None, length=reps)
            return jnp.sum(outs)
        return many

    out = {}
    for name, assemble in (("xla", xla_assemble), ("pallas", pallas_assemble)):
        many = make_many(assemble)
        try:
            float(many(R_LO)); float(many(R_HI))   # compile both lengths
            t = {}
            for reps in (R_LO, R_HI, R_LO, R_HI):  # interleave, keep best
                t0 = time.time()
                float(many(reps))
                t.setdefault(reps, []).append(time.time() - t0)
            per = max((min(t[R_HI]) - min(t[R_LO])) / (R_HI - R_LO), 1e-9)
            out[name] = (per, nbytes / per / 1e9)
            print(f"[assembly] n_data={n_data} ({n_pts}x{dim}) {name:6s}: "
                  f"{per*1e3:8.2f} ms -> {nbytes/per/1e9:7.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"[assembly] n_data={n_data} {name}: FAILED {e}")
    return out


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0])
    for n_pts, dim in ((512, 3), (2048, 3), (4096, 3)):
        bench_one(n_pts, dim)
