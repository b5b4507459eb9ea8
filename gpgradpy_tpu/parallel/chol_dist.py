"""Distributed right-looking blocked Cholesky over a 1-D device mesh.

SURVEY 5.7 offers two strategies for the large-n partitioned covariance:
the matrix-free CG/SLQ likelihood (model/likelihood_iter.py, delivered) and
a distributed DIRECT factorization for the mid-n regime, where the
O(n^3 / D) blocked Cholesky beats O(k n^2) CG once the iteration count k
exceeds ~n/D (ill-conditioned kernels at tight nuggets).  This module is
that second backend (reference analog: the dense `calc_all_K_w_chofac`
factorization path, Kernel.py:128-140, which is single-host only).

Design (TPU-native, not a ScaLAPACK translation):
- The matrix is ROW-SHARDED over the mesh axis (same contiguous point
  layout as parallel/sharded_matvec.py); each device owns n/D rows.
- One fori_loop over block-columns k inside a single shard_map'd jit:
  * the diagonal block A_kk is summed out of its owner via a masked psum
    (a broadcast without a dedicated collective -- GSPMD turns it into
    one all-reduce of a b x b tile),
  * every device right-solves its own panel rows against L_kk^-T (MXU
    triangular solve, no communication),
  * the full panel block-column is all_gather'ed once per step and the
    trailing submatrix update is a single (n_local, b) x (b, n) matmul on
    the MXU, masked to the not-yet-factored columns.
- Everything is static-shaped; the only collectives are one psum and one
  all_gather per block step (O(n b) bytes each, n/b steps -> O(n^2) total
  communication vs O(n^3/D) flops).

The factor stays sharded; `logdet` comes out replicated.  For solves at
mid n, gather the factor (`jax.device_get` / all_gather) or use the CG
path -- a fully distributed triangular solve is latency-bound and not
worth its complexity at the sizes where direct factorization wins.

Consumers: ops/linalg.cholesky_ok_dist wraps this in a custom-VJP CholFac
drop-in (analytic Cholesky pullback on the saved factor), which
model/assembly.assemble_keta(mesh=...) routes every covariance
factorization through, delivered at the facade as ``solver='dense_dist'``
(fit/dense_dist_driver.py -- see its module docstring for the CG-vs-direct
crossover).  Exercised by tests/test_dense_dist.py and
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .sharded_matvec import DATA_AXIS


@partial(jax.jit, static_argnames=("mesh", "block"))
def cholesky_dist(mesh: Mesh, A: jnp.ndarray, block: int = 64):
    """Blocked Cholesky of SPD ``A`` (n, n) row-sharded over ``mesh``.

    Returns ``(L, logdet)``: ``L`` lower-triangular with the same row
    sharding, ``logdet = log det A`` replicated.  ``n`` must be divisible
    by ``mesh.size * block`` (pad with identity rows/cols to the bucket,
    exactly like DataSpec.pad_mask does for the covariance -- each identity
    pad row adds log(1) = 0 to the logdet).
    """
    n = A.shape[0]
    n_dev = mesh.size
    assert A.shape == (n, n)
    assert n % (n_dev * block) == 0, \
        f"n={n} must be a multiple of mesh.size*block={n_dev * block}"
    n_loc = n // n_dev
    nb = n // block

    def body(A_loc):
        # A_loc: (n_loc, n) -- this device's rows
        d = jax.lax.axis_index(DATA_AXIS)
        row0_g = d * n_loc                       # first global row held here
        grows = row0_g + jnp.arange(n_loc)       # global row index per row

        def step(k, A_loc):
            # pin every slice index to i32 (under x64 the mixed
            # int32 loop counter / int64 arithmetic trips dynamic_slice)
            c0 = (k * block).astype(jnp.int32)   # leading col of this panel
            # -- diagonal block, broadcast via masked psum ----------------
            lr0 = jnp.clip(c0 - row0_g, 0, n_loc - block).astype(jnp.int32)
            diag = jax.lax.dynamic_slice(A_loc, (lr0, c0), (block, block))
            owns = jnp.logical_and(c0 >= row0_g, c0 + block <= row0_g + n_loc)
            A_kk = jax.lax.psum(jnp.where(owns, diag, 0.0), DATA_AXIS)
            L_kk = jnp.linalg.cholesky(A_kk)
            # -- panel: L_ik = A_ik L_kk^-T for this device's rows --------
            Acol = jax.lax.dynamic_slice(A_loc, (jnp.int32(0), c0),
                                         (n_loc, block))
            Pl = jax.scipy.linalg.solve_triangular(
                L_kk, Acol.T, lower=True).T      # (n_loc, block)
            below = (grows >= c0 + block)[:, None]
            in_kk = jnp.logical_and(grows >= c0, grows < c0 + block)[:, None]
            # write back: diagonal rows get L_kk, rows below get the panel
            lrow = jnp.clip(grows - c0, 0, block - 1)
            Lkk_rows = L_kk[lrow, :]
            newcol = jnp.where(below, Pl, jnp.where(in_kk, Lkk_rows, Acol))
            A_loc = jax.lax.dynamic_update_slice(A_loc, newcol,
                                                 (jnp.int32(0), c0))
            # -- trailing update with the gathered panel ------------------
            Pfull = jax.lax.all_gather(jnp.where(below, Pl, 0.0), DATA_AXIS,
                                       tiled=True)  # (n, block), zeros above
            # HIGHEST precision is load-bearing: the TPU default matmul runs
            # bf16-input passes (~8 mantissa bits), which destroys the f32
            # factorization at the production cond_max_target=1e6 (measured:
            # ok=False on the real Keta while dense cholesky -- which uses
            # full precision internally -- succeeds)
            upd = jnp.matmul(jnp.where(below, Pl, 0.0), Pfull.T,
                             precision=jax.lax.Precision.HIGHEST)
            cmask = (jnp.arange(n) >= c0 + block)[None, :]
            return A_loc - jnp.where(cmask, upd, 0.0)

        A_loc = jax.lax.fori_loop(0, nb, step, A_loc)
        # lower triangle only (the trailing masks never touched the upper
        # triangle of already-factored columns)
        L_loc = jnp.where(jnp.arange(n)[None, :] <= grows[:, None], A_loc, 0.0)
        dloc = jnp.take_along_axis(L_loc, grows[:, None], axis=1)[:, 0]
        logdet = 2.0 * jax.lax.psum(jnp.sum(jnp.log(dloc)), DATA_AXIS)
        return L_loc, logdet

    fn = shard_map(body, mesh=mesh,
                   in_specs=P(DATA_AXIS, None),
                   out_specs=(P(DATA_AXIS, None), P()))
    A = jax.device_put(A, NamedSharding(mesh, P(DATA_AXIS, None)))
    return fn(A)
