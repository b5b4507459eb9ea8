"""Row-parallel sharded covariance matvec for multi-chip large-n GPs.

The scaling design of SURVEY.md section 5.7: the point set is sharded over a
mesh axis; each device assembles only ITS row-block of the gradient-enhanced
covariance on the fly (never materialized) and multiplies it against the
(gathered) vector.  Combined with ops/iterative.mbcg this gives a distributed
CG/SLQ marginal likelihood whose per-device memory is O(n_local * n) and
whose collectives are one all_gather per matvec plus the psum-reductions of
the CG dot products (inserted automatically by GSPMD when the operands are
sharded).

Layout note: the distributed path uses the POINT-MAJOR vector layout
(n, 1+dim) -- each point's value and gradient entries contiguous -- so a
point shard owns whole rows.  ``blocked_to_pointmajor`` converts from the
dense path's block layout ([values; grads grouped by dim]).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import kernels, rtensor

DATA_AXIS = "data"


def blocked_to_pointmajor(v: jnp.ndarray, n: int, dim: int) -> jnp.ndarray:
    """[vals(n); grads grouped by dim (n each)] -> (n, 1+dim)."""
    vals = v[:n]
    grads = v[n:].reshape(dim, n).T
    return jnp.concatenate([vals[:, None], grads], axis=1)


def pointmajor_to_blocked(V: jnp.ndarray) -> jnp.ndarray:
    """(n, 1+dim) -> [vals; grads grouped by dim]."""
    return jnp.concatenate([V[:, 0], V[:, 1:].T.reshape(-1)])


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    import numpy as np
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def kern_matvec_sharded(kernel_type: str, mesh: Mesh, x: jnp.ndarray,
                        theta, alpha, V: jnp.ndarray,
                        eta: float = 0.0, pvec2_pm: Optional[jnp.ndarray] = None):
    """(Keta V) with the point axis sharded over ``mesh``.

    x: (n, dim) sharded on axis 0; V: (n, 1+dim) point-major, sharded on
    axis 0.  ``pvec2_pm``: optional P^2 diagonal in point-major shape
    (n, 1+dim) for the eta * P^2 term.  mesh.size must divide n.
    Returns (n, 1+dim) sharded like V.
    """
    n, dim = x.shape

    def local(x_loc, v_loc, p2_loc):
        # gather the full point set and vector (one all_gather each)
        x_all = jax.lax.all_gather(x_loc, DATA_AXIS, tiled=True)
        v_all = jax.lax.all_gather(v_loc, DATA_AXIS, tiled=True)
        R = rtensor.calc_rtensor(x_loc, x_all)              # (d, nl, n)
        G = kernels.kern_block_tensor(kernel_type, R, theta, alpha)
        # out[a, i] = sum_{b, j} G[a, b, i, j] v_all[j, b]
        out = jnp.einsum("abij,jb->ia", G, v_all)           # (nl, 1+d)
        out = out + eta * p2_loc * v_loc
        return out

    spec = P(DATA_AXIS)
    p2 = (jnp.ones_like(V) if pvec2_pm is None else pvec2_pm)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return fn(x, V, p2)


def blocked_to_pm_mat(M: jnp.ndarray, n: int, dim: int) -> jnp.ndarray:
    """(n_data, m) in the dense path's block layout ([vals; grads grouped by
    dim]) -> point-major flattened rows (n*(1+dim), m): each point's value
    and gradient rows contiguous, so a point shard owns whole row groups."""
    M2 = M if M.ndim == 2 else M[:, None]
    vals = M2[:n]
    grads = M2[n:].reshape(dim, n, -1).transpose(1, 0, 2)       # (n, d, m)
    out = jnp.concatenate([vals[:, None, :], grads], axis=1)    # (n, 1+d, m)
    out = out.reshape(n * (1 + dim), -1)
    return out if M.ndim == 2 else out[:, 0]


def pm_to_blocked_mat(M: jnp.ndarray, n: int, dim: int) -> jnp.ndarray:
    """Inverse of blocked_to_pm_mat."""
    M2 = M if M.ndim == 2 else M[:, None]
    pm = M2.reshape(n, 1 + dim, -1)
    vals = pm[:, 0, :]
    grads = pm[:, 1:, :].transpose(1, 0, 2).reshape(dim * n, -1)
    out = jnp.concatenate([vals, grads], axis=0)
    return out if M.ndim == 2 else out[:, 0]


def kern_matvec_sharded_batch(kernel_type: str, mesh: Mesh, x: jnp.ndarray,
                              theta, alpha, V2: jnp.ndarray,
                              eta: float = 0.0,
                              pvec2_pm: Optional[jnp.ndarray] = None):
    """Batched sharded (Keta V) in the point-major-FLATTENED layout.

    V2: (n*(1+dim), m) with rows grouped by point (blocked_to_pm_mat);
    x: (n, dim).  Both sharded on their leading axis over the mesh's data
    axis (mesh.size must divide n so shards split at point boundaries).
    ``pvec2_pm``: optional flattened P^2 diagonal for the eta * P^2 term.
    One all_gather of x and of V per call; the row-block einsum is local.
    Returns (n*(1+dim), m) sharded like V2 -- the building block of the
    distributed CG/SLQ marginal likelihood (SURVEY.md section 5.7).
    """
    n, dim = x.shape
    m = V2.shape[1]
    assert n % mesh.size == 0, (
        f"mesh.size ({mesh.size}) must divide n ({n}) so shards split at "
        f"point boundaries")

    def local(x_loc, v_loc, p2_loc):
        x_all = jax.lax.all_gather(x_loc, DATA_AXIS, tiled=True)
        vpm = v_loc.reshape(-1, 1 + dim, m)
        v_all = jax.lax.all_gather(vpm, DATA_AXIS, tiled=True)  # (n, 1+d, m)
        R = rtensor.calc_rtensor(x_loc, x_all)                  # (d, nl, n)
        G = kernels.kern_block_tensor(kernel_type, R, theta, alpha)
        out = jnp.einsum("abij,jbm->iam", G, v_all)             # (nl, 1+d, m)
        out = out + (eta * p2_loc).reshape(-1, 1 + dim)[:, :, None] * vpm
        return out.reshape(-1, m)

    spec = P(DATA_AXIS)
    p2 = (jnp.ones(n * (1 + dim), V2.dtype) if pvec2_pm is None
          else pvec2_pm)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return fn(x, V2, p2)


def shard_points(mesh: Mesh, *arrays):
    """Place arrays with their leading (point) axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
