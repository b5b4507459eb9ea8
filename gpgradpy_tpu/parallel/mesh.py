"""Device-mesh sharding of inference workloads.

The reference is single-process NumPy (SURVEY.md section 2.3); this module is
the TPU-native parallel execution layer: NUTS chains / SMC particles / MLL
multistarts are a batch axis laid out over a ``jax.sharding.Mesh`` with
``shard_map``, and the cross-chain adaptation reductions (step size, mass
matrix) become ``psum``/``pmean`` collectives over the mesh axis -- ICI
within a slice, DCN across hosts (the BASELINE.json north-star design).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

CHAIN_AXIS = "chains"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = CHAIN_AXIS) -> Mesh:
    """1-D mesh over the available devices (chains axis)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def distributed_initialize(**kw):
    """Multi-host runtime bring-up: thin wrapper over
    jax.distributed.initialize (coordinator address/process id/num processes
    from env or kwargs).  No-op if already initialized."""
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError:
        pass  # already initialized


def sharded_chain_map(fn: Callable, mesh: Mesh,
                      axis_name: str = CHAIN_AXIS) -> Callable:
    """shard_map a per-chain function over the chains mesh axis.

    ``fn(batch_args...) -> batch_out`` must accept arrays with a leading
    chains dimension (i.e. already vmapped); inputs/outputs are sharded on
    that leading axis.  Inside ``fn``, cross-chain reductions must use
    ``jax.lax.pmean(..., axis_name)`` -- see ``cross_chain_mean``.
    """
    spec = P(axis_name)
    return shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec,
                     check_vma=False)


def cross_chain_mean(axis_name: str = CHAIN_AXIS, local_axis: int | None = 0):
    """Mean over ALL chains: local batch mean + pmean over the mesh axis.

    Returns a closure suitable for nuts.run_nuts(cross_chain_mean=...).
    Inside shard_map each device holds a local block of chains which the
    per-chain function sees under vmap, so the local mean happens via vmap's
    batching of the reduction -- here we reduce over the mesh axis only and
    rely on the caller to have already averaged locally (or pass
    local_axis=None when per-device batch is 1).
    """
    def reduce_fn(x):
        return jax.lax.pmean(x, axis_name)
    return reduce_fn


def shard_batch(x: jnp.ndarray, mesh: Mesh,
                axis_name: str = CHAIN_AXIS) -> jnp.ndarray:
    """Place a batch array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def run_nuts_sharded(logp_fn: Callable, z0: jnp.ndarray, keys: jnp.ndarray,
                     mesh: Mesh, n_warmup: int = 500, n_samples: int = 500,
                     max_depth: int = 8, cross_chain_adapt: bool = True,
                     axis_name: str = CHAIN_AXIS, **nuts_kw):
    """NUTS with the chain axis sharded over the mesh.

    Layout: chains (leading axis of z0/keys) are split evenly over the mesh
    devices; inside each shard the local chains are vmapped; warmup
    adaptation statistics are reduced with pmean over the mesh axis (and a
    local mean over the vmapped chains), giving every chain the pooled step
    size / mass matrix -- numerically identical to single-device pooled
    adaptation, which test_sharding.py verifies.
    """
    from ..inference import nuts as nuts_mod

    n_chains = z0.shape[0]
    n_dev = mesh.devices.size
    assert n_chains % n_dev == 0, (n_chains, n_dev)

    if cross_chain_adapt:
        def pooled_mean(x):
            # mean over local vmapped chains ...
            local = jax.lax.pmean(x, "local_chains")
            # ... then over the mesh axis
            return jax.lax.pmean(local, axis_name)
    else:
        pooled_mean = None

    def per_shard(z0_blk, keys_blk):
        run = lambda z, k: nuts_mod.run_nuts(
            logp_fn, z, k, n_warmup=n_warmup, n_samples=n_samples,
            max_depth=max_depth, cross_chain_mean=pooled_mean, **nuts_kw)
        return jax.vmap(run, axis_name="local_chains")(z0_blk, keys_blk)

    spec = P(axis_name)
    fn = shard_map(per_shard, mesh=mesh, in_specs=(spec, spec),
                   out_specs=spec, check_vma=False)
    z0 = shard_batch(z0, mesh, axis_name)
    keys = shard_batch(keys, mesh, axis_name)
    return fn(z0, keys)
