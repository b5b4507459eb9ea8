"""Pallas TPU kernel: tiled assembly of the gradient-enhanced covariance.

The (1+d)n x (1+d)n blocked matrix is produced tile-by-tile on a grid
(nb1, nb2, 1+d, 1+d): the two leading (slowest) grid dimensions walk the
point-block pairs, the two trailing (fastest) dimensions walk the derivative
blocks.  Because TPU grids execute sequentially with the last dimension
fastest, the radial profile phi(W), phi'(W), phi''(W) for a point-block pair
is computed ONCE (at derivative tile (0, 0)) into VMEM scratch and reused by
all (1+d)^2 derivative tiles of that pair -- so each output element is
written exactly once and the transcendental work is O(n^2), not O(d^2 n^2).
The generic radial-kernel block formulas are the same as ops/kernels.py
(see its module docstring); the reference implements this assembly as numba
loops (e.g. KernelSqExp.py:322-410).

Use ``kern_grad_pallas`` as a drop-in for ``kernels.kern_grad`` on TPU (full
gradient set, square case); it pads n up to the tile size and slices the
result.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT5 = 5.0 ** 0.5


def _i32(v):
    """Pin block-index arithmetic to i32: under jax_enable_x64 the Python
    ints in an index_map promote the returned indices to i64, which the TPU
    Mosaic compiler rejects (func.return (i64, i64))."""
    return jnp.asarray(v, jnp.int32)


def _phi_tile(kernel_type: str, W, alpha):
    """phi, phi', phi'' as functions of the weighted squared distance."""
    if kernel_type == "SqExp":
        phi = jnp.exp(-W)
        return phi, -phi, phi
    if kernel_type == "Ma5f2":
        pos = W > 0.0
        nu = jnp.where(pos, jnp.sqrt(jnp.where(pos, W, 1.0)), 0.0)
        e = jnp.exp(-_SQRT5 * nu)
        phi = (1.0 + _SQRT5 * nu + (5.0 / 3.0) * W) * e
        phi1 = -(5.0 / 6.0) * (1.0 + _SQRT5 * nu) * e
        phi2 = (25.0 / 12.0) * e
        return phi, phi1, phi2
    if kernel_type == "RatQu":
        B = 1.0 + W / alpha
        phi = B ** (-alpha)
        phi1 = -(B ** (-alpha - 1.0))
        phi2 = (1.0 + 1.0 / alpha) * B ** (-alpha - 2.0)
        return phi, phi1, phi2
    raise ValueError(kernel_type)


def _n_scratch(kernel_type: str) -> int:
    """VMEM scratch tiles per kernel family.  SqExp needs one (phi' = -phi,
    phi'' = phi).  Ma5f2/RatQu store (phi, phi', phi'') DIRECTLY in three
    tiles: an earlier 2-tile variant reconstructed them algebraically in
    every derivative tile, and the reconstruction (several VPU multiplies,
    and for RatQu two DIVIDES per element) ran (1+d)^2 times per point-block
    -- measured 380/333 GB/s (Ma5f2/RatQu) at n_data=8192 vs SqExp's 639.
    Three 512^2 scratch tiles are proven to fit (the VJP kernel uses the
    same budget, _auto_block_sq)."""
    return 1 if kernel_type == "SqExp" else 3


def _phi_from_scratch(kernel_type: str, scratches, alpha):
    """(phi, phi', phi'') from the stored scratch tiles (pure loads except
    SqExp's negation, which is a single VPU op)."""
    if kernel_type == "SqExp":
        s0 = scratches[0][:, :]
        return s0, -s0, s0
    return (scratches[0][:, :], scratches[1][:, :], scratches[2][:, :])


def _scratch_tile(kernel_type: str, W, alpha):
    """The stored quantities as functions of W (computed once per
    point-block pair, at derivative tile (0, 0))."""
    if kernel_type == "SqExp":
        return (jnp.exp(-W),)
    if kernel_type == "Ma5f2":
        pos = W > 0.0
        nu = jnp.where(pos, jnp.sqrt(jnp.where(pos, W, 1.0)), 0.0)
        e = jnp.exp(-_SQRT5 * nu)
        phi = (1.0 + _SQRT5 * nu + (5.0 / 3.0) * W) * e
        phi1 = -(5.0 / 6.0) * (1.0 + _SQRT5 * nu) * e
        phi2 = (25.0 / 12.0) * e
        return phi, phi1, phi2
    if kernel_type == "RatQu":
        B = 1.0 + W / alpha
        Bma = B ** (-alpha)
        rB = 1.0 / B
        phi1 = -Bma * rB
        phi2 = (1.0 + 1.0 / alpha) * Bma * rB * rB
        return Bma, phi1, phi2
    raise ValueError(kernel_type)


def _kern_tile_kernel(theta_ref, alpha_ref, x1_ref, x2_ref, out_ref,
                      *scratches, kernel_type: str, dim: int,
                      nb1: int, nb2: int):
    a = pl.program_id(2)          # row derivative block (0 = value)
    b = pl.program_id(3)          # col derivative block

    @pl.when((a == 0) & (b == 0))
    def _compute_phi():
        x1 = x1_ref[:, :]                        # (B1, dpad)
        x2 = x2_ref[:, :]
        W = jnp.zeros((x1.shape[0], x2.shape[0]), x1.dtype)
        for k in range(dim):                     # static unroll over dims
            rk = x1[:, k:k + 1] - x2[:, k:k + 1].T    # (B1, B2) broadcast
            W = W + theta_ref[0, k] * rk * rk
        for s_ref, s in zip(scratches,
                            _scratch_tile(kernel_type, W, alpha_ref[0, 0])):
            s_ref[:, :] = s

    phi, phi1, phi2 = _phi_from_scratch(kernel_type, scratches,
                                        alpha_ref[0, 0])

    a0 = (a == 0)
    b0 = (b == 0)
    ai = jnp.maximum(a - 1, 0)
    bi = jnp.maximum(b - 1, 0)
    th_a = theta_ref[0, ai]       # scalar SMEM load, dynamic index
    th_b = theta_ref[0, bi]
    # dynamic column selection as a one-hot contraction (Mosaic has no
    # dynamic_slice on values)
    x1 = x1_ref[:, :]
    x2 = x2_ref[:, :]
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, x1.shape[1]), 1)
    oh_a = (ids == ai).astype(x1.dtype)
    oh_b = (ids == bi).astype(x1.dtype)

    def _Ra():
        x1a = jnp.sum(x1 * oh_a, axis=1, keepdims=True)      # (B1, 1)
        x2a = jnp.sum(x2 * oh_a, axis=1, keepdims=True)
        return x1a - x2a.T                       # (B1, B2) via broadcast

    def _Rb():
        x1b = jnp.sum(x1 * oh_b, axis=1, keepdims=True)
        x2b = jnp.sum(x2 * oh_b, axis=1, keepdims=True)
        return x1b - x2b.T

    # (a, b) are GRID indices: branch per tile instead of a where-chain, so
    # each derivative tile evaluates only its own block formula (the fused
    # where evaluated all four on every element, making the assembly
    # VPU-bound: measured 378 GB/s at n_data=8192 where the branch version
    # clears 500+)
    @pl.when(a0 & b0)
    def _value_tile():
        out_ref[:, :] = phi

    @pl.when(a0 & jnp.logical_not(b0))
    def _col_grad_tile():
        out_ref[:, :] = -2.0 * th_b * _Rb() * phi1

    @pl.when(jnp.logical_not(a0) & b0)
    def _row_grad_tile():
        out_ref[:, :] = 2.0 * th_a * _Ra() * phi1

    @pl.when(jnp.logical_not(a0) & jnp.logical_not(b0))
    def _grad_grad_tile():
        delta_ab = (a == b).astype(phi.dtype)
        out_ref[:, :] = (-2.0 * th_a * delta_ab * phi1
                         - 4.0 * th_a * th_b * _Ra() * _Rb() * phi2)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _auto_block_sq(n1: int, n2: int) -> int:
    """Square tile for the VJP kernel (3 scratch tiles bound the area).
    Measured on a v5e (latency-cancelled, n_data=8192): block 128 ->
    157 GB/s, 256 -> 322, 512 -> 384 (1024 exceeds VMEM)."""
    m = min(n1, n2)
    if m >= 1024:
        return 512
    if m >= 512:
        return 256
    return 128


def _auto_block(n1: int, n2: int, kernel_type: str = "SqExp"):
    """(b1, b2) tile for the forward assembly.  Measured on the v5e
    (latency-cancelled, SqExp, with per-tile branch dispatch): at
    n_data=8192 (512,512) -> 608 GB/s and (512,1024) -> 641 (78% of the
    ~820 GB/s HBM roofline; the where-chain version peaked at 378); at
    n_data=4096 (512,1024) -> 671.  (1024,1024) fails the Mosaic compile
    (VMEM); the 3-scratch families (Ma5f2/RatQu, see _n_scratch) also fail
    at (512,1024) and keep (512,512), where storing phi/phi'/phi'' directly
    measures 557/503 GB/s at n_data=8192 (up from 380/333 with 2-scratch
    algebraic reconstruction)."""
    m = min(n1, n2)
    wide = _n_scratch(kernel_type) == 1
    if m >= 1024:
        return (512, 1024) if wide else (512, 512)
    if m >= 512:
        return (256, 512)
    return (128, 128)


@functools.partial(jax.jit, static_argnames=("kernel_type", "dim", "block"))
def _kern_grad_pallas_padded(kernel_type, dim, block, x1p, x2p, theta, alpha):
    """x1p/x2p already padded to multiples of the (b1, b2) tile rows."""
    b1, b2 = block
    n1, dpad = x1p.shape
    n2 = x2p.shape[0]
    nb1 = n1 // b1
    nb2 = n2 // b2
    A = dim + 1
    dtype = x1p.dtype

    grid = (nb1, nb2, A, A)
    kernel = functools.partial(_kern_tile_kernel, kernel_type=kernel_type,
                               dim=dim, nb1=nb1, nb2=nb2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dpad), lambda i, j, a, b: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),            # theta
            pl.BlockSpec((1, 1), lambda i, j, a, b: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),            # alpha
            pl.BlockSpec((b1, dpad), lambda i, j, a, b: (_i32(i), _i32(0)),
                         memory_space=pltpu.VMEM),            # x1 tile
            pl.BlockSpec((b2, dpad), lambda i, j, a, b: (_i32(j), _i32(0)),
                         memory_space=pltpu.VMEM),            # x2 tile
        ],
        out_specs=pl.BlockSpec(
            (b1, b2),
            lambda i, j, a, b: (_i32(a) * _i32(nb1) + _i32(i),
                                _i32(b) * _i32(nb2) + _i32(j)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A * n1, A * n2), dtype),
        scratch_shapes=[pltpu.VMEM((b1, b2), dtype)
                        for _ in range(_n_scratch(kernel_type))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
    )(theta.reshape(1, dim), jnp.reshape(alpha, (1, 1)), x1p, x2p)
    return out


def kern_grad_pallas(kernel_type: str, x1: jnp.ndarray, x2: jnp.ndarray,
                     theta: jnp.ndarray, alpha=None, block: int = None):
    """Gradient-enhanced kernel matrix ((1+d)n1, (1+d)n2) via the Pallas
    tiled assembly.  Pads the point count up to ``block`` and slices the
    result back; derivative blocks are laid out exactly as kernels.kern_grad
    (values first, then gradient blocks grouped by coordinate)."""
    n1, dim = x1.shape
    n2 = x2.shape[0]
    dtype = x1.dtype
    if block is None:
        block = _auto_block(n1, n2, kernel_type)
    elif isinstance(block, int):
        block = (block, block)
    b1, b2 = block
    n1p = _round_up(n1, b1)
    n2p = _round_up(n2, b2)
    # pad points far away so padded entries are harmless (sliced off anyway)
    x1p = jnp.pad(x1, ((0, n1p - n1), (0, 0)), constant_values=1e6)
    x2p = jnp.pad(x2, ((0, n2p - n2), (0, 0)), constant_values=-1e6)
    a = jnp.asarray(0.0 if alpha is None else alpha, dtype)
    out = _kern_grad_pallas_padded(kernel_type, dim, tuple(block), x1p, x2p,
                                   jnp.asarray(theta, dtype), a)
    A = dim + 1
    # slice the padded rows/cols out of each derivative block
    out = out.reshape(A, n1p, A, n2p)[:, :n1, :, :n2]
    return out.reshape(A * n1, A * n2)


# ---------------------------------------------------------------------------
# Backward: fused theta-cotangent contraction (no dK/dtheta materialization)
# ---------------------------------------------------------------------------

def _phi3_tile(kernel_type: str, W, alpha, dtype):
    """phi''' as a function of the weighted squared distance.  Singular at
    W -> 0 for Matern-5/2; the caller's contraction multiplies it by
    Ra*Rb*Rc^2 which vanishes there, so a finite-guard is enough."""
    if kernel_type == "SqExp":
        return -jnp.exp(-W)
    if kernel_type == "Ma5f2":
        pos = W > 0.0
        nu = jnp.sqrt(jnp.where(pos, W, 1.0))
        nu_safe = jnp.maximum(nu, 1e-20)
        e = jnp.exp(-_SQRT5 * nu)
        return jnp.where(pos, -(25.0 * _SQRT5 / 24.0) * e / nu_safe,
                         jnp.zeros_like(W))
    if kernel_type == "RatQu":
        B = 1.0 + W / alpha
        return -(1.0 + 1.0 / alpha) * (1.0 + 2.0 / alpha) * B ** (-alpha - 3.0)
    raise ValueError(kernel_type)


def _kern_vjp_tile_kernel(theta_ref, alpha_ref, x1_ref, x2_ref, gbar_ref,
                          out_ref, phi1_s, phi2_s, phi3_s, acc_s, *,
                          kernel_type: str, dim: int, nb1: int, nb2: int):
    """One (point-pair, derivative-block) tile of
    theta_bar[c] = sum_{a,b,i,j} Gbar[a,b][i,j] * dK_ab[i,j]/dtheta_c.

    The W-chain part (coefficient of Rc^2 = (x1c - x2c)^2) is contracted for
    ALL c at once via the quadratic-form identity
        sum_ij M[i,j] Rc^2[i,j]
          = x1c^2 . rowsum(M) + colsum(M) . x2c^2 - 2 * diag(x1^T M x2)[c],
    whose cross term is an MXU matmul; the explicit-coefficient (delta)
    parts are rank-1 one-hot adds.  theta_bar accumulates in VMEM scratch
    across the sequential grid and is written once at the last step.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = pl.program_id(2)
    b = pl.program_id(3)
    dtype = x1_ref.dtype

    @pl.when((a == 0) & (b == 0))
    def _compute_phi():
        x1 = x1_ref[:, :]
        x2 = x2_ref[:, :]
        W = jnp.zeros((x1.shape[0], x2.shape[0]), dtype)
        for k in range(dim):
            rk = x1[:, k:k + 1] - x2[:, k:k + 1].T
            W = W + theta_ref[0, k] * rk * rk
        _, phi1, phi2 = _phi_tile(kernel_type, W, alpha_ref[0, 0])
        phi1_s[:, :] = phi1
        phi2_s[:, :] = phi2
        phi3_s[:, :] = _phi3_tile(kernel_type, W, alpha_ref[0, 0], dtype)

    @pl.when((i == 0) & (j == 0) & (a == 0) & (b == 0))
    def _init_acc():
        acc_s[:, :] = jnp.zeros_like(acc_s)

    phi1 = phi1_s[:, :]
    phi2 = phi2_s[:, :]
    phi3 = phi3_s[:, :]
    g = gbar_ref[:, :]

    a0 = (a == 0)
    b0 = (b == 0)
    ai = jnp.maximum(a - 1, 0)
    bi = jnp.maximum(b - 1, 0)
    th_a = theta_ref[0, ai]
    th_b = theta_ref[0, bi]
    x1 = x1_ref[:, :]
    x2 = x2_ref[:, :]
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, x1.shape[1]), 1)
    oh_a = (ids == ai).astype(dtype)
    oh_b = (ids == bi).astype(dtype)
    x1a = jnp.sum(x1 * oh_a, axis=1, keepdims=True)
    x2a = jnp.sum(x2 * oh_a, axis=1, keepdims=True)
    x1b = jnp.sum(x1 * oh_b, axis=1, keepdims=True)
    x2b = jnp.sum(x2 * oh_b, axis=1, keepdims=True)
    Ra = x1a - x2a.T
    Rb = x1b - x2b.T
    delta_ab = (a == b).astype(dtype)

    # W-chain coefficient M_W (multiplies Rc^2) for this derivative block
    mw = jnp.where(
        a0 & b0, phi1,
        jnp.where(a0, -2.0 * th_b * Rb * phi2,
                  jnp.where(b0, 2.0 * th_a * Ra * phi2,
                            -2.0 * th_a * delta_ab * phi2
                            - 4.0 * th_a * th_b * Ra * Rb * phi3)))
    M = g * mw
    rs = jnp.sum(M, axis=1, keepdims=True)                      # (B, 1)
    cs = jnp.sum(M, axis=0, keepdims=True)                      # (1, B)
    q1 = jnp.sum((x1 * x1) * rs, axis=0, keepdims=True)         # (1, dpad)
    q2 = jnp.sum((x2 * x2) * cs.T, axis=0, keepdims=True)
    Mx2 = jnp.dot(M, x2, preferred_element_type=dtype)          # (B, dpad)
    cross = jnp.sum(x1 * Mx2, axis=0, keepdims=True)
    contrib = q1 + q2 - 2.0 * cross

    # explicit-coefficient parts (the d/dtheta of the th_a/th_b factors)
    s_b = jnp.sum(g * (-2.0 * Rb * phi1))          # -> theta_bar[b-1] (a0)
    s_a = jnp.sum(g * (2.0 * Ra * phi1))           # -> theta_bar[a-1] (b0)
    s_diag = jnp.sum(g * (-2.0 * phi1))            # -> theta_bar[a-1] (a==b)
    rrphi2 = g * (Ra * Rb * phi2)
    s_ga = jnp.sum(rrphi2) * (-4.0 * th_b)         # -> theta_bar[a-1]
    s_gb = jnp.sum(rrphi2) * (-4.0 * th_a)         # -> theta_bar[b-1]

    zero = jnp.zeros((), dtype)
    add_a = jnp.where(a0, zero,
                      jnp.where(b0, s_a, s_ga + delta_ab * s_diag))
    add_b = jnp.where(b0, zero, jnp.where(a0, s_b, s_gb))
    contrib = contrib + add_a * oh_a + add_b * oh_b

    acc_s[:, :] = acc_s[:, :] + contrib

    @pl.when((i == nb1 - 1) & (j == nb2 - 1)
             & (a == dim) & (b == dim))
    def _write_out():
        out_ref[:, :] = acc_s[:, :]


@functools.partial(jax.jit, static_argnames=("kernel_type", "dim", "block"))
def _kern_vjp_theta_padded(kernel_type, dim, block, x1p, x2p, theta, alpha,
                           gbar):
    n1, dpad = x1p.shape
    n2 = x2p.shape[0]
    nb1 = n1 // block
    nb2 = n2 // block
    A = dim + 1
    dtype = x1p.dtype

    grid = (nb1, nb2, A, A)
    kernel = functools.partial(_kern_vjp_tile_kernel, kernel_type=kernel_type,
                               dim=dim, nb1=nb1, nb2=nb2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dpad), lambda i, j, a, b: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, a, b: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dpad), lambda i, j, a, b: (_i32(i), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, dpad), lambda i, j, a, b: (_i32(j), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, block),
                         lambda i, j, a, b: (_i32(a) * _i32(nb1) + _i32(i),
                                             _i32(b) * _i32(nb2) + _i32(j)),
                         memory_space=pltpu.VMEM),                # Gbar tile
        ],
        out_specs=pl.BlockSpec((1, dpad), lambda i, j, a, b: (_i32(0), _i32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, dpad), dtype),
        scratch_shapes=[
            pltpu.VMEM((block, block), dtype),
            pltpu.VMEM((block, block), dtype),
            pltpu.VMEM((block, block), dtype),
            pltpu.VMEM((1, dpad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
    )(theta.reshape(1, dim), jnp.reshape(alpha, (1, 1)), x1p, x2p, gbar)
    return out[0, :dim]


def kern_grad_pallas_vjp_theta(kernel_type: str, x1: jnp.ndarray,
                               x2: jnp.ndarray, theta: jnp.ndarray, alpha,
                               gbar: jnp.ndarray, block: int = None):
    """theta-cotangent of ``kern_grad_pallas``: contracts the covariance
    cotangent ``gbar`` ((1+d)n1, (1+d)n2) against dK/dtheta tile-by-tile --
    dK is never materialized (the XLA closed-form VJP builds the full
    (d, N, N) tensor; this kernel reads Gbar once and writes d scalars)."""
    n1, dim = x1.shape
    n2 = x2.shape[0]
    dtype = x1.dtype
    if block is None:
        block = _auto_block_sq(n1, n2)
    n1p = _round_up(n1, block)
    n2p = _round_up(n2, block)
    x1p = jnp.pad(x1, ((0, n1p - n1), (0, 0)), constant_values=1e6)
    x2p = jnp.pad(x2, ((0, n2p - n2), (0, 0)), constant_values=-1e6)
    A = dim + 1
    gb = gbar.reshape(A, n1, A, n2)
    gb = jnp.pad(gb, ((0, 0), (0, n1p - n1), (0, 0), (0, n2p - n2)))
    gb = gb.reshape(A * n1p, A * n2p)
    a = jnp.asarray(0.0 if alpha is None else alpha, dtype)
    return _kern_vjp_theta_padded(kernel_type, dim, block, x1p, x2p,
                                  jnp.asarray(theta, dtype), a, gb)
