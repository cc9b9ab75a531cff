"""Fused masked-Gram Pallas kernels — the MXU hot path of dense ALS.

Every CG step of a dense-masked ALS half-iteration is

    out = ((Q @ Be^T) * W) @ Be          # [R,K],[S,K],[R,S] -> [R,K]

(the dense-batch form of the reference's per-row normal equations,
/root/reference/src/common.c:1098,2787).  Through XLA this materializes the
[R, S] product in HBM twice (write + read ~ 8 bytes/entry); these kernels
instead stream W tile-by-tile through VMEM and keep the [block_r, block_s]
intermediate on-chip, so HBM traffic per matvec drops to one read of W
(1-2 bytes/entry) — an ~8x cut that makes the fit compute-bound on the MXU.

Kernels:
  * masked_gram_matvec:  ((Q Be^T) . W) Be           (CG operator)
  * masked_rhs:          ((X - mb) . W) Be           (CG right-hand side)

X is stored *uncentered* in bf16 (explicit-feedback ratings on half-point
grids are exactly representable), with the global mean and the opposing
bias folded into mb[s] = mu + opp_bias[s]; W is an int8 0/1 mask when
unweighted (exact) or the f32 weights.  The only inexactness of the bf16
path is the rounding of the factor matrices themselves (~0.4% on the Gram),
which perturbs each ridge solve far less than the CG truncation the
reference already accepts (max_cg_steps=3).  Pass f32 Q/Be for an exact
(multi-pass MXU) variant — used for the final polish iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# r3 TPU sweep (scripts/sweep_masked_kernel.py, dependency-chained timing at
# the ML10M shape): BLOCK_R=1024 beats 512 at every stream width; at the
# pad_dim-selected bs=2816 the int8-mask matvec is 5.40 ms.
# r4 floor decomposition (scripts/sweep_kernel_probe{2,3}.py) KILLED the
# r3 header's "5x above the HBM floor" narrative: the floor was computed
# from HBM bytes (790 MB / 819 GB/s ~ 1.0 ms), but element-wise int8
# consumption on this chip is ELEMENT-rate-bound, not byte-bound.
# Measured: plain-XLA jnp.sum over the same int8 W takes 3.50 ms; a
# pallas stream+reduce of W alone takes 4.28-4.57 ms across ALL block
# geometries (512-8832 x 384-4096); a bf16 W (2x the bytes) costs only
# 1.3 ms more, giving the rate model 4 ps/element + 1.7 ps/byte — the
# per-element term dominates.  Within the kernel: full body 5.38 ms,
# dots-only 5.25 ms (mask multiply ~0.13 ms, fused well), W-stream-only
# 4.12 ms.  So the kernel sits ~1.25x above the irreducible W-stream
# floor, and the gap IS the two MXU dots.  bf16-output dots
# (preferred_element_type=bf16) are rejected by Mosaic ("matmul acc must
# be 32-bit"); storing W pre-cast to bf16 gains nothing (5.49 ms).
# Candidates that cannot win here: bit-packed masks (8x fewer bytes but
# unpack pays the same per-element cost that dominates), gather-based
# sparse (4.3 ns/slot x 10M = 43 ms), complement masking (98.7% dense).
BLOCK_R = int(os.environ.get("CMFREC_TPU_BLOCK_R", "1024"))
# Preferred inner (streamed) block widths; all multiples of 128 lanes.
# Small widths cause an out-block revisit pipeline stall (measured 4-5x
# slowdown at bs<=1024 on v5e), so candidates stay in [2048, 4096].
_BS_CANDIDATES = (2816, 3072, 2560, 3328, 2048, 3584, 2304, 3840, 4096)
_VMEM_LIMIT = 100 * 1024 * 1024


def pad_dim(dim: int, row_mult: int = 1) -> tuple[int, int]:
    """Pad `dim` so it divides by BLOCK_R * row_mult and by some preferred
    inner block (row_mult = mesh size when the row axis is device-sharded).

    Returns (dim_padded, block_s_for_streaming_this_dim).
    """
    row_req = BLOCK_R * max(row_mult, 1)
    best = None
    for bs in _BS_CANDIDATES:
        # lcm step: both constraints are powers-of-two times small ints
        step = int(np.lcm(bs, row_req))
        padded = -(-dim // bs) * bs
        if padded % row_req:
            padded = -(-dim // step) * step
        if best is None or padded < best[0]:
            best = (padded, bs)
    return best


def _matvec_kernel(q_ref, be_ref, w_ref, out_ref):
    t = jnp.dot(q_ref[...], be_ref[...].T, preferred_element_type=jnp.float32)
    w = w_ref[...]
    if w.dtype == jnp.bfloat16 and be_ref.dtype == jnp.bfloat16:
        # 2-pass VPU chain: cast t once, multiply in bf16 (the mask is 0/1
        # or already-rounded weights, so bf16 multiply is exact w.r.t. the
        # bf16 operand path)
        t = t.astype(jnp.bfloat16) * w
    else:
        t = (t * w.astype(jnp.float32)).astype(be_ref.dtype)
    contrib = jnp.dot(t, be_ref[...], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _rhs_kernel(x_ref, w_ref, mb_ref, be_ref, out_ref):
    v = x_ref[...].astype(jnp.float32) - mb_ref[...]
    v = (v * w_ref[...].astype(jnp.float32)).astype(be_ref.dtype)
    contrib = jnp.dot(v, be_ref[...], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret", "mesh", "axis")
)
def masked_gram_matvec(Q, Be, W, *, block_s: int, interpret: bool = False,
                       mesh=None, axis: str = "d"):
    """((Q @ Be^T) * W) @ Be, fused.  Q:[R,K] Be:[S,K] W:[R,S] -> [R,K] f32.

    R % BLOCK_R == 0 and S % block_s == 0 are required (see pad_dim; with a
    mesh, R % (BLOCK_R * n_dev) == 0).  W may be int8 (0/1 mask), bf16, or
    f32; Q/Be bf16 for the fast path.  With ``mesh``, Q and W are row-sharded
    over ``axis``, Be replicated, and each device runs the kernel on its row
    shard — zero collectives (SURVEY.md §2.4 P1: the DP axis).
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        run = jax.shard_map(
            functools.partial(masked_gram_matvec, block_s=block_s,
                              interpret=interpret),
            mesh=mesh,
            in_specs=(P(axis), P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        return run(Q, Be, W)
    R, K = Q.shape
    S = Be.shape[0]
    assert R % BLOCK_R == 0 and S % block_s == 0, (R, S, block_s)
    # trace in 32-bit mode: under jax_enable_x64 the grid index maps produce
    # i64, which Mosaic cannot legalize (the operands are f32/bf16/int8 and
    # unaffected)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _matvec_kernel,
            grid=(R // BLOCK_R, S // block_s),
            in_specs=[
                pl.BlockSpec((BLOCK_R, K), lambda i, j: (i, 0)),
                pl.BlockSpec((block_s, K), lambda i, j: (j, 0)),
                pl.BlockSpec((BLOCK_R, block_s), lambda i, j: (i, j)),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, K), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(Q, Be, W)


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret", "mesh", "axis")
)
def masked_rhs(X, W, mb, Be, *, block_s: int, interpret: bool = False,
               mesh=None, axis: str = "d"):
    """((X - mb[None, :]) * W) @ Be, fused.  X,W:[R,S] mb:[S] Be:[S,K].
    With ``mesh``, X/W row-sharded over ``axis``, mb/Be replicated."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        run = jax.shard_map(
            functools.partial(masked_rhs, block_s=block_s,
                              interpret=interpret),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=P(axis),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        return run(X, W, mb, Be)
    R, S = X.shape
    K = Be.shape[1]
    assert R % BLOCK_R == 0 and S % block_s == 0, (R, S, block_s)
    mb2 = mb.astype(jnp.float32).reshape(1, S)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _rhs_kernel,
            grid=(R // BLOCK_R, S // block_s),
            in_specs=[
                pl.BlockSpec((BLOCK_R, block_s), lambda i, j: (i, j)),
                pl.BlockSpec((BLOCK_R, block_s), lambda i, j: (i, j)),
                pl.BlockSpec((1, block_s), lambda i, j: (0, j)),
                pl.BlockSpec((block_s, K), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, K), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(X, W, mb2, Be)
