"""Fused bucket-CG Pallas kernel — the sparse (gather) hot path.

A bucketed ALS half-iteration solves, for every padded row r of a bucket,

    (Gfix + diag(lam_r) + sum_l cw[r,l] m[r,l] m[r,l]^T) a_r
        = r0_r + sum_l cv[r,l] m[r,l]

by warm-started truncated CG (ops/rowsolve.solve_cg semantics, mirroring
``max_cg_steps`` truncation at /root/reference/src/common.c:1098).  Through
XLA, every CG step re-reads the gathered slab ms[R, L, K] from HBM twice
(6+ full-slab passes for 3 steps).  This kernel tiles the rows, keeps each
slab tile resident in VMEM, and runs the RHS build plus ALL CG steps
on-chip — HBM traffic drops to ONE slab read (plus the small vectors),
which is the memory floor of the solve.

The gather itself stays in XLA (measured entry-rate-bound at ~4.3 ns per
row regardless of row bytes; a DMA-per-entry Pallas gather cannot beat the
descriptor rate at ~100 bytes/row).

Numerics match rowsolve.solve_cg with mxu_bf16: the slab and the per-step
direction are bf16 operands, all accumulation and CG state f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
# slab tile target: TR * L * 512B (f32 upcast, lane-padded to 128) <= ~4 MB
_TILE_ELEMS = 8192
_REL_TOL = 1e-12
_STOP_TOL = 1e-8


def row_tile(R: int, L: int) -> int:
    """Largest row-tile <= target that divides R and is a multiple of 8."""
    cap = min(R, max(8, _TILE_ELEMS // max(L, 1)))
    for tr in range(cap - cap % 8, 7, -8):
        if R % tr == 0:
            return tr
    return 8 if R % 8 == 0 else max(
        d for d in range(1, min(R, 8) + 1) if R % d == 0
    )


def _cg_kernel(ms_ref, cw_ref, cv_ref, gfix_ref, lam_ref, r0_ref, a0_ref,
               out_ref, *, n_steps: int, tol: float):
    # [TR, L, K] slab kept in its native dtype (bf16 fast path): the
    # per-row matvecs are elementwise-multiply + axis reductions on the
    # VPU (batched-dim dot_generals do not lower in Mosaic) — products at
    # slab precision, accumulation in f32, mirroring the MXU-bf16 trade.
    ms = ms_ref[...]
    cw = cw_ref[...].astype(jnp.float32)  # [TR, L]
    gfix = gfix_ref[...].astype(jnp.float32)  # [K, K]
    a = a0_ref[...].astype(jnp.float32)  # [TR, K]
    lam = None if lam_ref is None else lam_ref[...].astype(jnp.float32)

    def matvec(v):
        vb = v.astype(ms.dtype)
        t = jnp.sum((ms * vb[:, None, :]).astype(jnp.float32), axis=2) * cw
        # bf16 2D->3D reshape doesn't legalize in Mosaic: expand in f32,
        # then convert the 3D view
        tb = t[:, :, None].astype(ms.dtype)
        out = jnp.sum((ms * tb).astype(jnp.float32), axis=1)
        # gfix is symmetric (a Gram plus a diagonal): v @ gfix == v @ gfix.T
        out = out + jnp.dot(v, gfix, preferred_element_type=jnp.float32)
        if lam is not None:
            out = out + v * lam
        return out

    cv3 = cv_ref[...][:, :, None].astype(ms.dtype)  # [TR, L, 1]
    rhs = jnp.sum((ms * cv3).astype(jnp.float32), axis=1)
    if r0_ref is not None:
        rhs = rhs + r0_ref[...].astype(jnp.float32)

    r = rhs - matvec(a)
    p = r
    rz = jnp.sum(r * r, axis=-1)
    # Two-tolerance stopping, bitwise-matching rowsolve.solve_cg (which
    # mirrors /root/reference/src/common.c:1147,1181): rows whose INITIAL
    # residual is already <= 1e-12 are skipped outright; a live row stops
    # once its post-step residual falls <= 1e-8 (p frozen thereafter).
    live = rz > jnp.asarray(tol, jnp.float32)

    def body(_, carry):
        a, r, p, rz, live = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap, axis=-1)
        alpha = jnp.where(live, rz / jnp.where(denom == 0, 1.0, denom), 0.0)
        a = a + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        rz_new = jnp.sum(r * r, axis=-1)
        live = live & (rz_new > jnp.asarray(_STOP_TOL, jnp.float32))
        beta = jnp.where(live, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = jnp.where(live[:, None], r + beta[:, None] * p, p)
        return (a, r, p, jnp.where(live, rz_new, rz), live)

    a, _, _, _, _ = jax.lax.fori_loop(0, n_steps, body, (a, r, p, rz, live))
    out_ref[...] = a


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "interpret"),
)
def bucket_cg(ms, cw, cv, gfix, lam_row, r0, a0, *, n_steps: int,
              interpret: bool = False):
    """Fused warm-started truncated CG over one bucket.

    ms: [R, L, K] gathered slab (bf16 fast path or f32);
    cw/cv: [R, L] f32 Gram/rhs coefficients (0 on padding);
    gfix: [K, K] f32 shared base — G0 (+ diag(lam) when lam_row is None);
    lam_row: optional [R, K] per-row ridge diagonal (scale_lam);
    r0: optional [R, K] rhs base; a0: [R, K] warm start.
    Returns [R, K] f32 — bitwise semantics of rowsolve.solve_cg(mxu_bf16).
    """
    R, L, K = ms.shape
    TR = row_tile(R, L)
    grid = (R // TR,)

    in_specs = [
        pl.BlockSpec((TR, L, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((TR, L), lambda i: (i, 0)),
        pl.BlockSpec((TR, L), lambda i: (i, 0)),
        pl.BlockSpec((K, K), lambda i: (0, 0)),
    ]
    args = [ms, cw, cv, gfix]
    if lam_row is not None:
        in_specs.append(pl.BlockSpec((TR, K), lambda i: (i, 0)))
        args.append(lam_row)
    if r0 is not None:
        in_specs.append(pl.BlockSpec((TR, K), lambda i: (i, 0)))
        args.append(r0)
    in_specs.append(pl.BlockSpec((TR, K), lambda i: (i, 0)))
    args.append(a0)

    def kernel(*refs):
        i = 0
        ms_ref, cw_ref, cv_ref, gfix_ref = refs[:4]
        i = 4
        lam_ref = None
        if lam_row is not None:
            lam_ref = refs[i]
            i += 1
        r0_ref = None
        if r0 is not None:
            r0_ref = refs[i]
            i += 1
        a0_ref, out_ref = refs[i], refs[i + 1]
        _cg_kernel(ms_ref, cw_ref, cv_ref, gfix_ref, lam_ref, r0_ref,
                   a0_ref, out_ref, n_steps=n_steps, tol=_REL_TOL)

    # trace in 32-bit mode: under jax_enable_x64 the grid index maps produce
    # i64, which Mosaic cannot legalize
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TR, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(*args)


def _cg_kernel_packed(ms_ref, cwe_ref, cwo_ref, cve_ref, cvo_ref, gfix_ref,
                      lam_ref, r0_ref, a0_ref, out_ref, *, n_steps: int,
                      tol: float):
    """Pack-2 variant for K <= 64: two slab entries share one 128-lane row
    (lanes [0:64] = even entry, [64:128] = odd entry), so every VPU lane
    does useful work — 2x the arithmetic density of the lane-padded form.
    """
    ms = ms_ref[...]  # [TR, L2, 128] bf16
    cwe = cwe_ref[...].astype(jnp.float32)  # [TR, L2]
    cwo = cwo_ref[...].astype(jnp.float32)
    gfix = gfix_ref[...].astype(jnp.float32)  # [64, 64]
    a = a0_ref[...].astype(jnp.float32)  # [TR, 64]
    lam = None if lam_ref is None else lam_ref[...].astype(jnp.float32)
    TR, L2, _ = ms.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, L2, 128), 2)

    def halves_dot(v):
        """per-entry dot(m, v) for both packed halves."""
        v2 = jnp.concatenate([v, v], axis=1).astype(ms.dtype)  # [TR, 128]
        prod = ms * v2[:, None, :]
        te = jnp.sum(prod[:, :, :64].astype(jnp.float32), axis=2)
        to = jnp.sum(prod[:, :, 64:].astype(jnp.float32), axis=2)
        return te, to

    def backproj(te, to):
        """sum_l t_l * m_l folded back to [TR, 64]."""
        ce = jnp.where(lane < 64, te[:, :, None], to[:, :, None])
        pre = jnp.sum((ms * ce.astype(ms.dtype)).astype(jnp.float32), axis=1)
        return pre[:, :64] + pre[:, 64:]

    def matvec(v):
        te, to = halves_dot(v)
        out = backproj(te * cwe, to * cwo)
        out = out + jnp.dot(v, gfix, preferred_element_type=jnp.float32)
        if lam is not None:
            out = out + v * lam
        return out

    rhs = backproj(cve_ref[...].astype(jnp.float32),
                   cvo_ref[...].astype(jnp.float32))
    if r0_ref is not None:
        rhs = rhs + r0_ref[...].astype(jnp.float32)

    r = rhs - matvec(a)
    p = r
    rz = jnp.sum(r * r, axis=-1)
    # same two-tolerance stopping as _cg_kernel / rowsolve.solve_cg
    live = rz > jnp.asarray(tol, jnp.float32)

    def body(_, carry):
        a, r, p, rz, live = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap, axis=-1)
        alpha = jnp.where(live, rz / jnp.where(denom == 0, 1.0, denom), 0.0)
        a = a + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        rz_new = jnp.sum(r * r, axis=-1)
        live = live & (rz_new > jnp.asarray(_STOP_TOL, jnp.float32))
        beta = jnp.where(live, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = jnp.where(live[:, None], r + beta[:, None] * p, p)
        return (a, r, p, jnp.where(live, rz_new, rz), live)

    a, _, _, _, _ = jax.lax.fori_loop(0, n_steps, body, (a, r, p, rz, live))
    out_ref[...] = a


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def bucket_cg_packed(ms2, cwe, cwo, cve, cvo, gfix, lam_row, r0, a0, *,
                     n_steps: int, interpret: bool = False):
    """Pack-2 fused CG: ms2 [R, L/2, 128] (even entry in lanes [0:64], odd
    in [64:128], K padded to 64); cwe/cwo/cve/cvo [R, L/2]; gfix [64, 64];
    lam_row/r0/a0 [R, 64].  Same semantics as bucket_cg."""
    R, L2, _ = ms2.shape
    TR = row_tile(R, 2 * L2)
    grid = (R // TR,)

    specs = [
        pl.BlockSpec((TR, L2, 128), lambda i: (i, 0, 0)),
        pl.BlockSpec((TR, L2), lambda i: (i, 0)),
        pl.BlockSpec((TR, L2), lambda i: (i, 0)),
        pl.BlockSpec((TR, L2), lambda i: (i, 0)),
        pl.BlockSpec((TR, L2), lambda i: (i, 0)),
        pl.BlockSpec((64, 64), lambda i: (0, 0)),
    ]
    args = [ms2, cwe, cwo, cve, cvo, gfix]
    if lam_row is not None:
        specs.append(pl.BlockSpec((TR, 64), lambda i: (i, 0)))
        args.append(lam_row)
    if r0 is not None:
        specs.append(pl.BlockSpec((TR, 64), lambda i: (i, 0)))
        args.append(r0)
    specs.append(pl.BlockSpec((TR, 64), lambda i: (i, 0)))
    args.append(a0)

    def kernel(*refs):
        base = list(refs[:6])
        i = 6
        lam_ref = None
        if lam_row is not None:
            lam_ref = refs[i]
            i += 1
        r0_ref = None
        if r0 is not None:
            r0_ref = refs[i]
            i += 1
        a0_ref, out_ref = refs[i], refs[i + 1]
        _cg_kernel_packed(*base, lam_ref, r0_ref, a0_ref, out_ref,
                          n_steps=n_steps, tol=_REL_TOL)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((TR, 64), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 64), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(*args)


def can_fuse_cg(parts, jacobi: bool, dtype, max_width: int = 1024) -> bool:
    """Static gate for the fused kernel: one sparse part, no Jacobi
    preconditioning, f32 pipeline, moderate padded width, TPU backend,
    and a bucket big enough that the one-HBM-pass win beats the pallas
    dispatch/padding overheads (tunable via CMFREC_TPU_SPARSE_CG_MIN)."""
    import os

    # Default OFF: measured on v5e (LastFM shape), the fused kernel TIES
    # the XLA path inside the fused-iteration jit (both ~0.445 s/iter) —
    # the solve is bound by XLA's gather entry rate (~4.3 ns/slot) and the
    # VPU reduction rate, which the kernel cannot beat; enabling it only
    # adds per-shape compile time.  Set CMFREC_TPU_SPARSE_CG_MIN to a
    # bucket element count (e.g. 4194304) to enable for big buckets.
    min_elems = int(os.environ.get("CMFREC_TPU_SPARSE_CG_MIN", str(1 << 60)))
    R, L = parts[0].idx.shape
    return (
        len(parts) == 1
        and not jacobi
        and jnp.dtype(dtype) == jnp.float32
        and L <= max_width
        and L % 128 == 0  # Mosaic lane alignment (DP widths are 8-multiples)
        and R * L >= min_elems
        and jax.default_backend() == "tpu"
        and os.environ.get("CMFREC_TPU_NO_PALLAS", "0") != "1"
    )
