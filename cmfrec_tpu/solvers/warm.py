"""Warm- and cold-start factor inference for fitted models.

Implements the reference's collective_factors_warm / collective_factors_cold
/ factors_implicit (/root/reference/src/collective.c:3555,3309,
/root/reference/src/common.c:2063) as batched closed-form solves: new rows
never use CG (the reference notes CG "should not be used for new data",
/root/reference/src/common.c:650).

build_precomputed assembles the prediction-time caches corresponding to
precompute_collective_explicit (/root/reference/src/collective.c:10209):
the extended Gram BtB (and CtC for side info), kept on device for repeated
warm/cold calls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import rowsolve
from ..ops.rowsolve import SparsePart, length_mask
from .als import gram_matrix
from .drivers import _make_lam_vec, _resolve_lambdas, round_up


def _ext_B(model):
    """Extended opposing matrix for a new-user solve: coords
    [k_user | k | k_main | bias] built from B[:, k_item:] (+ ones).
    Served from the model's precompute cache when present
    (force_precompute_for_predictions /
    /root/reference/src/collective.c:10209)."""
    pre = getattr(model, "_precomputed", None) or {}
    if "extB" in pre:
        return pre["extB"], pre["width"], pre["k_pad"], pre["user_bias"]
    k = model.k
    ku = getattr(model, "k_user", 0)
    km = getattr(model, "k_main", 0)
    user_bias = model.user_bias_ is not None
    width = ku + k + km
    k_pad = round_up(width + 1, 8)
    B = np.asarray(model.B_, np.float64)
    n = B.shape[0]
    ki = getattr(model, "k_item", 0)
    ext = np.zeros((n, k_pad))
    ext[:, ku : ku + k + km] = B[:, ki:]
    if user_bias:
        ext[:, width] = 1.0
    return ext, width, k_pad, user_bias


def _ext_C(model, k_pad):
    """C occupies coords [0 : k_user+k] of the user system."""
    pre = getattr(model, "_precomputed", None) or {}
    if "extC" in pre and pre["extC"].shape[1] == k_pad:
        return pre["extC"]
    C = np.asarray(model.C_, np.float64)
    p = C.shape[0]
    ext = np.zeros((p, k_pad))
    ext[:, : C.shape[1]] = C
    return ext


def _u_part(model, U, k_pad, dtype):
    """Dense new-user side-info rows (NaN = missing) -> SparsePart inputs."""
    if U is None or model.C_ is None:
        return None
    U = np.asarray(U, np.float64)
    if model.U_colmeans_ is not None:
        U = U - model.U_colmeans_[None, :]
    R, p = U.shape
    obs = ~np.isnan(U)
    rows, cols = np.nonzero(obs)
    idx, vals, _, counts = pack_padded_rows(rows, cols, U[rows, cols], None, R)
    L = idx.shape[1]
    Ce = _ext_C(model, k_pad)
    msk = (np.arange(L)[None, :] < counts[:, None]).astype(np.float64)
    w_user = getattr(model, "w_user", 1.0)
    cw = w_user * msk
    cv = w_user * vals * msk
    return SparsePart(
        jnp.asarray(Ce, dtype), jnp.asarray(idx), jnp.asarray(cw, dtype),
        jnp.asarray(cv, dtype),
    ), counts


def factors_explicit_batch(model, idx, vals, wgt, lengths, U=None):
    """Closed-form warm factors for a batch of new users.

    idx/vals/wgt: [R, L] padded item ids / (raw) values / weights;
    lengths: [R] observation counts; U: optional [R, p] dense side info.
    Returns (a [R, k_user+k+k_main], bias [R]).
    """
    dtype = jnp.float64 if np.dtype(model.dtype_) == np.float64 else jnp.float32
    ext, width, k_pad, user_bias = _ext_B(model)
    lam6, l16 = _resolve_lambdas(model.lambda_, getattr(model, "l1_lambda", 0.0))
    k = model.k
    ku = getattr(model, "k_user", 0)
    km = getattr(model, "k_main", 0)

    R, L = idx.shape
    msk = (np.arange(max(L, 1))[None, :] < lengths[:, None]).astype(np.float64)
    v = np.asarray(vals, np.float64) - model.glob_mean_
    if model.item_bias_ is not None and L > 0:
        v = v - model.item_bias_[np.asarray(idx, np.int64)]
    w_main = getattr(model, "w_main", 1.0)
    ww = np.ones((R, L)) if wgt is None else np.asarray(wgt, np.float64)
    na0 = bool(getattr(model, "NA_as_zero", False))

    parts = []
    G0 = None
    r0 = None
    if L > 0:
        if na0:
            cw = w_main * (ww - 1.0) * msk
            cv = w_main * (ww * v + (model.glob_mean_
                  + (model.item_bias_[np.asarray(idx, np.int64)]
                     if model.item_bias_ is not None else 0.0))) * msk
        else:
            cw = w_main * ww * msk
            cv = cw * v
        parts.append(SparsePart(
            jnp.asarray(ext, dtype), jnp.asarray(idx),
            jnp.asarray(cw, dtype), jnp.asarray(cv, dtype),
        ))
    if na0:
        G0 = w_main * gram_matrix(jnp.asarray(ext, dtype))
        t = -model.glob_mean_ * np.ones(ext.shape[0])
        if model.item_bias_ is not None:
            t = t - model.item_bias_
        r0 = jnp.asarray(w_main * ext.T @ t, dtype)[None, :] * jnp.ones((R, 1), dtype)

    lam_mult = None
    u_counts = 0
    up = _u_part(model, U, k_pad, dtype) if U is not None else None
    if up is not None:
        parts.append(up[0])
        u_counts = up[1]

    if getattr(model, "scale_lam", False):
        if na0:
            # weighted: wsum over observed + 1 per missing entry; unweighted
            # degenerates to the full column count (common.c:708-710)
            base = ((ww * msk).sum(axis=1)
                    + (float(ext.shape[0]) - np.asarray(lengths, np.float64)))
        else:
            base = (ww * msk).sum(axis=1)
        if getattr(model, "scale_lam_sideinfo", False) and np.ndim(u_counts):
            base = base + u_counts
        lam_mult = jnp.asarray(np.maximum(base, 1.0), dtype)

    lam_vec = np.ones(k_pad)
    lam_vec[: ku + k + km] = lam6[2]
    if user_bias:
        lam_vec[width] = lam6[0]
    lam_vec = jnp.asarray(lam_vec, dtype)

    nonneg = bool(getattr(model, "nonneg", False))
    G, rhs = rowsolve.assemble_system(parts, lam_vec, lam_mult=lam_mult,
                                      G0=G0, r0=r0)
    if nonneg or np.any(l16 > 0):
        l1v = np.zeros(k_pad)
        l1v[: ku + k + km] = l16[2]
        a = rowsolve.solve_cd(G, rhs, jnp.asarray(l1v, dtype), nonneg=nonneg,
                              max_steps=int(getattr(model, "max_cd_steps", 100)))
    else:
        a = rowsolve.solve_chol(G, rhs)
    a = np.array(a)
    # rows with no data anywhere -> zeros (reference zero_out)
    if not na0 and U is None:
        a[np.asarray(lengths) == 0] = 0.0
    bias = a[:, width] if user_bias else np.zeros(R)
    return a[:, : ku + k + km], bias


def factors_implicit_batch(model, idx, vals, lengths):
    """WRMF warm factors: (BtB + sum alpha*x B B^T + lam) a = sum (1+alpha*x) B."""
    dtype = jnp.float64 if np.dtype(model.dtype_) == np.float64 else jnp.float32
    k = model.k
    ku = getattr(model, "k_user", 0)
    km = getattr(model, "k_main", 0)
    ki = getattr(model, "k_item", 0)
    width = ku + k + km
    k_pad = round_up(width, 8)
    B = np.asarray(model.B_, np.float64)
    ext = np.zeros((B.shape[0], k_pad))
    ext[:, ku : ku + k + km] = B[:, ki:]
    lam6, l16 = _resolve_lambdas(model.lambda_, getattr(model, "l1_lambda", 0.0))
    w_mult = float(getattr(model, "w_main_multiplier_", 1.0)) * float(
        getattr(model, "w_main", 1.0)
    )

    R, L = idx.shape
    msk = (np.arange(max(L, 1))[None, :] < lengths[:, None]).astype(np.float64)
    av = float(model.alpha) * np.asarray(vals, np.float64)
    cw = w_mult * av * msk
    cv = w_mult * (1.0 + av) * msk
    part = SparsePart(
        jnp.asarray(ext, dtype), jnp.asarray(idx),
        jnp.asarray(cw, dtype), jnp.asarray(cv, dtype),
    )
    G0 = w_mult * gram_matrix(jnp.asarray(ext, dtype))
    lam_vec = np.ones(k_pad)
    lam_vec[:width] = lam6[2]
    G, rhs = rowsolve.assemble_system([part], jnp.asarray(lam_vec, dtype), G0=G0)
    nonneg = bool(getattr(model, "nonneg", False))
    if nonneg or np.any(l16 > 0):
        l1v = np.zeros(k_pad)
        l1v[:width] = l16[2]
        a = rowsolve.solve_cd(G, rhs, jnp.asarray(l1v, dtype), nonneg=nonneg,
                              max_steps=int(getattr(model, "max_cd_steps", 100)))
    else:
        a = rowsolve.solve_chol(G, rhs)
    a = np.array(a)
    a[np.asarray(lengths) == 0] = 0.0
    return a[:, :width]


def pack_padded_rows(rows, cols, vals, wgt, m):
    """COO triplets -> padded [m, L] idx/val/weight blocks + per-row counts.

    Vectorized equivalent of the reference's per-row CSR slicing for
    new-data calls (no Python loop over rows)."""
    rows = np.asarray(rows, np.int64)
    order = np.argsort(rows, kind="stable")
    rows = rows[order]
    cols = np.asarray(cols, np.int64)[order]
    vals = np.asarray(vals, np.float64)[order]
    if wgt is not None:
        wgt = np.asarray(wgt, np.float64)[order]
    counts = np.bincount(rows, minlength=m).astype(np.int64)
    L = max(int(counts.max()) if counts.size else 0, 1)
    starts = np.concatenate([[0], np.cumsum(counts)])
    within = np.arange(rows.size) - starts[rows]
    idx = np.zeros((m, L), np.int64)
    vv = np.zeros((m, L))
    idx[rows, within] = cols
    vv[rows, within] = vals
    ww = None
    if wgt is not None:
        ww = np.zeros((m, L))
        ww[rows, within] = wgt
    return idx, vv, ww, counts


def offsets_warm_batch(model, idx, vals, lengths, wgt=None, base=None,
                       implicit=False, alpha=1.0):
    """Batched free ridge offset on top of the attribute projection
    (offsets_factors_warm, /root/reference/src/offsets.c:578): solve
    (sum_j c_j Bm_j Bm_j^T [+ BtB] + lam I) delta = residual terms, and
    return base + delta, one Cholesky batch for all R rows at once.
    """
    dtype = jnp.float64 if np.dtype(model.dtype_) == np.float64 else jnp.float32
    Bm = np.asarray(model.Bm_, np.float64)
    n, kk = Bm.shape
    k_pad = round_up(kk, 8)
    ext = np.zeros((n, k_pad))
    ext[:, :kk] = Bm
    lam6, _ = _resolve_lambdas(model.lambda_, 0.0)
    lam = float(lam6[2])
    idx = np.asarray(idx, np.int64)
    R, L = idx.shape
    msk = (np.arange(max(L, 1))[None, :]
           < np.asarray(lengths)[:, None]).astype(np.float64)
    if base is None:
        base = np.zeros((R, kk))
    base = np.asarray(base, np.float64)
    basep = np.zeros((R, k_pad))
    basep[:, :kk] = base
    v = np.asarray(vals, np.float64)
    dot = np.einsum("rlk,rk->rl", ext[idx], basep)
    G0 = r0 = None
    if implicit:
        av = alpha * v
        cw = av * msk
        cv = ((1.0 + av) - av * dot) * msk
        BtB = ext.T @ ext
        G0 = jnp.asarray(BtB, dtype)
        r0 = jnp.asarray(-(basep @ BtB), dtype)
    else:
        vv = v - model.glob_mean_
        if model.item_bias_ is not None and L > 0:
            vv = vv - np.asarray(model.item_bias_)[idx]
        ww = np.ones((R, L)) if wgt is None else np.asarray(wgt, np.float64)
        cw = ww * msk
        cv = cw * (vv - dot)
    lam_vec = np.full(k_pad, lam)
    lam_vec[kk:] = 1.0
    part = SparsePart(
        jnp.asarray(ext, dtype), jnp.asarray(idx),
        jnp.asarray(cw, dtype), jnp.asarray(cv, dtype),
    )
    G, rhs = rowsolve.assemble_system([part], jnp.asarray(lam_vec, dtype),
                                      G0=G0, r0=r0)
    delta = np.asarray(rowsolve.solve_chol(G, rhs))
    return base + delta[:, :kk]


def factors_cold_implicit(model, U):
    """Side-info-only factors for the implicit model
    (/root/reference/src/collective.c:3442)."""
    dtype = jnp.float64 if np.dtype(model.dtype_) == np.float64 else jnp.float32
    k = model.k
    ku = getattr(model, "k_user", 0)
    km = getattr(model, "k_main", 0)
    width = ku + k + km
    k_pad = round_up(width, 8)
    lam6, _ = _resolve_lambdas(model.lambda_, 0.0)
    up, _ = _u_part(model, U, k_pad, dtype)
    lam_vec = np.ones(k_pad)
    lam_vec[:width] = lam6[2]
    G, rhs = rowsolve.assemble_system([up], jnp.asarray(lam_vec, dtype))
    a = np.asarray(rowsolve.solve_chol(G, rhs))
    return a[:, :width]


def build_precomputed(model) -> dict:
    """Prediction caches (precompute_collective_explicit,
    /root/reference/src/collective.c:10209).

    Cached pieces:
      extB        — extended opposing matrix [n, k_pad] (B_plus_bias analog)
      BtB         — extB^T extB (warm NA-as-zero base / diagnostics)
      extC / CtC  — side-info projection matrix and its Gram
      TransCtCinvCt — (w_u·CtC + lam)^-1 w_u·C^T: one matmul per cold call
                    (the reference's TransCtCinvCt cache)
    All device-resident so repeated warm/cold calls never re-download the
    factor matrices."""
    model._precomputed = {}
    out = {}
    ext, width, k_pad, user_bias = _ext_B(model)
    out["extB"] = ext
    out["width"] = width
    out["k_pad"] = k_pad
    out["user_bias"] = user_bias
    out["BtB"] = np.asarray(gram_matrix(jnp.asarray(ext)))
    if model.C_ is not None:
        Ce = _ext_C(model, k_pad)
        out["extC"] = Ce
        out["CtC"] = Ce.T @ Ce
        lam6, _ = _resolve_lambdas(model.lambda_, 0.0)
        w_u = getattr(model, "w_user", 1.0)
        kc = np.asarray(model.C_).shape[1]
        G = w_u * out["CtC"][:kc, :kc] + lam6[2] * np.eye(kc)
        out["TransCtCinvCt"] = np.linalg.solve(G, w_u * Ce[:, :kc].T)
    if model.item_bias_ is not None:
        out["B_plus_bias"] = ext
    return out
