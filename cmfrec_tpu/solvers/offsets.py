"""Offsets-model (OMF) and content-based fitting.

Model (/root/reference/src/offsets.c:140-175, "Cold-start recommendations
in Collective Matrix Factorization", Cortes 2018):

    Am = [ w_user*(U C + Cb)[:, :k_sec],
           A[:, :k] + w_user*(U C + Cb)[:, k_sec:],
           A[:, k:] ]                       # columns [k_sec | k | k_main]
    Bm = likewise from B, I, D
    min ||M . (X - Am Bm^T - biases - mu)||^2 + lam * ||params||^2

Two fit strategies, mirroring the reference:
  * exact joint optimization by L-BFGS (fit_offsets_explicit_lbfgs,
    /root/reference/src/offsets.c:1150) — here optax.lbfgs + autodiff;
  * the ALS approximation (fit_offsets_als, /root/reference/src/offsets.c:
    1773): fit Am/Bm by regular ALS, then regress C = argmin ||Am - U C||
    and set A = Am - w_user U C.  Only k (no k_sec/k_main) in this mode.

The pure content-based model (Am = U C + Cb with k_sec = k, no free part)
reuses the same machinery (/root/reference/src/offsets.c:3283).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.profiling import profiled_fit
import optax

from ..config import SOLVER_PRECISION
from . import preprocess
from .drivers import _resolve_lambdas, fit_explicit_als, fit_implicit_als


def densify_side(side, center: bool):
    """OMF treats attributes as dense design matrices; NaNs (and sparse
    holes) become zeros after column centering."""
    if side is None:
        return None, None
    rows, cols, vals, n_ent, p, is_dense, dense = side
    if not is_dense:
        M = np.zeros((n_ent, p))
        cnt = np.zeros((n_ent, p))
        if rows is not None:
            M[rows, cols] = vals
            cnt[rows, cols] = 1.0
        dense = M
    else:
        dense = np.asarray(dense, np.float64).copy()
    colmeans = None
    if center:
        colmeans = np.nanmean(dense, axis=0)
        dense = dense - colmeans[None, :]
    dense = np.nan_to_num(dense, nan=0.0)
    return dense, colmeans


def construct_Am(A, UC, k_sec, k, k_main, w):
    """(/root/reference/src/offsets.c:458)"""
    parts = []
    if k_sec:
        parts.append(w * UC[:, :k_sec])
    if k:
        base = A[:, :k]
        if UC is not None:
            base = base + w * UC[:, k_sec:]
        parts.append(base)
    if k_main:
        parts.append(A[:, k:])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


@profiled_fit
def fit_offsets_explicit_lbfgs(
    rows, cols, vals, m, n, *,
    side_U=None, side_I=None,
    k=50, k_sec=0, k_main=0,
    lambda_=10.0, w_user=1.0, w_item=1.0,
    user_bias=True, item_bias=True, center=True, add_intercepts=True,
    maxiter=10000, corr_pairs=7,
    weights=None, dtype=np.float32, seed=1, verbose=False, print_every=100,
    init_params=None, tol=1e-8,
    mesh=None,  # jax.sharding.Mesh: row-shard observations, A/B/bias rows
    # and the dense U/I design matrices; replicate the small C/D blocks
    # (see lbfgs.py — the reference's OpenMP strategy, common.c:107-123)
) -> dict:
    dtype = np.dtype(dtype)
    jdt = jnp.float64 if dtype == np.float64 else jnp.float32
    lam6, _ = _resolve_lambdas(lambda_, 0.0)

    U, U_colmeans = densify_side(side_U, center=True)
    I, I_colmeans = densify_side(side_I, center=True)
    if U is None and k_sec > 0:
        raise ValueError("k_sec requires side info")

    glob_mean = preprocess.weighted_global_mean(vals, weights) if center else 0.0
    vals_c = jnp.asarray(np.asarray(vals, np.float64) - glob_mean, jdt)
    rows_j = jnp.asarray(np.asarray(rows, np.int64))
    cols_j = jnp.asarray(np.asarray(cols, np.int64))
    wgt_j = None if weights is None else jnp.asarray(weights, jdt)

    kAB = k + k_main  # free-offset width
    kCD = k_sec + k  # attribute-combination width
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    s = 1.0 / np.sqrt(max(k_sec + k + k_main, 1))
    params = {}
    if kAB:
        params["A"] = s * jax.random.normal(ks[0], (m, kAB), jdt)
        params["B"] = s * jax.random.normal(ks[1], (n, kAB), jdt)
    if U is not None:
        params["C"] = s * jax.random.normal(ks[2], (U.shape[1], kCD), jdt)
        if add_intercepts:
            params["C_bias"] = jnp.zeros(kCD, jdt)
    if I is not None:
        params["D"] = s * jax.random.normal(ks[3], (I.shape[1], kCD), jdt)
        if add_intercepts:
            params["D_bias"] = jnp.zeros(kCD, jdt)
    if user_bias:
        params["biasA"] = jnp.zeros(m, jdt)
    if item_bias:
        params["biasB"] = jnp.zeros(n, jdt)
    if init_params:
        for kk, v in init_params.items():
            params[kk] = jnp.asarray(v, jdt)

    U_j = None if U is None else jnp.asarray(U, jdt)
    I_j = None if I is None else jnp.asarray(I, jdt)
    if mesh is not None:
        # Zero-pad leading axes to mesh-size multiples (padded observations
        # carry weight 0, padded factor/design rows are zeros — loss and
        # gradients are unchanged), then row-shard over the data axis with
        # the small C/D blocks replicated (shared helper in lbfgs.py).
        from .lbfgs import _mesh_shard_obs_and_params, _pad_rows

        rows_j, cols_j, vals_c, wgt_j, params, rs, _rep, msz = (
            _mesh_shard_obs_and_params(
                mesh, rows_j, cols_j, vals_c, wgt_j, params,
                row_names=("A", "B", "biasA", "biasB")))
        if U_j is not None:
            U_j = jax.device_put(_pad_rows(U_j, msz), rs)
        if I_j is not None:
            I_j = jax.device_put(_pad_rows(I_j, msz), rs)
    lam_map = {"biasA": lam6[0], "biasB": lam6[1], "A": lam6[2], "B": lam6[3],
               "C": lam6[4], "D": lam6[5], "C_bias": lam6[4], "D_bias": lam6[5]}

    def build_sides(p):
        UC = None
        if U_j is not None:
            UC = U_j @ p["C"]
            if "C_bias" in p:
                UC = UC + p["C_bias"][None, :]
        ID = None
        if I_j is not None:
            ID = I_j @ p["D"]
            if "D_bias" in p:
                ID = ID + p["D_bias"][None, :]
        Am = construct_Am(p.get("A", jnp.zeros((m, kAB), jdt)), UC,
                          k_sec, k, k_main, w_user)
        Bm = construct_Am(p.get("B", jnp.zeros((n, kAB), jdt)), ID,
                          k_sec, k, k_main, w_item)
        return Am, Bm

    def loss_fn(p):
        Am, Bm = build_sides(p)
        pred = jnp.einsum(
            "nk,nk->n", jnp.take(Am, rows_j, axis=0),
            jnp.take(Bm, cols_j, axis=0), precision=SOLVER_PRECISION,
        )
        if "biasA" in p:
            pred = pred + jnp.take(p["biasA"], rows_j)
        if "biasB" in p:
            pred = pred + jnp.take(p["biasB"], cols_j)
        r = vals_c - pred
        f = 0.5 * (jnp.sum(wgt_j * r * r) if wgt_j is not None else jnp.sum(r * r))
        for name, mat in p.items():
            f = f + 0.5 * jnp.asarray(lam_map[name], jdt) * jnp.sum(mat * mat)
        return f.astype(jdt)

    opt = optax.lbfgs(memory_size=corr_pairs)
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    # chunked device-side iterations (one dispatch per chunk; see lbfgs.py)
    chunk = max(1, min(25, int(maxiter)))

    @jax.jit
    def run_chunk(params, state):
        def body(carry, _):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state2 = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss_fn
            )
            return (optax.apply_updates(params, updates), state2), value

        (params, state), values = jax.lax.scan(
            body, (params, state), None, length=chunk
        )
        return params, state, values

    prev = np.inf
    it = 0
    while it < int(maxiter):
        params, state, values = run_chunk(params, state)
        vs = np.asarray(values, np.float64)
        if verbose:
            for j in range(0, chunk, max(1, print_every)):
                print(f"offsets-lbfgs iter {it + j}: f={vs[j]:.6f}")
        it += chunk
        if not np.isfinite(vs[-1]):
            break
        deltas = np.abs(np.diff(np.concatenate([[prev], vs])))
        if (deltas[-2:] <= tol * np.maximum(np.abs(vs[-1]), 1.0)).all():
            break
        prev = vs[-1]

    Am, Bm = build_sides(params)
    out = {kname: np.asarray(v) for kname, v in params.items()}

    def _trim(x, size):  # drop mesh-divisibility padding (no-op otherwise)
        return None if x is None else x[:size]

    return {
        "A": _trim(out.get("A"), m),
        "B": _trim(out.get("B"), n),
        "C": out.get("C"),
        "D": out.get("D"),
        "C_bias": out.get("C_bias"),
        "D_bias": out.get("D_bias"),
        "Am": np.asarray(Am)[:m],
        "Bm": np.asarray(Bm)[:n],
        "biasA": _trim(out.get("biasA"), m),
        "biasB": _trim(out.get("biasB"), n),
        "glob_mean": float(glob_mean),
        "U_colmeans": U_colmeans,
        "I_colmeans": I_colmeans,
        "niter": it + 1,
        "k": k, "k_sec": k_sec, "k_main": k_main,
    }


def _regress_side(U, Am, add_intercepts, ridge=1e-10):
    """C = argmin ||Am - U C|| (/root/reference/src/offsets.c:184-199)."""
    X = U
    if add_intercepts:
        X = np.concatenate([U, np.ones((U.shape[0], 1))], axis=1)
    G = X.T @ X + ridge * np.eye(X.shape[1])
    Cfull = np.linalg.solve(G, X.T @ Am)
    if add_intercepts:
        return Cfull[:-1], Cfull[-1]
    return Cfull, None


@profiled_fit
def fit_offsets_als(
    rows, cols, vals, m, n, *,
    side_U=None, side_I=None, implicit=False,
    k=50, lambda_=10.0, alpha=1.0, apply_log_transf=False,
    user_bias=True, item_bias=True, center=True, add_intercepts=True,
    niter=10, use_cg=True, max_cg_steps=3, finalize_chol=True,
    NA_as_zero=False, weights=None, dtype=np.float32, seed=1, verbose=False,
    init=None,  # warm restart for the inner Am/Bm ALS (reset_values=False)
    mesh=None,  # forwarded to the inner ALS fit (row-parallel solves)
) -> dict:
    """ALS approximation: regular ALS for Am/Bm, then attribute regression
    (/root/reference/src/offsets.c:1773)."""
    U, U_colmeans = densify_side(side_U, center=True)
    I, I_colmeans = densify_side(side_I, center=True)
    if implicit:
        res = fit_implicit_als(
            rows, cols, vals, m, n, k=k, lambda_=lambda_, niter=niter,
            use_cg=use_cg, max_cg_steps=max_cg_steps,
            finalize_chol=finalize_chol, alpha=alpha,
            apply_log_transf=apply_log_transf, dtype=dtype, seed=seed,
            verbose=verbose, init=init, mesh=mesh,
        )
    else:
        res = fit_explicit_als(
            rows, cols, vals, m, n, k=k, lambda_=lambda_, niter=niter,
            use_cg=use_cg, max_cg_steps=max_cg_steps,
            finalize_chol=finalize_chol, user_bias=user_bias,
            item_bias=item_bias, center=center, NA_as_zero=NA_as_zero,
            weights=weights, dtype=dtype, seed=seed, verbose=verbose,
            init=init, mesh=mesh,
        )
    Am, Bm = res["A"], res["B"]
    out = {
        "Am": Am, "Bm": Bm,
        "biasA": res.get("biasA"), "biasB": res.get("biasB"),
        "glob_mean": res.get("glob_mean", 0.0),
        "U_colmeans": U_colmeans, "I_colmeans": I_colmeans,
        "k": k, "k_sec": 0, "k_main": 0,
        "w_main_multiplier": res.get("w_main_multiplier", 1.0),
        "alpha": alpha,
    }
    if U is not None:
        C, C_bias = _regress_side(U, Am, add_intercepts)
        out["C"], out["C_bias"] = C, C_bias
        out["A"] = Am - U @ C - (C_bias if C_bias is not None else 0.0)
    else:
        out["C"] = out["C_bias"] = None
        out["A"] = Am
    if I is not None:
        D, D_bias = _regress_side(I, Bm, add_intercepts)
        out["D"], out["D_bias"] = D, D_bias
        out["B"] = Bm - I @ D - (D_bias if D_bias is not None else 0.0)
    else:
        out["D"] = out["D_bias"] = None
        out["B"] = Bm
    return out
