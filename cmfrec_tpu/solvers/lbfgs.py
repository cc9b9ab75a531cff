"""Joint-objective L-BFGS fitting path.

The reference packs [biasA|biasB|A|B|C|Cb|D|Db] into one flat vector and
runs a vendored liblbfgs with More-Thuente line search
(/root/reference/src/collective.c:6636, /root/reference/src/lbfgs.c:246).
Here the parameters stay a pytree and the optimizer is optax.lbfgs (zoom
line search, memory = corr_pairs); gradients come from jax.value_and_grad
of the joint objective instead of the hand-written
collective_fun_grad (/root/reference/src/collective.c:576):

    f = w_main/2 ||W . (X - A_x B_x^T - bA - bB - mu)||^2_obs
      + w_user/2 ||U - A_u C^T||^2_obs + w_item/2 ||I - B_i D^T||^2_obs
      + w_user/2 ||U_bin - sigmoid(A_u Cb^T)||^2_obs        (bin variant,
        /root/reference/src/collective.c:805 — squared error through a
        sigmoid, not cross-entropy)
      + sum_M lam_M/2 ||M||^2

This is the only fit path supporting binary side info, mirroring the
reference's gating (/root/reference/cmfrec/__init__.py:940-942).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.profiling import profiled_fit
import optax

from ..config import SOLVER_PRECISION
from . import preprocess
from .drivers import _resolve_lambdas


def _term_sparse(Amat, Bmat, rows, cols, vals, wgt=None, bias_a=None,
                 bias_b=None, mu=0.0):
    pred = jnp.einsum(
        "nk,nk->n", jnp.take(Amat, rows, axis=0), jnp.take(Bmat, cols, axis=0),
        precision=SOLVER_PRECISION,
    ) + mu
    if bias_a is not None:
        pred = pred + jnp.take(bias_a, rows)
    if bias_b is not None:
        pred = pred + jnp.take(bias_b, cols)
    r = vals - pred
    if wgt is not None:
        return 0.5 * jnp.sum(wgt * r * r)
    return 0.5 * jnp.sum(r * r)


def _term_dense(Amat, Bmat, M):
    r = M - Amat @ Bmat.T
    return 0.5 * jnp.sum(r * r)


def _term_bin(Amat, Cb, rows, cols, vals, wgt=None):
    logits = jnp.einsum(
        "nk,nk->n", jnp.take(Amat, rows, axis=0), jnp.take(Cb, cols, axis=0),
        precision=SOLVER_PRECISION,
    )
    r = vals - jax.nn.sigmoid(logits)
    if wgt is not None:
        return 0.5 * jnp.sum(wgt * r * r)
    return 0.5 * jnp.sum(r * r)


def _pad_rows(x, mult):
    """Zero-pad axis 0 to a multiple of ``mult`` (mesh divisibility).
    Padded factor rows are zeros: they contribute nothing to the loss,
    the regularizer, or any gradient, so the sharded trajectory equals
    the unsharded one exactly (up to reduction order)."""
    r = (-x.shape[0]) % mult
    if r == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((r,) + x.shape[1:], x.dtype)], axis=0)


def _mesh_shard_obs_and_params(mesh, rows_j, cols_j, vals_c, wgt_j, params,
                               row_names):
    """Shared mesh placement for the joint-gradient (L-BFGS) fits: pad the
    observation arrays and the row-keyed params to mesh-size multiples
    (padded observations get weight 0, padded factor rows are zeros — see
    _pad_rows) and row-shard them; replicate everything else.  Returns
    (rows, cols, vals, wgt, params, rs, rep, msz)."""
    from ..parallel.mesh import replicated, row_sharding

    rs, rep = row_sharding(mesh), replicated(mesh)
    msz = int(mesh.size)
    if wgt_j is None:
        wgt_j = jnp.ones_like(vals_c)
    rows_j, cols_j, vals_c, wgt_j = (
        jax.device_put(_pad_rows(x, msz), rs)
        for x in (rows_j, cols_j, vals_c, wgt_j))
    params = {
        name: jax.device_put(
            _pad_rows(v, msz) if name in row_names else v,
            rs if name in row_names else rep)
        for name, v in params.items()
    }
    return rows_j, cols_j, vals_c, wgt_j, params, rs, rep, msz


def _side_coo(side, center, dtype):
    """Ingested side tuple -> (rows, cols, vals(centered), p, colmeans, dense)."""
    if side is None:
        return None
    rows, cols, vals, n_ent, p, is_dense, dense = side
    if is_dense:
        dense = np.asarray(dense, np.float64)
        colmeans = dense.mean(axis=0) if center else None
        if center:
            dense = dense - colmeans[None, :]
        return ("dense", None, None, dense.astype(dtype), p, colmeans)
    vals = np.asarray(vals, np.float64)
    colmeans = None
    if center:
        vals, colmeans = preprocess.center_columns(rows, cols, vals, p, False, n_ent)
    return ("coo", np.asarray(rows, np.int64), np.asarray(cols, np.int64),
            vals.astype(dtype), p, colmeans)


@profiled_fit
def fit_collective_explicit_lbfgs(
    rows, cols, vals, m, n, *,
    side_U=None, side_I=None, side_Ub=None, side_Ib=None,
    k=40, k_user=0, k_item=0, k_main=0,
    lambda_=10.0,
    w_main=1.0, w_user=1.0, w_item=1.0,
    user_bias=True, item_bias=True, center=True,
    center_U=True, center_I=True,
    maxiter=800, corr_pairs=4,
    weights=None, dtype=np.float32, seed=1,
    verbose=False, print_every=10,
    tol=1e-7,
    init=None,  # warm restart: dict with any of A/B/C/D/Cb/Db/biasA/biasB
    # (the reference's reset_values=False)
    mesh=None,  # jax.sharding.Mesh: row-shard the COO terms and factor
    # pytrees over the 1-D data axis; GSPMD psums the scalar loss and the
    # small C/D grads — the device-mesh analog of the reference's
    # OpenMP-over-observations strategy (common.c:107-123)
) -> dict:
    dtype = np.dtype(dtype)
    jdt = jnp.float64 if dtype == np.float64 else jnp.float32
    lam6, _ = _resolve_lambdas(lambda_, 0.0)

    glob_mean = preprocess.weighted_global_mean(vals, weights) if center else 0.0
    vals_c = jnp.asarray((np.asarray(vals, np.float64) - glob_mean), jdt)
    rows_j = jnp.asarray(np.asarray(rows, np.int64))
    cols_j = jnp.asarray(np.asarray(cols, np.int64))
    wgt_j = None if weights is None else jnp.asarray(weights, jdt)

    U = _side_coo(side_U, center_U, dtype)
    I = _side_coo(side_I, center_I, dtype)
    Ub = _side_coo(side_Ub, False, dtype)
    Ib = _side_coo(side_Ib, False, dtype)

    ka = k_user + k + k_main
    kb = k_item + k + k_main

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    scale = float(1.0 / np.sqrt(max(k, 1)))
    params = {
        "A": scale * jax.random.normal(ks[0], (m, ka), jdt),
        "B": scale * jax.random.normal(ks[1], (n, kb), jdt),
    }
    if user_bias:
        params["biasA"] = jnp.zeros(m, jdt)
    if item_bias:
        params["biasB"] = jnp.zeros(n, jdt)
    if U is not None:
        params["C"] = scale * jax.random.normal(ks[2], (U[4], k_user + k), jdt)
    if I is not None:
        params["D"] = scale * jax.random.normal(ks[3], (I[4], k_item + k), jdt)
    if Ub is not None:
        params["Cb"] = scale * jax.random.normal(ks[4], (Ub[4], k_user + k), jdt)
    if Ib is not None:
        params["Db"] = scale * jax.random.normal(ks[5], (Ib[4], k_item + k), jdt)
    if init is not None:
        for name in ("A", "B", "C", "D", "Cb", "Db", "biasA", "biasB"):
            if init.get(name) is not None and name in params:
                params[name] = jnp.asarray(np.asarray(init[name]), jdt)

    side_data = {}
    for name, S in (("U", U), ("I", I), ("Ub", Ub), ("Ib", Ib)):
        if S is None:
            continue
        kind, r_s, c_s, v_s, p, _ = S
        if kind == "dense":
            side_data[name] = ("dense", jnp.asarray(v_s))
        else:
            side_data[name] = (
                "coo", jnp.asarray(r_s), jnp.asarray(c_s), jnp.asarray(v_s),
                None,  # per-entry weight slot (mesh padding uses it)
            )

    if mesh is not None:
        # Row-shard everything with a long leading axis (observations,
        # A/B/bias rows, dense side rows); replicate the small p x k side
        # matrices.  Under jit, GSPMD turns the loss reductions into psums
        # and the take() of a sharded factor into an all-gather of m x k /
        # n x k (small next to the observation data, same layout argument
        # as parallel/mesh.py).  optax.lbfgs state inherits the params'
        # shardings (zeros_like / rolling memories follow their leaves).
        # Leading axes are zero-padded to mesh-size multiples: padded
        # observations get weight 0 and padded factor rows are zeros, so
        # loss, gradients, and the L-BFGS inner products are unchanged.
        rows_j, cols_j, vals_c, wgt_j, params, rs, rep, msz = (
            _mesh_shard_obs_and_params(
                mesh, rows_j, cols_j, vals_c, wgt_j, params,
                row_names=("A", "B", "biasA", "biasB")))
        sharded_sides = {}
        for name, t in side_data.items():
            if t[0] == "dense":
                M = _pad_rows(t[1], msz)
                if name in ("Ub", "Ib") and M.shape[0] != t[1].shape[0]:
                    # bin terms go through a sigmoid: a padded factor row
                    # predicts sigmoid(0)=0.5, so pad the target with 0.5
                    # to keep the padded residual (and its grads) at zero
                    M = M.at[t[1].shape[0]:].set(0.5)
                sharded_sides[name] = ("dense", jax.device_put(M, rs))
            else:
                _, r_s, c_s, v_s, _w = t
                w_s = _pad_rows(jnp.ones_like(v_s), msz)
                sharded_sides[name] = (
                    "coo",
                    jax.device_put(_pad_rows(r_s, msz), rs),
                    jax.device_put(_pad_rows(c_s, msz), rs),
                    jax.device_put(_pad_rows(v_s, msz), rs),
                    jax.device_put(w_s, rs),
                )
        side_data = sharded_sides

    lam_map = {"biasA": lam6[0], "biasB": lam6[1], "A": lam6[2], "B": lam6[3],
               "C": lam6[4], "D": lam6[5], "Cb": lam6[4], "Db": lam6[5]}

    def loss_fn(p):
        A, B = p["A"], p["B"]
        f = w_main * _term_sparse(
            A[:, k_user:], B[:, k_item:], rows_j, cols_j, vals_c, wgt_j,
            p.get("biasA"), p.get("biasB"), 0.0,
        )
        if "C" in p:
            A_u = A[:, : k_user + k]
            if side_data["U"][0] == "dense":
                f += w_user * _term_dense(A_u, p["C"], side_data["U"][1])
            else:
                _, r_s, c_s, v_s, w_s = side_data["U"]
                f += w_user * _term_sparse(A_u, p["C"], r_s, c_s, v_s, w_s)
        if "D" in p:
            B_i = B[:, : k_item + k]
            if side_data["I"][0] == "dense":
                f += w_item * _term_dense(B_i, p["D"], side_data["I"][1])
            else:
                _, r_s, c_s, v_s, w_s = side_data["I"]
                f += w_item * _term_sparse(B_i, p["D"], r_s, c_s, v_s, w_s)
        if "Cb" in p:
            A_u = A[:, : k_user + k]
            if side_data["Ub"][0] == "dense":
                M = side_data["Ub"][1]
                rr = M - jax.nn.sigmoid(A_u @ p["Cb"].T)
                f += w_user * 0.5 * jnp.sum(rr * rr)
            else:
                _, r_s, c_s, v_s, w_s = side_data["Ub"]
                f += w_user * _term_bin(A_u, p["Cb"], r_s, c_s, v_s, w_s)
        if "Db" in p:
            B_i = B[:, : k_item + k]
            if side_data["Ib"][0] == "dense":
                M = side_data["Ib"][1]
                rr = M - jax.nn.sigmoid(B_i @ p["Db"].T)
                f += w_item * 0.5 * jnp.sum(rr * rr)
            else:
                _, r_s, c_s, v_s, w_s = side_data["Ib"]
                f += w_item * _term_bin(B_i, p["Db"], r_s, c_s, v_s, w_s)
        for name, mat in p.items():
            f += 0.5 * jnp.asarray(lam_map[name], jdt) * jnp.sum(mat * mat)
        return f.astype(jdt)

    opt = optax.lbfgs(memory_size=corr_pairs)
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    # Iterations run in device-side chunks (one dispatch per chunk): the
    # host link's per-call latency would otherwise dominate the default
    # maxiter=800.  Convergence is checked between chunks on the chunk's
    # value trace, so up to chunk-1 extra iterations may run past `tol` —
    # harmless (the iterates are already converged).
    chunk = max(1, min(25, int(maxiter)))

    @jax.jit
    def run_chunk(params, state):
        def body(carry, _):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state2 = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss_fn
            )
            params = optax.apply_updates(params, updates)
            return (params, state2), value

        (params, state), values = jax.lax.scan(
            body, (params, state), None, length=chunk
        )
        return params, state, values

    nfev = 0
    it = 0
    prev = np.inf
    try:
        while it < int(maxiter):
            params, state, values = run_chunk(params, state)
            vs = np.asarray(values, np.float64)
            if verbose:
                for j in range(0, chunk, max(1, print_every)):
                    print(f"lbfgs iter {it + j}: f={vs[j]:.6f}")
            it += chunk
            nfev += chunk
            if not np.isfinite(vs[-1]):
                break
            deltas = np.abs(np.diff(np.concatenate([[prev], vs])))
            if (deltas[-2:] <= tol * np.maximum(np.abs(vs[-1]), 1.0)).all():
                break
            prev = vs[-1]
    except KeyboardInterrupt:
        from ..config import should_handle_interrupt

        if not should_handle_interrupt():
            raise
        print("interrupted — returning partially-fit model")

    out = {kname: np.asarray(v) for kname, v in params.items()}
    bA, bB = out.get("biasA"), out.get("biasB")
    return {
        # [:m]/[:n] trims the mesh-divisibility zero padding (no-op otherwise)
        "A": out["A"][:m],
        "B": out["B"][:n],
        "C": out.get("C"),
        "D": out.get("D"),
        "Cb": out.get("Cb"),
        "Db": out.get("Db"),
        "biasA": None if bA is None else bA[:m],
        "biasB": None if bB is None else bB[:n],
        "glob_mean": float(glob_mean),
        "U_colmeans": None if U is None else U[5],
        "I_colmeans": None if I is None else I[5],
        "nfev": nfev,
        "niter": it + 1,
        "k": k,
    }
