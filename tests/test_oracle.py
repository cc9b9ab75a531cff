"""Oracle tests in the reference's test_math style: every solver output is
checked against a direct NumPy closed form or scipy.optimize
(/root/reference/test_math/README.md — naive-implementation diffing)."""

import numpy as np
import pytest
import scipy.optimize

from cmfrec_tpu import CMF, CMF_implicit


@pytest.fixture
def fitted(rng):
    m, n, k_true = 60, 40, 3
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    full = 3.0 + A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.5
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + 0.1 * rng.normal(size=rows.size)
    model = CMF(k=5, lambda_=0.7, niter=8, use_float=False).fit_triplets(
        rows, cols, vals, m, n)
    return model, rows, cols, vals, m, n


def test_factors_warm_matches_numpy_closed_form(fitted, rng):
    """factors_warm == (Be^T Be + lam)^-1 Be^T (x - mu - biasB) with the
    bias column trick (/root/reference/src/common.c:546)."""
    model, rows, cols, vals, m, n = fitted
    obs = np.sort(rng.choice(n, 12, replace=False))
    x = 3.0 + rng.normal(size=obs.size)
    a, bias = model.factors_warm(X_col=obs, X_val=x, return_bias=True)

    B = np.asarray(model.B_, np.float64)[obs]
    bB = np.asarray(model.item_bias_, np.float64)[obs]
    Be = np.concatenate([B, np.ones((obs.size, 1))], axis=1)
    lam = np.full(model.k + 1, 0.7)
    target = x - model.glob_mean_ - bB
    ref = np.linalg.solve(Be.T @ Be + np.diag(lam), Be.T @ target)
    np.testing.assert_allclose(np.concatenate([a, [bias]]), ref,
                               rtol=2e-4, atol=2e-4)


def test_factors_warm_weighted_scale_lam(rng):
    """Weighted + scale_lam warm solve vs NumPy (the (e)-reference lambda
    scaling, /root/reference/src/common.c:689-724)."""
    m, n, k = 50, 30, 4
    A0 = rng.normal(size=(m, k))
    B0 = rng.normal(size=(n, k))
    mask = rng.uniform(size=(m, n)) < 0.6
    rows, cols = np.nonzero(mask)
    vals = (A0 @ B0.T)[rows, cols] + 0.1 * rng.normal(size=rows.size)
    model = CMF(k=k, lambda_=0.1, scale_lam=True, niter=6, user_bias=False,
                item_bias=False, center=False,
                use_float=False).fit_triplets(rows, cols, vals, m, n)
    obs = np.arange(0, n, 3)
    x = rng.normal(size=obs.size)
    w = rng.uniform(0.5, 2.0, size=obs.size)
    a = model.factors_warm(X_col=obs, X_val=x, W=w)
    B = np.asarray(model.B_, np.float64)[obs]
    lam_eff = 0.1 * w.sum()
    ref = np.linalg.solve(B.T @ (w[:, None] * B) + lam_eff * np.eye(k),
                          B.T @ (w * x))
    np.testing.assert_allclose(a, ref, rtol=2e-4, atol=2e-4)


def test_implicit_factors_warm_matches_numpy(rng):
    """WRMF warm solve vs the exact normal equations (ref (d),
    /root/reference/src/common.c:2063 factors_implicit_chol)."""
    m, n, k = 50, 30, 4
    rows = rng.integers(0, m, 600)
    cols = rng.integers(0, n, 600)
    vals = rng.uniform(1, 20, 600)
    model = CMF_implicit(k=k, lambda_=2.0, alpha=0.7, niter=6,
                         use_float=False).fit_triplets(rows, cols, vals, m, n)
    obs = np.arange(0, n, 2)
    x = rng.uniform(1, 10, obs.size)
    a = model.factors_warm(X_col=obs, X_val=x)
    B = np.asarray(model.B_, np.float64)
    Bs = B[obs]
    G = B.T @ B + Bs.T @ ((0.7 * x)[:, None] * Bs) + 2.0 * np.eye(k)
    rhs = Bs.T @ (1.0 + 0.7 * x)
    ref = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(a, ref, rtol=2e-4, atol=2e-4)


def test_nonneg_warm_matches_scipy(rng):
    """Non-negative warm solve vs scipy.optimize.nnls
    (/root/reference/src/common.c:2131 solve_nonneg, ref (f))."""
    m, n, k = 40, 25, 4
    rows = rng.integers(0, m, 500)
    cols = rng.integers(0, n, 500)
    vals = np.abs(rng.normal(size=500)) + 0.5
    model = CMF(k=k, lambda_=0.3, nonneg=True, center=False, user_bias=False,
                item_bias=False, niter=8,
                use_float=False).fit_triplets(rows, cols, vals, m, n)
    obs = np.arange(0, n, 2)
    x = np.abs(rng.normal(size=obs.size)) + 0.5
    a = model.factors_warm(X_col=obs, X_val=x)
    B = np.asarray(model.B_, np.float64)[obs]
    # augmented ridge system -> NNLS
    Baug = np.vstack([B, np.sqrt(0.3) * np.eye(k)])
    xaug = np.concatenate([x, np.zeros(k)])
    ref, _ = scipy.optimize.nnls(Baug, xaug)
    np.testing.assert_allclose(a, ref, rtol=5e-3, atol=5e-3)
    assert (np.asarray(a) >= 0).all()


def test_bias_init_matches_numpy(rng):
    """One-sided bias init = single shrunken-mean pass
    (initialize_biases_onesided, /root/reference/src/common.c:4130); the
    two-sided ITERATED loop is pinned in
    test_explicit_als.test_bias_init_twosided_oracle."""
    from cmfrec_tpu.solvers.preprocess import initialize_biases

    m, n = 30, 20
    rows = rng.integers(0, m, 300)
    cols = rng.integers(0, n, 300)
    vals = rng.normal(size=300)
    _, bB = initialize_biases(rows, cols, vals, m, n, lam_user=0.5,
                              lam_item=0.5, user_bias=False, item_bias=True)
    for j in range(n):
        sel = cols == j
        ref = vals[sel].sum() / (sel.sum() + 0.5) if sel.any() else 0.0
        assert abs(bB[j] - ref) < 1e-12
    bA, _ = initialize_biases(rows, cols, vals, m, n, lam_user=0.5,
                              lam_item=0.5, user_bias=True, item_bias=False)
    for i in range(m):
        sel = rows == i
        ref = vals[sel].sum() / (sel.sum() + 0.5) if sel.any() else 0.0
        assert abs(bA[i] - ref) < 1e-12


def test_center_by_cols_na_as_zero_semantics(rng):
    """center_columns divides by the FULL row count under NA-as-zero
    (/root/reference/src/common.c:4911)."""
    from cmfrec_tpu.solvers.preprocess import center_columns

    n_rows, n_cols = 10, 4
    rows = rng.integers(0, n_rows, 20)
    cols = rng.integers(0, n_cols, 20)
    vals = rng.normal(size=20)
    _, means_na0 = center_columns(rows, cols, vals, n_cols, True, n_rows)
    _, means_std = center_columns(rows, cols, vals, n_cols, False, n_rows)
    for j in range(n_cols):
        sel = cols == j
        assert abs(means_na0[j] - vals[sel].sum() / n_rows) < 1e-12
        if sel.any():
            assert abs(means_std[j] - vals[sel].mean()) < 1e-12


def test_lbfgs_objective_matches_numpy(rng):
    """The L-BFGS joint objective at the fitted point equals the direct
    NumPy evaluation (collective_fun_grad,
    /root/reference/src/collective.c:576)."""
    m, n, p, q, k = 30, 20, 5, 4, 3
    A0 = rng.normal(size=(m, k))
    B0 = rng.normal(size=(n, k))
    U = A0 @ rng.normal(size=(k, p))
    I = B0 @ rng.normal(size=(k, q))
    mask = rng.uniform(size=(m, n)) < 0.6
    rows, cols = np.nonzero(mask)
    vals = (A0 @ B0.T)[rows, cols] + 0.05 * rng.normal(size=rows.size)
    model = CMF(k=k, lambda_=0.5, method="lbfgs", maxiter=300,
                use_float=False).fit_triplets(rows, cols, vals, m, n,
                                              U=U, I=I)
    A = np.asarray(model.A_, np.float64)
    B = np.asarray(model.B_, np.float64)
    # residual check: the main-term gradient wrt A should be ~0 at optimum
    pred = (model.glob_mean_
            + np.asarray(model.user_bias_)[rows]
            + np.asarray(model.item_bias_)[cols]
            + np.einsum("ek,ek->e", A[rows], B[cols]))
    r = pred - vals
    gA = np.zeros_like(A)
    np.add.at(gA, rows, r[:, None] * B[cols])
    C = np.asarray(model.C_, np.float64)
    Uc = U - np.asarray(model.U_colmeans_)[None, :]
    gA += (A @ C.T - Uc) @ C
    gA += 0.5 * A  # lambda * A
    assert np.abs(gA).max() < 5e-2


def test_collective_block_closed_form_with_splits(rng):
    """Per-row collective system with k_user/k_item/k_main splits vs a
    direct NumPy build of the extended Be = [[0,Bs,Bm],[Cu,Cs,0]] system
    (/root/reference/src/collective.c:179-214, 1223).  Exercises the
    coordinate-aligned parts assembly end-to-end through a fitted model's
    warm path."""
    m, n, p = 50, 30, 6
    k, ku, ki, km = 3, 2, 1, 2
    A0 = rng.normal(size=(m, 4))
    B0 = rng.normal(size=(n, 4))
    U = A0 @ rng.normal(size=(4, p))
    mask = rng.uniform(size=(m, n)) < 0.6
    ro, co = np.nonzero(mask)
    vals = (A0 @ B0.T)[ro, co] + 3.0 + 0.05 * rng.normal(size=ro.size)
    model = CMF(k=k, k_user=ku, k_item=ki, k_main=km, lambda_=0.5,
                w_main=0.8, w_user=0.6, niter=6, center_U=False,
                use_float=False).fit_triplets(ro, co, vals, m, n, U=U)

    # new user: X row over a subset + full side info
    obs = np.arange(0, n, 3)
    x = 3.0 + rng.normal(size=obs.size)
    u = rng.normal(size=p)
    a, bias = model.factors_warm(X_col=obs, X_val=x, U=u, return_bias=True)

    # direct NumPy: coordinates [ku | k | km | bias]
    width = ku + k + km
    B = np.asarray(model.B_, np.float64)   # [n, ki+k+km]
    C = np.asarray(model.C_, np.float64)   # [p, ku+k]
    Be = np.zeros((obs.size, width + 1))
    Be[:, ku:width] = B[obs][:, ki:]       # B's shared+main coords
    Be[:, width] = 1.0                     # bias column
    Ce = np.zeros((p, width + 1))
    Ce[:, : ku + k] = C
    lam = np.full(width + 1, 0.5)
    w_m, w_u = 0.8, 0.6
    tgt_x = x - model.glob_mean_ - np.asarray(model.item_bias_)[obs]
    G = (w_m * Be.T @ Be + w_u * Ce.T @ Ce + np.diag(lam))
    rhs = w_m * Be.T @ tgt_x + w_u * Ce.T @ u
    ref = np.linalg.solve(G, rhs)
    got = np.concatenate([np.asarray(a), [bias]])
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_factors_warm_with_implicit_features(rng):
    """Warm factors for a model fit with add_implicit_features include the
    w_implicit * BiTBi Gram base and the sum-of-observed-Bi rhs term
    (/root/reference/src/collective.c:1428-1467)."""
    m, n, k = 50, 30, 4
    A0 = rng.normal(size=(m, k))
    B0 = rng.normal(size=(n, k))
    mask = rng.uniform(size=(m, n)) < 0.6
    rows, cols = np.nonzero(mask)
    vals = (A0 @ B0.T)[rows, cols] + 3.0
    model = CMF(k=k, lambda_=0.8, niter=6, add_implicit_features=True,
                w_implicit=0.5, user_bias=False, item_bias=False,
                center=False, use_float=False).fit_triplets(
                    rows, cols, vals, m, n)
    assert model.Bi_ is not None
    obs = np.arange(0, n, 2)
    x = 3.0 + rng.normal(size=obs.size)
    a = model.factors_warm(X_col=obs, X_val=x)
    assert model._cache_stats.get("bitbi", 0) >= 1

    B = np.asarray(model.B_, np.float64)
    Bi = np.asarray(model.Bi_, np.float64)
    Bs = B[obs]
    G = Bs.T @ Bs + 0.5 * (Bi.T @ Bi) + 0.8 * np.eye(k)
    rhs = Bs.T @ x + 0.5 * Bi[obs].sum(axis=0)
    want = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(a, want, rtol=1e-5, atol=1e-7)


def test_factors_cold_na_as_zero_user(rng):
    """Cold/warm factors for NA_as_zero_user models: missing side-info
    entries participate as zeros — shared w_u*CtC Gram + CtUbias centering
    (/root/reference/src/collective.c:3389,10466), served from the caches."""
    m, n, k, p = 50, 30, 4, 6
    A0 = rng.normal(size=(m, k))
    B0 = rng.normal(size=(n, k))
    mask = rng.uniform(size=(m, n)) < 0.5
    rows, cols = np.nonzero(mask)
    vals = (A0 @ B0.T)[rows, cols] + 3.0
    Ur = rng.integers(0, m, 150)
    Uc = rng.integers(0, p, 150)
    Uv = rng.normal(size=150)
    import scipy.sparse as sp

    model = CMF(k=k, lambda_=0.8, niter=5, NA_as_zero_user=True, w_user=0.7,
                user_bias=False, item_bias=False, center=False,
                use_float=False).fit(
        sp.coo_matrix((vals, (rows, cols)), shape=(m, n)),
        U=sp.coo_matrix((Uv, (Ur, Uc)), shape=(m, p)))
    u_new = np.full(p, np.nan)
    u_new[[0, 2, 4]] = rng.normal(size=3)
    a = model.factors_cold(U=u_new)
    assert model._cache_stats.get("ctcw", 0) >= 1

    C = np.asarray(model.C_, np.float64)
    cm = (np.asarray(model.U_colmeans_)
          if model.U_colmeans_ is not None else np.zeros(p))
    u_full = np.nan_to_num(u_new, nan=0.0)
    G = 0.7 * (C.T @ C) + 0.8 * np.eye(k)
    rhs = 0.7 * (C.T @ (u_full - cm))
    want = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(a, want, rtol=1e-6, atol=1e-8)
