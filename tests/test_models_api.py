"""Model-class API tests: ingestion, reindexing, predict/topN, warm/cold
factors, transform, from_model_matrices, swap_users_and_items."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cmfrec_tpu import CMF, CMF_implicit


@pytest.fixture
def ratings_df(rng):
    m, n, k_true = 80, 50, 4
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    full = 3.0 + A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.35
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + 0.1 * rng.normal(size=rows.size)
    df = pd.DataFrame(
        {
            "UserId": [f"u{i}" for i in rows],
            "ItemId": [f"it{j}" for j in cols],
            "Rating": vals,
        }
    )
    return df, rows, cols, vals, m, n


def test_fit_predict_dataframe(ratings_df):
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=6, lambda_=0.5, niter=6, verbose=False, use_float=False)
    model.fit(df)
    assert model.is_fitted_
    assert model.A_.shape[1] == 6
    # string ids round-trip
    p = model.predict("u1", "it2")
    assert np.isfinite(p)
    preds = model.predict(["u1", "u2"], ["it2", "it3"])
    assert preds.shape == (2,)
    # training-set RMSE should beat the constant baseline clearly
    yhat = model.predict([f"u{i}" for i in rows], [f"it{j}" for j in cols])
    rmse = np.sqrt(np.mean((yhat - vals) ** 2))
    assert rmse < 0.6 * np.std(vals)


def test_topn_include_exclude(ratings_df):
    df, *_ = ratings_df
    model = CMF(k=5, lambda_=0.5, niter=4, use_float=False).fit(df)
    top = model.topN("u1", n=10)
    assert len(top) == 10
    assert len(set(map(str, top))) == 10
    items, scores = model.topN("u1", n=5, output_score=True)
    assert np.all(np.diff(scores) <= 1e-6)
    excl = model.topN("u1", n=10, exclude=top[:5])
    assert not set(map(str, top[:5])) & set(map(str, excl))
    incl = model.topN("u1", n=3, include=top[:5])
    assert set(map(str, incl)) <= set(map(str, top[:5]))


def test_sparse_and_dense_inputs(rng):
    m, n = 40, 25
    X = rng.uniform(1, 5, size=(m, n))
    X[rng.uniform(size=(m, n)) < 0.6] = np.nan
    model_d = CMF(k=4, lambda_=1.0, niter=4, use_float=False).fit(X)
    r, c = np.nonzero(~np.isnan(X))
    Xs = sp.coo_matrix((X[r, c], (r, c)), shape=(m, n))
    model_s = CMF(k=4, lambda_=1.0, niter=4, use_float=False).fit(Xs)
    # same data, same seed -> identical models
    np.testing.assert_allclose(model_d.A_, model_s.A_, rtol=1e-6, atol=1e-9)
    p = model_d.predict(0, 1)
    assert np.isfinite(p)


def test_precompute_caches_used_and_exact(ratings_df, rng):
    """precompute_for_predictions=True (default) builds the caches at fit
    time (precompute_collective_explicit,
    /root/reference/src/collective.c:10209) and cold factors become ONE
    matmul through TransCtCinvCt — no per-call factorization — with
    identical output to the uncached path."""
    df, rows, cols, vals, m, n = ratings_df
    U = rng.normal(size=(m, 6))
    model = CMF(k=5, lambda_=0.5, niter=5, use_float=False).fit(df, U=U)
    pre = model._precomputed
    for key in ("extB", "BtB", "BtBw", "TransBtBinvBt_G", "extC", "CtC",
                "CtCw", "TransCtCinvCt", "BeTBeChol"):
        assert key in pre, f"missing precompute cache {key}"
    u_new = rng.normal(size=6)
    a_cached = model.factors_cold(U=u_new)
    assert model._cache_stats.get("cold_matmul", 0) >= 1
    # the cached path must not run any Cholesky solve
    import cmfrec_tpu.ops.rowsolve as rs

    orig = rs.solve_chol
    calls = {"n": 0}

    def counting(G, rhs):
        calls["n"] += 1
        return orig(G, rhs)

    rs.solve_chol = counting
    try:
        a2 = model.factors_cold(U=u_new)
    finally:
        rs.solve_chol = orig
    assert calls["n"] == 0
    np.testing.assert_allclose(a2, a_cached)
    # identical to the uncached general path
    model._precomputed = {}
    a_uncached = model.factors_cold(U=u_new)
    np.testing.assert_allclose(a_cached, a_uncached, rtol=1e-8, atol=1e-10)
    # disabling the flag skips cache building
    m2 = CMF(k=5, lambda_=0.5, niter=2, use_float=False,
             precompute_for_predictions=False).fit(df, U=U)
    assert m2._precomputed == {}


def test_na0_warm_uses_btxbias_cache(rng):
    """NA-as-zero warm factors serve G0/r0 from the BtBw/BtXbias caches
    (/root/reference/src/collective.c:10300) with unchanged output."""
    m, n = 50, 30
    X = rng.uniform(1, 5, size=(m, n))
    X[rng.uniform(size=(m, n)) < 0.6] = np.nan
    model = CMF(k=4, lambda_=1.0, niter=4, NA_as_zero=True,
                use_float=False).fit(X)
    assert "BtXbias" in model._precomputed
    obs = np.arange(0, n, 3)
    a1 = model.factors_warm(X_col=obs, X_val=np.linspace(1, 5, obs.size))
    assert model._cache_stats.get("na0_base", 0) >= 1
    model._precomputed = {}
    a2 = model.factors_warm(X_col=obs, X_val=np.linspace(1, 5, obs.size))
    np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-9)


def test_side_info_appends_rows(ratings_df, rng):
    """Ids present in U but not in X are appended (m_u > m): their factor
    rows are solved from side info only and predict/topN work for them
    (the reference's _append_NAs, /root/reference/cmfrec/__init__.py:342)."""
    df, rows, cols, vals, m, n = ratings_df
    p_feat = 6
    U = pd.DataFrame(
        rng.normal(size=(m + 3, p_feat)),
        columns=[f"f{j}" for j in range(p_feat)],
    )
    U.insert(0, "UserId", [f"u{i}" for i in range(m)] + ["new1", "new2",
                                                         "new3"])
    model = CMF(k=5, lambda_=0.5, niter=5, use_float=False).fit(df, U=U)
    assert len(model.user_mapping_) == m + 3
    assert model.A_.shape[0] == m + 3
    # appended users predict finitely and rank items
    pnew = model.predict("new2", "it3")
    assert np.isfinite(pnew)
    top = model.topN("new1", n=5)
    assert len(top) == 5
    # the appended row must match a cold solve from its side info
    a_new = np.asarray(model.A_)[m]
    a_cold = model.factors_cold(U=U.iloc[m, 1:].to_numpy(np.float64))
    np.testing.assert_allclose(a_new, a_cold, rtol=1e-4, atol=1e-6)


def test_include_all_X_false_hides_side_only_items(ratings_df, rng):
    """include_all_X=False: items that exist only in the item side info
    (extra rows of I) are fit but never recommended by topN, and naming
    one in include= raises; include_all_X=True recommends them
    (/root/reference/cmfrec/__init__.py:2759 effect (a))."""
    df, rows, cols, vals, m, n = ratings_df
    p_feat = 6
    I = pd.DataFrame(
        rng.normal(size=(n + 2, p_feat)),
        columns=[f"g{j}" for j in range(p_feat)],
    )
    I.insert(0, "ItemId", [f"it{j}" for j in range(n)] + ["ghost1",
                                                          "ghost2"])
    kw = dict(k=5, lambda_=0.5, niter=5, use_float=False)
    hidden = CMF(include_all_X=False, **kw).fit(df, I=I)
    assert hidden.B_.shape[0] == n + 2  # still fit...
    top = hidden.topN("u1", n=n + 2)  # ...but never recommended
    assert len(top) == n
    assert not {"ghost1", "ghost2"} & set(np.asarray(top).tolist())
    with pytest.raises(ValueError, match="include_all_X"):
        hidden.topN("u1", n=2, include=["it1", "ghost1"])
    # predict still works for the side-only item (factors exist)
    assert np.isfinite(hidden.predict("u1", "ghost1"))
    shown = CMF(include_all_X=True, **kw).fit(df, I=I)
    top = shown.topN("u1", n=n + 2)
    assert {"ghost1", "ghost2"} <= set(np.asarray(top).tolist())


def test_factors_warm_matches_training_user(ratings_df):
    """A warm solve on a training user's own data approximately reproduces
    that user's factors.  (Not exact: A is solved against the pre-update B
    inside ALS, while the warm solve uses the final B — same asymmetry as
    the reference.)  Run to near-convergence so the gap is small."""
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=5, lambda_=0.7, niter=30, use_cg=False, use_float=False).fit(df)
    u = 3
    sel = rows == u
    item_ids = [f"it{j}" for j in cols[sel]]
    a, bias = model.factors_warm(
        X_col=item_ids, X_val=vals[sel], return_bias=True
    )
    uid = np.where(model.user_mapping_ == f"u{u}")[0][0]
    denom = np.abs(model.A_[uid]).max()
    assert np.abs(a - model.A_[uid]).max() < 2e-2 * denom
    assert abs(bias - model.user_bias_[uid]) < 2e-2 * max(abs(model.user_bias_[uid]), 0.1)


def test_topn_warm_and_predict_warm(ratings_df):
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=5, lambda_=0.7, niter=5, use_float=False).fit(df)
    items = [f"it{j}" for j in cols[rows == 2]]
    top = model.topN_warm(n=5, X_col=items, X_val=vals[rows == 2])
    assert len(top) == 5
    p = model.predict_warm(["it1", "it2"], X_col=items, X_val=vals[rows == 2])
    assert p.shape == (2,)


def test_transform_imputes(rng):
    m, n = 50, 30
    A = rng.normal(size=(m, 3))
    B = rng.normal(size=(n, 3))
    X = 2.0 + A @ B.T
    Xobs = X.copy()
    Xobs[rng.uniform(size=(m, n)) < 0.5] = np.nan
    model = CMF(k=3, lambda_=0.3, niter=8, use_float=False).fit(Xobs)
    Xnew = X[:10].copy()
    holes = rng.uniform(size=Xnew.shape) < 0.3
    Xnew[holes] = np.nan
    out = model.transform(Xnew)
    assert not np.isnan(out).any()
    err = np.abs(out[holes] - X[:10][holes]).mean()
    assert err < 0.5


def test_from_model_matrices(rng):
    A = rng.normal(size=(20, 4))
    B = rng.normal(size=(15, 4))
    model = CMF.from_model_matrices(A, B, glob_mean=1.5, use_float=False)
    p = model.predict(2, 3)
    assert np.isclose(p, 1.5 + A[2] @ B[3], rtol=1e-5)
    top = model.topN(0, n=5)
    assert len(top) == 5


def test_swap_users_and_items(ratings_df):
    df, *_ = ratings_df
    model = CMF(k=4, lambda_=0.5, niter=3, use_float=False).fit(df)
    sw = model.swap_users_and_items(precompute=False)
    p1 = model.predict("u1", "it2")
    p2 = sw.predict("it2", "u1")
    assert np.isclose(p1, p2, rtol=1e-6)


def test_set_params_guard(ratings_df):
    df, *_ = ratings_df
    model = CMF(k=4, niter=2, use_float=False)
    model.set_params(k=5)
    assert model.k == 5
    model.fit(df)
    with pytest.raises(ValueError):
        model.set_params(k=6)


class TestImplicitAPI:
    def test_fit_topn_warm(self, rng):
        m, n = 60, 40
        A = rng.normal(size=(m, 4))
        B = rng.normal(size=(n, 4))
        prob = 1 / (1 + np.exp(-(A @ B.T - 1.0)))
        mask = rng.uniform(size=(m, n)) < prob
        rows, cols = np.nonzero(mask)
        vals = rng.integers(1, 8, size=rows.size).astype(float)
        X = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
        model = CMF_implicit(k=8, lambda_=1.0, niter=8, use_float=False).fit(X)
        assert model.A_.shape == (m, 8)
        top = model.topN(0, n=5)
        assert len(top) == 5
        # warm factors on a training user's data land near the training row
        u = int(np.argmax(np.bincount(rows)))
        a = model.factors_warm(X_col=cols[rows == u], X_val=vals[rows == u])
        cos = a @ model.A_[u] / (np.linalg.norm(a) * np.linalg.norm(model.A_[u]))
        assert cos > 0.95

    def test_from_model_matrices(self, rng):
        A = rng.normal(size=(10, 3))
        B = rng.normal(size=(12, 3))
        model = CMF_implicit.from_model_matrices(A, B, use_float=False)
        assert np.isclose(model.predict(1, 2), A[1] @ B[2], rtol=1e-5)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_save_load_roundtrip(ratings_df, tmp_path):
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=4, lambda_=0.5, niter=3, use_float=False).fit(df)
    p = model.predict("u1", "it2")
    path = str(tmp_path / "model.npz")
    model.save(path)
    loaded = CMF.load(path)
    assert np.isclose(loaded.predict("u1", "it2"), p)
    top1 = model.topN("u1", n=5)
    top2 = loaded.topN("u1", n=5)
    assert list(map(str, top1)) == list(map(str, top2))


# ---------------------------------------------------------------------- #
# batch / new-entity prediction surface                                   #
# ---------------------------------------------------------------------- #


@pytest.fixture
def sideinfo_models(rng):
    m, n, k_true, p, q = 60, 40, 3, 6, 5
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    U = A @ rng.normal(size=(k_true, p)) + 0.05 * rng.normal(size=(m, p))
    I = B @ rng.normal(size=(k_true, q)) + 0.05 * rng.normal(size=(n, q))
    full = 3.0 + A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + 0.1 * rng.normal(size=rows.size)
    X = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
    exp = CMF(k=5, lambda_=0.5, niter=6, use_float=False).fit(X, U=U, I=I)
    imp_vals = np.maximum(1.0, vals - vals.min())
    Ximp = sp.coo_matrix((imp_vals, (rows, cols)), shape=(m, n))
    imp = CMF_implicit(k=5, lambda_=1.0, niter=6, use_float=False).fit(
        Ximp, U=U, I=I)
    return exp, imp, X, Ximp, U, I, m, n


def test_predict_warm_multiple_explicit(sideinfo_models, rng):
    exp, _, X, _, U, I, m, n = sideinfo_models
    Xd = np.asarray(X.todense())
    Xd[Xd == 0] = np.nan
    items = np.array([0, 1, 2])
    p = exp.predict_warm_multiple(Xd[:3], items, U=U[:3])
    assert p.shape == (3,)
    # consistency with the single-row path
    p0 = exp.predict_warm([0], X=Xd[0], U=U[0])
    np.testing.assert_allclose(p[0], p0[0], rtol=1e-4, atol=1e-4)


def test_implicit_batch_and_new_item_surface(sideinfo_models):
    _, imp, _, Ximp, U, I, m, n = sideinfo_models
    Xc = sp.csr_matrix(Ximp)
    a = imp.factors_multiple(X=Xc[:4])
    assert a.shape[0] == 4 and np.isfinite(a).all()
    p = imp.predict_warm_multiple(Xc[:4], np.arange(4))
    assert p.shape == (4,) and np.isfinite(p).all()
    pc = imp.predict_cold_multiple(np.arange(3), U=U[:3])
    assert pc.shape == (3,) and np.isfinite(pc).all()
    bf = imp.item_factors_cold(I=I[0])
    assert np.isfinite(bf).all()
    pn = imp.predict_new(0, I=I[:5])
    assert pn.shape == (5,) and np.isfinite(pn).all()
    top = imp.topN_new(0, I=I, n=5)
    assert len(top) == 5
    # the new-item ranking should correlate with the existing-item ranking
    # (I are the true item attributes)
    full_top = imp.topN(0, n=5)
    assert len(set(np.asarray(top)) & set(np.asarray(full_top))) >= 1


def test_omf_extended_surface(rng):
    from cmfrec_tpu import OMF_explicit

    m, n, k_true, p, q = 50, 30, 3, 5, 4
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    U = A @ rng.normal(size=(k_true, p))
    I = B @ rng.normal(size=(k_true, q))
    full = 3.0 + A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.5
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + 0.1 * rng.normal(size=rows.size)
    X = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
    om = OMF_explicit(k=4, lambda_=0.5, method="als", niter=6).fit(X, U=U, I=I)

    pc = om.predict_cold_multiple(np.arange(3), U=U[:3])
    assert pc.shape == (3,) and np.isfinite(pc).all()
    assert np.isfinite(om.item_factors_cold(I=I[0])).all()
    pn = om.predict_new(0, I=I[:4])
    assert pn.shape == (4,) and np.isfinite(pn).all()
    assert len(om.topN_new(0, I=I, n=5)) == 5
    Xd = np.asarray(X.todense())
    Xd[Xd == 0] = np.nan
    pw = om.predict_warm_multiple(Xd[:3], np.array([1, 2, 3]), U=U[:3])
    assert pw.shape == (3,) and np.isfinite(pw).all()
    out = om.transform(Xd[:3], U=U[:3])
    assert out.shape == (3, n) and np.isfinite(out).all()


def test_precondition_cg_matches_plain_cg(rng):
    m, n, k_true = 60, 40, 3
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    full = 3.0 + A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + 0.1 * rng.normal(size=rows.size)
    X = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
    kw = dict(k=5, lambda_=0.5, niter=10, use_float=False, use_cg=True)
    import cmfrec_tpu.solvers.drivers as drv

    r1 = drv.fit_explicit_als(rows, cols, vals, m, n, k=5, lambda_=0.5,
                              niter=10, engine="sparse")
    r2 = drv.fit_explicit_als(rows, cols, vals, m, n, k=5, lambda_=0.5,
                              niter=10, engine="sparse", precondition_cg=True)
    p1 = (r1["glob_mean"] + np.asarray(r1["biasA"])[rows]
          + np.asarray(r1["biasB"])[cols]
          + np.einsum("nk,nk->n", np.asarray(r1["A"])[rows],
                      np.asarray(r1["B"])[cols]))
    p2 = (r2["glob_mean"] + np.asarray(r2["biasA"])[rows]
          + np.asarray(r2["biasB"])[cols]
          + np.einsum("nk,nk->n", np.asarray(r2["A"])[rows],
                      np.asarray(r2["B"])[cols]))
    rmse1 = np.sqrt(np.mean((p1 - vals) ** 2))
    rmse2 = np.sqrt(np.mean((p2 - vals) ** 2))
    assert abs(rmse1 - rmse2) < 0.02  # same fixed point, PCG just converges differently


def test_fit_triplets_on_base(rng):
    m, n = 40, 25
    rows = rng.integers(0, m, 300)
    cols = rng.integers(0, n, 300)
    vals = rng.uniform(1, 5, 300)
    mi = CMF_implicit(k=4, niter=3).fit_triplets(rows, cols, vals, m, n)
    assert mi.is_fitted_


def test_predict_unknown_ids_semantics(ratings_df, rng):
    """Unknown ids: CMF -> mean(+bias); CMF_implicit -> NaN
    (/root/reference/cmfrec/__init__.py:1188-1192)."""
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=5, lambda_=0.5, niter=4, use_float=False).fit(df)
    p = model.predict(["u0", "NOSUCHUSER"], ["it0", "it1"])
    assert np.isfinite(p).all()
    ib = np.asarray(model.item_bias_)[
        np.nonzero(model.item_mapping_ == "it1")[0][0]]
    assert abs(p[1] - (model.glob_mean_ + ib)) < 1e-5

    X = sp.coo_matrix((np.abs(vals) + 0.5, (rows, cols)), shape=(m, n))
    mi = CMF_implicit(k=5, niter=3, use_float=False).fit(X)
    pi = mi.predict([0, m + 5], [0, 1])
    assert np.isfinite(pi[0]) and np.isnan(pi[1])


def test_lambda6_per_matrix_regularization(rng):
    """Length-6 lambda_ ordered (user_bias, item_bias, A, B, C, D): a huge
    A-lambda shrinks A but not B (/root/reference/src/cmfrec.h:1858)."""
    m, n = 60, 40
    rows = rng.integers(0, m, 700)
    cols = rng.integers(0, n, 700)
    vals = rng.normal(size=700) + 3
    lam_small = CMF(k=4, lambda_=[0.5, 0.5, 0.5, 0.5, 0.5, 0.5], niter=6,
                    use_float=False).fit_triplets(rows, cols, vals, m, n)
    lam_bigA = CMF(k=4, lambda_=[0.5, 0.5, 500.0, 0.5, 0.5, 0.5], niter=6,
                   use_float=False).fit_triplets(rows, cols, vals, m, n)
    normA_small = np.linalg.norm(np.asarray(lam_small.A_))
    normA_big = np.linalg.norm(np.asarray(lam_bigA.A_))
    assert normA_big < 0.05 * normA_small
    # B is re-solved against the shrunken A, so just check it stays finite
    assert np.isfinite(np.asarray(lam_bigA.B_)).all()


def test_na_as_zero_user_collective(rng):
    """NA_as_zero_user treats missing side-info entries as zeros — fits and
    stays finite with sparse U (/root/reference/src/collective.c:303)."""
    m, n, p = 50, 30, 8
    rows = rng.integers(0, m, 600)
    cols = rng.integers(0, n, 600)
    vals = rng.normal(size=600) + 3
    U = rng.normal(size=(m, p))
    U[rng.uniform(size=(m, p)) < 0.6] = np.nan  # sparse side info
    model = CMF(k=4, lambda_=0.5, niter=5, NA_as_zero_user=True,
                center_U=False, use_float=False).fit_triplets(
        rows, cols, vals, m, n, U=U)
    assert np.isfinite(np.asarray(model.A_)).all()
    assert np.isfinite(np.asarray(model.C_)).all()
    p0 = model.predict(0, 0)
    assert np.isfinite(p0)


def test_imputer_in_sklearn_pipeline(rng):
    """CMF_imputer composes as an sklearn transformer."""
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    from cmfrec_tpu import CMF_imputer

    m, n = 40, 25
    X = rng.normal(size=(m, n)) + 3
    X[rng.uniform(size=(m, n)) < 0.4] = np.nan
    pipe = Pipeline([
        ("impute", CMF_imputer(k=4, lambda_=0.5, niter=4, use_float=False)),
        ("scale", StandardScaler()),
    ])
    out = pipe.fit_transform(X)
    assert out.shape == X.shape and np.isfinite(out).all()


def test_produce_dicts(ratings_df):
    """produce_dicts=True builds user_dict_/item_dict_ (id -> position),
    matching /root/reference/cmfrec/__init__.py:2727."""
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=3, niter=2, produce_dicts=True, use_float=False).fit(df)
    assert len(model.user_dict_) == m
    assert len(model.item_dict_) == n
    u0 = model.user_mapping_[0]
    assert model.user_dict_[u0] == 0
    m2 = CMF(k=3, niter=2, produce_dicts=False, use_float=False).fit(df)
    assert m2.user_dict_ == {}


def test_drop_nonessential_matrices(ratings_df, rng):
    """After the production-memory trim, warm/cold factor methods still
    work while predict/topN for existing users stop (reference
    /root/reference/cmfrec/__init__.py:2366)."""
    df, rows, cols, vals, m, n = ratings_df
    U = rng.normal(size=(m, 6))
    model = CMF(k=4, lambda_=0.5, niter=4, use_float=False).fit(df, U=U)
    model.drop_nonessential_matrices(drop_precomputed=False)
    assert model.A_ is None and model.user_bias_ is None
    obs = [f"it{j}" for j in range(0, 10)]
    a, bias = model.factors_warm(X_col=obs, X_val=np.linspace(1, 5, 10),
                                 return_bias=True)
    assert np.isfinite(a).all()
    top = model.topN_warm(n=5, X_col=obs, X_val=np.linspace(1, 5, 10))
    assert len(top) == 5
    a_cold = model.factors_cold(U=rng.normal(size=6))
    assert np.isfinite(a_cold).all()
    with pytest.raises(Exception):
        model.predict("u1", "it2")
    # wrong model class raises
    from cmfrec_tpu import MostPopular

    mp = MostPopular().fit(np.where(rng.uniform(size=(10, 8)) < 0.5,
                                    3.0, np.nan))
    with pytest.raises(ValueError):
        mp.drop_nonessential_matrices()


def test_swap_keeps_binary_matrices(rng):
    """swap_users_and_items exchanges Cb/Db so item_factors_cold with
    binary side info works through the swapped model."""
    m, n = 40, 25
    A = rng.normal(size=(m, 3))
    B = rng.normal(size=(n, 3))
    X = np.where(rng.uniform(size=(m, n)) < 0.5, 3.0 + A @ B.T, np.nan)
    Ib = (B[:, :2] > 0).astype(np.float64)
    model = CMF(method="lbfgs", k=3, lambda_=1.0, maxiter=100,
                use_float=False).fit(X, I_bin=Ib)
    assert model.Db_ is not None
    sw = model.swap_users_and_items(precompute=False)
    assert sw.Cb_ is not None
    np.testing.assert_allclose(np.asarray(sw.Cb_), np.asarray(model.Db_))
    b = model.item_factors_cold(I_bin=Ib[3])
    assert np.isfinite(b).all()


def test_fully_observed_warm_uses_transbtbinvbt(rng):
    """Warm factors for fully-observed unweighted rows route through the
    lazily-built TransBtBinvBt cache (one matmul) with output identical to
    the general solve (/root/reference/src/collective.c:10363)."""
    m, n = 40, 20
    X = 3.0 + rng.normal(size=(m, n))
    model = CMF(k=4, lambda_=0.8, niter=4, use_float=False).fit(X)
    Xnew = 3.0 + rng.normal(size=(3, n))
    a1, b1 = model.factors_multiple(X=Xnew, return_bias=True)
    assert model._cache_stats.get("warm_dense_matmul", 0) >= 1
    assert "TransBtBinvBt" in model._precomputed  # built lazily on use
    model._precomputed = {}
    a2, b2 = model.factors_multiple(X=Xnew, return_bias=True)
    np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(b1, b2, rtol=1e-7, atol=1e-9)


def test_factors_cold_add_implicit_features(ratings_df, rng):
    """Cold factors on an add_implicit_features model include the BiTBi
    Gram: the reference only dispatches to collective_factors_cold when
    !add_implicit_features (/root/reference/src/collective.c:3656), so
    Bi models go through the warm path which adds BiTBi unconditionally
    (collective.c:1487).  Cached and uncached paths must agree, and match
    a literal dense oracle."""
    df, rows, cols, vals, m, n = ratings_df
    U = rng.normal(size=(m, 6))
    model = CMF(k=4, k_user=2, k_main=1, lambda_=0.7, niter=4,
                add_implicit_features=True, w_implicit=0.6, w_user=0.8,
                use_float=False).fit(df, U=U)
    u_new = rng.normal(size=6)
    a_cached = model.factors_cold(U=u_new)
    model._precomputed = {}
    a_uncached = model.factors_cold(U=u_new)
    np.testing.assert_allclose(a_cached, a_uncached, rtol=1e-8, atol=1e-10)
    k, ku, km = 4, 2, 1
    C = np.asarray(model.C_)      # [p, ku+k]
    Bi = np.asarray(model.Bi_)    # [n, k+km]
    w = ku + k + km
    G = 0.7 * np.eye(w)
    G[: ku + k, : ku + k] += 0.8 * (C.T @ C)
    G[ku:, ku:] += 0.6 * (Bi.T @ Bi)
    rhs = np.zeros(w)
    uc = u_new - np.asarray(model.U_colmeans_)
    rhs[: ku + k] = 0.8 * (C.T @ uc)
    a_ref = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(a_uncached, a_ref, rtol=1e-6, atol=1e-8)
    # BiTBi couples the k/k_main coords: they are generically nonzero here
    assert np.any(np.abs(a_ref[ku + k:]) > 1e-12)


def test_scale_lam_sideinfo_only(ratings_df, rng):
    """scale_lam_sideinfo=True with scale_lam=False still scales lambda at
    inference (collective_closed_form_block gates on either flag,
    /root/reference/src/collective.c:1286); the cached cold path (lam
    pre-scaled by p in TransCtCinvCt) and the uncached path agree, and a
    warm solve matches the literal (nnz + side count) scaling."""
    _, rows, cols, vals, m, n = ratings_df
    X = np.full((m, n), np.nan)
    X[rows, cols] = vals
    U = rng.normal(size=(m, 6))
    model = CMF(k=4, lambda_=0.5, niter=4, scale_lam_sideinfo=True,
                user_bias=False, item_bias=False,
                use_float=False).fit(X, U=U)
    u_new = rng.normal(size=6)
    a_cached = model.factors_cold(U=u_new)
    assert model._cache_stats.get("cold_matmul", 0) >= 1
    pre = model._precomputed
    model._precomputed = {}
    a_uncached = model.factors_cold(U=u_new)
    np.testing.assert_allclose(a_cached, a_uncached, rtol=1e-7, atol=1e-9)
    # warm oracle: lam * (nnz + p_observed)
    obs = np.arange(0, n, 2)
    xv = np.linspace(1.0, 5.0, obs.size)
    a_w = model.factors_warm(X_col=obs, X_val=xv, U=u_new)
    B = np.asarray(model.B_)[obs]          # [nnz, k]
    C = np.asarray(model.C_)               # [p, k]
    v = xv - model.glob_mean_
    mult = float(obs.size + 6)
    G = B.T @ B + C.T @ C + 0.5 * mult * np.eye(4)
    rhs = B.T @ v + C.T @ (u_new - np.asarray(model.U_colmeans_))
    a_ref = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(a_w, a_ref, rtol=1e-6, atol=1e-8)
    model._precomputed = pre


def test_positional_side_rows_guard(rng):
    """Positional (reindex_=False) side-info ids beyond X's row count raise
    the same clear error as the DataFrame path for models that don't
    support side-only entities (mirrors models/base.py DataFrame check)."""
    from cmfrec_tpu import ContentBased

    m, n = 30, 20
    X = rng.uniform(1, 5, size=(m, n))
    X[rng.uniform(size=(m, n)) < 0.5] = np.nan
    U = pd.DataFrame(rng.normal(size=(m + 4, 3)).astype(np.float64))
    U.insert(0, "UserId", np.arange(m + 4))
    model = ContentBased(k=3, maxiter=10)
    I = rng.normal(size=(n, 3))
    with pytest.raises(ValueError, match="side-info-only"):
        model.fit(X, U=U, I=I)


def test_warm_uses_betbechol_cache(ratings_df, rng):
    """Fully-observed warm rows WITH dense side info route through the
    BeTBeChol cache (/root/reference/src/collective.c:1365, built at
    :10425): no per-row Gram assembly, no per-call Cholesky, identical
    output to the general path.  Also covers the NA-as-zero variant."""
    _, rows, cols, vals, m, n = ratings_df
    X = np.full((m, n), np.nan)
    X[rows, cols] = vals
    U = rng.normal(size=(m, 6))
    model = CMF(k=4, k_user=1, lambda_=0.7, niter=4, w_user=0.9,
                use_float=False).fit(X, U=U)
    assert "BeTBeChol" in model._precomputed
    Xnew = 3.0 + rng.normal(size=(3, n))
    Unew = rng.normal(size=(3, 6))

    import cmfrec_tpu.ops.rowsolve as rs

    orig_assemble, orig_chol = rs.assemble_system, rs.solve_chol
    calls = {"assemble": 0, "chol": 0}

    def counting_assemble(*a, **kw):
        calls["assemble"] += 1
        return orig_assemble(*a, **kw)

    def counting_chol(*a, **kw):
        calls["chol"] += 1
        return orig_chol(*a, **kw)

    rs.assemble_system, rs.solve_chol = counting_assemble, counting_chol
    try:
        a1 = model.factors_multiple(X=Xnew, U=Unew)
    finally:
        rs.assemble_system, rs.solve_chol = orig_assemble, orig_chol
    assert model._cache_stats.get("bechol", 0) >= 1
    assert calls["assemble"] == 0 and calls["chol"] == 0
    model._precomputed = {}
    a2 = model.factors_multiple(X=Xnew, U=Unew)
    np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-9)

    # NA-as-zero variant: sparse observations, rhs-only corrections
    model2 = CMF(k=4, lambda_=0.8, niter=4, NA_as_zero=True,
                 use_float=False).fit(X, U=U)
    assert "BeTBeChol" in model2._precomputed
    obs = np.arange(0, n, 3)
    a3 = model2.factors_warm(X_col=obs, X_val=np.linspace(1, 5, obs.size),
                             U=Unew[0])
    assert model2._cache_stats.get("bechol", 0) >= 1
    model2._precomputed = {}
    a4 = model2.factors_warm(X_col=obs, X_val=np.linspace(1, 5, obs.size),
                             U=Unew[0])
    np.testing.assert_allclose(a3, a4, rtol=1e-7, atol=1e-9)


def test_inference_does_not_mutate_model_state(ratings_df, rng):
    """factors_multiple / predict_warm_multiple ingest new-data X through
    a STATELESS path: mappings, reindex_, and the include_all_X item
    gate (_n_orig) must be untouched (regression — _pack_new_rows used
    to re-run the fit-time ingester and clobber all three)."""
    df, rows, cols, vals, m, n = ratings_df
    model = CMF(k=4, lambda_=0.5, niter=3, use_float=False).fit(df)
    im_before = model.item_mapping_.copy()
    um_before = model.user_mapping_.copy()
    n_orig = model._n_orig
    # new-data DataFrame referencing a subset of known items
    new = df.iloc[:40].copy()
    new["UserId"] = ["zz0"] * 20 + ["zz1"] * 20
    a = model.factors_multiple(X=new)
    assert a.shape[0] == 2
    np.testing.assert_array_equal(model.item_mapping_, im_before)
    np.testing.assert_array_equal(model.user_mapping_, um_before)
    assert model._n_orig == n_orig
    # unknown item ids in new data raise instead of silently refitting ids
    bad = new.copy()
    bad["ItemId"] = ["nope"] * len(bad)
    with pytest.raises(ValueError):
        model.factors_multiple(X=bad)


def test_include_all_X_survives_save_load(ratings_df, rng, tmp_path):
    """The include_all_X=False topN gate (fit-time item count) survives a
    save/load round-trip and swaps with the axes in
    swap_users_and_items."""
    df, rows, cols, vals, m, n = ratings_df
    I = pd.DataFrame(rng.normal(size=(n + 2, 4)),
                     columns=[f"g{j}" for j in range(4)])
    I.insert(0, "ItemId", [f"it{j}" for j in range(n)] + ["gh1", "gh2"])
    model = CMF(k=4, lambda_=0.5, niter=3, use_float=False,
                include_all_X=False).fit(df, I=I)
    path = str(tmp_path / "m.npz")
    model.save(path)
    m2 = CMF.load(path)
    assert m2._n_orig == model._n_orig
    top = m2.topN("u1", n=n + 2)
    assert len(top) == n and "gh1" not in set(np.asarray(top).tolist())
    sw = model.swap_users_and_items(precompute=False)
    assert sw._n_orig == model._m_orig and sw._m_orig == model._n_orig


def test_new_data_positional_bounds_and_partial_init(rng):
    """New-data DataFrames against a positionally-fit model reject
    out-of-range item ids, and partial init= dicts (just A or just B)
    warm-start the present factor without KeyError."""
    m, n = 40, 20
    X = rng.uniform(1, 5, size=(m, n))
    X[rng.uniform(size=(m, n)) < 0.6] = np.nan
    model = CMF(k=4, lambda_=1.0, niter=3, use_float=False).fit(X)
    bad = pd.DataFrame({"UserId": [0, 0], "ItemId": [1, n + 5],
                        "Rating": [3.0, 4.0]})
    with pytest.raises(ValueError, match="unknown item"):
        model.factors_multiple(X=bad)

    from cmfrec_tpu.solvers import drivers

    r, c = np.nonzero(~np.isnan(X))
    v = X[r, c]
    A0 = rng.normal(size=(m, 4))
    full = drivers.fit_explicit_als(r, c, v, m, n, k=4, niter=0, seed=5,
                                    use_cg=False, dtype=np.float64,
                                    init={"A": A0})
    np.testing.assert_allclose(np.asarray(full["A"]), A0, atol=1e-12)
    impl = drivers.fit_implicit_als(r, c, np.abs(v), m, n, k=4, niter=0,
                                    seed=5, use_cg=False, dtype=np.float64,
                                    init={"B": A0[:n] * 0 + 0.5})
    np.testing.assert_allclose(np.asarray(impl["B"]), 0.5, atol=1e-12)


def test_factors_grouped_matches_plain_batch(ratings_df, rng):
    """factors_explicit_grouped (degree-grouped serving path) is row-for-
    row identical to the plain padded batch, including weights, side info,
    zero-degree rows, and the model-level factors_multiple routing."""
    from cmfrec_tpu.models.cmf import CMF
    from cmfrec_tpu.solvers.warm import (
        factors_explicit_batch,
        factors_explicit_grouped,
        pack_padded_rows,
    )

    m, n, p = 60, 40, 5
    rows = rng.integers(0, m, 900)
    cols = rng.integers(0, n, 900)
    vals = rng.normal(size=900) + 3.0
    U = rng.normal(size=(m, p))
    model = CMF(k=6, lambda_=2.0, niter=3, verbose=False).fit_triplets(
        rows, cols, vals, m, n, U=U)

    # power-law new-user batch with some zero-degree rows
    R = 300
    deg = np.minimum((rng.pareto(1.0, R) * 3).astype(np.int64), n)
    deg[:5] = 0
    nr = np.repeat(np.arange(R), deg)
    nc = np.concatenate([rng.choice(n, size=d, replace=False)
                         for d in deg]).astype(np.int64) if deg.sum() else \
        np.zeros(0, np.int64)
    nv = rng.normal(size=nr.size) + 3.0
    nw = rng.uniform(0.5, 2.0, size=nr.size)
    Unew = rng.normal(size=(R, p))

    for wgt, Uu in ((None, None), (nw, Unew)):
        idx, vv, ww, lens = pack_padded_rows(nr, nc, nv, wgt, R)
        # _no_fused pins the grouped path (which rides the fused
        # single-executable kernel when eligible) against the eager
        # host-side reference math
        a1, b1 = factors_explicit_batch(model, idx, vv, ww, lens, U=Uu,
                                        _no_fused=True)
        a2, b2 = factors_explicit_grouped(model, nr, nc, nv, wgt, R, U=Uu)
        np.testing.assert_allclose(a2, np.asarray(a1), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(b2, np.asarray(b1), rtol=2e-4, atol=1e-5)
    # scale_lam exercises the in-kernel per-row lambda multiplier
    model.scale_lam = True
    idx, vv, ww, lens = pack_padded_rows(nr, nc, nv, None, R)
    a1, _ = factors_explicit_batch(model, idx, vv, ww, lens, _no_fused=True)
    a2, _ = factors_explicit_grouped(model, nr, nc, nv, None, R)
    np.testing.assert_allclose(a2, np.asarray(a1), rtol=2e-4, atol=1e-5)
    model.scale_lam = False


def test_implicit_factors_grouped_matches_plain(rng):
    """Implicit grouped+fused warm factors equal the eager batch path,
    including the model-level factors_multiple routing and
    apply_log_transf."""
    from cmfrec_tpu.models.cmf import CMF_implicit
    from cmfrec_tpu.solvers.warm import (
        factors_implicit_batch,
        factors_implicit_grouped,
        pack_padded_rows,
    )

    m, n = 80, 50
    rows = rng.integers(0, m, 1200)
    cols = rng.integers(0, n, 1200)
    vals = np.maximum(1.0, rng.pareto(1.2, 1200) * 5)
    model = CMF_implicit(k=6, lambda_=1.0, alpha=0.8, niter=3).fit_triplets(
        rows, cols, vals, m, n)

    R = 300
    deg = np.minimum((rng.pareto(1.0, R) * 3).astype(np.int64), n)
    deg[:5] = 0
    nr = np.repeat(np.arange(R), deg)
    nc = (np.concatenate([rng.choice(n, size=d, replace=False)
                          for d in deg]).astype(np.int64)
          if deg.sum() else np.zeros(0, np.int64))
    nv = np.maximum(1.0, rng.pareto(1.2, nr.size) * 5)

    idx, vv, _, lens = pack_padded_rows(nr, nc, nv, None, R)
    a1 = factors_implicit_batch(model, idx, vv, lens, _no_fused=True)
    a2 = factors_implicit_grouped(model, nr, nc, nv, R)
    np.testing.assert_allclose(a2, np.asarray(a1), rtol=2e-4, atol=1e-5)

    # model-level: factors_multiple routes big power-law batches through
    # the grouped path and small ones through the plain path — same rows
    import pandas as pd
    live = nr < 64
    Xsmall = pd.DataFrame({"UserId": nr[live], "ItemId": nc[live],
                           "Rating": nv[live]})
    Xbig = pd.DataFrame({"UserId": nr, "ItemId": nc, "Rating": nv})
    a_small = model.factors_multiple(X=Xsmall)
    a_big = model.factors_multiple(X=Xbig)
    # user ids present in both ingests map to the same factors
    seen = np.unique(nr[live])
    np.testing.assert_allclose(a_big[: seen.size], a_small[: seen.size],
                               rtol=2e-4, atol=1e-5)


def test_warm_factors_scale_bias_const(rng):
    """scale_lam + scale_bias_const warm factors: the k factor coords'
    penalty scales with the row's observation count but the bias
    coordinate's penalty stays at lam_bias * scaling_biasA (the fit-time
    mean observation weight) — common.c:717-722 / collective.c:3787.
    Pinned against a direct NumPy solve, on both the fused kernel and
    the eager path, and scaling_biasA_ survives save/load."""
    m, n, k = 60, 40, 4
    rows = rng.integers(0, m, 900)
    cols = rng.integers(0, n, 900)
    vals = np.round(2 * (rng.normal(size=900) + 3.0)) / 2
    model = CMF(k=k, lambda_=2.0, niter=4, scale_lam=True,
                scale_bias_const=True, use_float=False).fit_triplets(
        rows, cols, vals, m, n)
    assert model.scaling_biasA_ == 900 / m
    assert model.scaling_biasB_ == 900 / n

    obs = np.arange(0, n, 3, dtype=np.int64)
    xv = np.linspace(1.0, 5.0, obs.size)
    from cmfrec_tpu.solvers.warm import factors_explicit_batch

    # direct NumPy oracle with the constant bias penalty
    B = np.asarray(model.B_, np.float64)
    bB = np.asarray(model.item_bias_, np.float64)
    mu = model.glob_mean_
    Be = np.concatenate([B[obs], np.ones((obs.size, 1))], axis=1)
    cnt = float(obs.size)
    lam_diag = np.full(k + 1, 2.0 * cnt)
    lam_diag[k] = 2.0 * model.scaling_biasA_
    G = Be.T @ Be + np.diag(lam_diag)
    rhs = Be.T @ (xv - mu - bB[obs])
    sol = np.linalg.solve(G, rhs)

    idx = obs[None, :]
    vv = xv[None, :]
    lens = np.array([obs.size], np.int64)
    for no_fused in (False, True):
        a, bias = factors_explicit_batch(model, idx, vv, None, lens,
                                         _no_fused=no_fused)
        np.testing.assert_allclose(np.asarray(a)[0], sol[:k], rtol=1e-6,
                                   atol=1e-8, err_msg=f"fused={not no_fused}")
        np.testing.assert_allclose(float(np.asarray(bias)[0]), sol[k],
                                   rtol=1e-6, atol=1e-8)
    assert model._cache_stats.get("warm_fused", 0) >= 1

    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as td:
        path = _os.path.join(td, "m.npz")
        model.save(path)
        m2 = CMF.load(path)
        assert m2.scaling_biasA_ == model.scaling_biasA_
        a2, b2 = factors_explicit_batch(m2, idx, vv, None, lens)
        np.testing.assert_allclose(np.asarray(a2)[0], sol[:k], rtol=1e-6,
                                   atol=1e-8)
