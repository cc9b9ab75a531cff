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
