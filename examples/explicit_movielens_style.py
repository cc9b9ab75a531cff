"""End-to-end explicit-feedback example (the reference's
example/cmfrec_movielens_sideinfo.ipynb flow on synthetic data).

Fits a collective model on ratings + user/item attributes, then exercises
the whole prediction surface: predict, topN, warm/cold start, imputation.

Run: python examples/explicit_movielens_style.py
"""

import numpy as np
import pandas as pd

from cmfrec_tpu import CMF


def make_data(seed=0, m=1200, n=400, k_true=6):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    U = A @ rng.normal(size=(k_true, 10)) + 0.1 * rng.normal(size=(m, 10))
    I = B @ rng.normal(size=(k_true, 8)) + 0.1 * rng.normal(size=(n, 8))
    full = 3.5 + 0.6 * A @ B.T
    mask = rng.uniform(size=(m, n)) < 0.08
    rows, cols = np.nonzero(mask)
    vals = np.clip(full[rows, cols] + 0.3 * rng.normal(size=rows.size),
                   0.5, 5.0)
    ratings = pd.DataFrame({
        "UserId": [f"u{i}" for i in rows],
        "ItemId": [f"movie_{j}" for j in cols],
        "Rating": vals,
    })
    user_info = pd.DataFrame(U, columns=[f"attr{i}" for i in range(10)])
    user_info.insert(0, "UserId", [f"u{i}" for i in range(m)])
    item_info = pd.DataFrame(I, columns=[f"feat{i}" for i in range(8)])
    item_info.insert(0, "ItemId", [f"movie_{j}" for j in range(n)])
    return ratings, user_info, item_info, U, I


def main():
    ratings, user_info, item_info, U, I = make_data()
    train = ratings.sample(frac=0.9, random_state=1)
    test = ratings.drop(train.index)

    model = CMF(k=25, lambda_=0.05, scale_lam=True, niter=10, verbose=True)
    model.fit(train, U=user_info, I=item_info)

    pred = model.predict(test["UserId"], test["ItemId"])
    rmse = float(np.sqrt(np.mean((np.asarray(pred) - test["Rating"]) ** 2)))
    base = float(np.sqrt(np.mean(
        (train["Rating"].mean() - test["Rating"]) ** 2)))
    print(f"held-out RMSE {rmse:.4f} (global-mean baseline {base:.4f})")

    user = train["UserId"].iloc[0]
    print("top-5 for", user, "->", list(model.topN(user, n=5)))

    # warm start: a brand-new user who rated 3 items
    a, bias = model.factors_warm(
        X_col=["movie_1", "movie_2", "movie_3"], X_val=[5.0, 4.0, 1.0],
        return_bias=True)
    print("warm top-5:", list(model.topN_warm(
        n=5, X_col=["movie_1", "movie_2", "movie_3"], X_val=[5.0, 4.0, 1.0])))

    # cold start from attributes only
    print("cold top-5:", list(model.topN_cold(U=U[0], n=5)))

    # imputation of missing ratings for new rows
    X_new = np.full((2, I.shape[0] if False else 400), np.nan)
    X_new[0, :3] = [5.0, 4.0, 3.0]
    X_new[1, 10:12] = [1.0, 2.0]
    imputed = model.transform(X_new)
    print("imputed shape:", imputed.shape,
          "finite:", bool(np.isfinite(imputed).all()))


if __name__ == "__main__":
    main()
