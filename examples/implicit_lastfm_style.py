"""End-to-end implicit-feedback example (the reference's LastFM flow on
synthetic play counts): WRMF fit, ranking metrics, warm/cold start.

Run: python examples/implicit_lastfm_style.py
"""

import numpy as np
import scipy.sparse as sp

from cmfrec_tpu import CMF_implicit
from cmfrec_tpu.utils.metrics import map_at_k, precision_at_k


def make_plays(seed=0, m=2000, n=600, k_true=8):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    prob = 1.0 / (1.0 + np.exp(-(A @ B.T - 1.5)))
    mask = rng.uniform(size=(m, n)) < prob * 0.4
    rows, cols = np.nonzero(mask)
    plays = np.maximum(1.0, rng.poisson(5, rows.size).astype(float))
    return rows, cols, plays, m, n


def main():
    rows, cols, plays, m, n = make_plays()
    rng = np.random.default_rng(1)
    is_test = rng.uniform(size=rows.size) < 0.2
    Xtr = sp.coo_matrix((plays[~is_test], (rows[~is_test], cols[~is_test])),
                        shape=(m, n))

    model = CMF_implicit(k=30, lambda_=1.0, alpha=1.0, niter=10)
    model.fit(Xtr)

    test_items = {}
    train_items = {}
    for u in rng.choice(m, 200, replace=False):
        test_items[u] = cols[is_test & (rows == u)]
        train_items[u] = cols[~is_test & (rows == u)]
    p10 = precision_at_k(model, test_items, k=10,
                         train_user_items=train_items)
    m10 = map_at_k(model, test_items, k=10, train_user_items=train_items)

    pop = np.bincount(cols[~is_test], minlength=n)
    pop_top = set(np.argsort(-pop)[:10])
    pop_p10 = np.mean([len(pop_top & set(v)) / 10
                       for v in test_items.values() if len(v)])
    print(f"P@10 {p10:.4f}  MAP@10 {m10:.4f}  (popularity P@10 {pop_p10:.4f})")

    # new user who played 3 items heavily
    print("warm top-5:",
          list(model.topN_warm(n=5, X_col=[0, 1, 2], X_val=[50, 20, 10])))


if __name__ == "__main__":
    main()
