"""End-to-end correctness of the explicit ALS driver.

Strategy (SURVEY.md §4): rather than matching the reference's random
trajectories, verify the ALS *fixed-point equations* — after the final
Cholesky half-iteration, every row of A must equal the exact closed-form
ridge solution given B (and vice versa for the last-updated side), which is
exactly what the reference's per-row solver computes
(/root/reference/src/common.c:546).
"""

import numpy as np
import pytest

from cmfrec_tpu.solvers.drivers import fit_explicit_als, fit_implicit_als


def make_synthetic(rng, m=60, n=45, k_true=4, density=0.4, noise=0.1):
    A = rng.normal(size=(m, k_true))
    B = rng.normal(size=(n, k_true))
    bA = rng.normal(size=m) * 0.5
    bB = rng.normal(size=n) * 0.5
    mu = 3.0
    full = mu + bA[:, None] + bB[None, :] + A @ B.T
    mask = rng.uniform(size=(m, n)) < density
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols] + noise * rng.normal(size=rows.size)
    return rows, cols, vals, m, n


def closed_form_rows(rows, cols, vals, B_ext, opp_bias, mu, lam, lam_bias,
                     m, has_bias, weights=None, scale_lam=False):
    """NumPy oracle: exact per-row ridge solve."""
    K = B_ext.shape[1]
    out = np.zeros((m, K))
    for i in range(m):
        sel = rows == i
        if not sel.any():
            continue
        js = cols[sel]
        x = vals[sel] - mu - (opp_bias[js] if opp_bias is not None else 0.0)
        Bs = B_ext[js]
        w = weights[sel] if weights is not None else np.ones(sel.sum())
        G = (Bs * w[:, None]).T @ Bs
        mult = w.sum() if scale_lam else 1.0
        lam_vec = np.full(K, lam * mult)
        if has_bias:
            lam_vec[-1] = lam_bias * mult
        G += np.diag(lam_vec)
        out[i] = np.linalg.solve(G, Bs.T @ (w * x))
    return out


@pytest.mark.parametrize("user_bias,item_bias", [(True, True), (False, False), (True, False)])
def test_fixed_point_chol(rng, user_bias, item_bias):
    rows, cols, vals, m, n = make_synthetic(rng)
    lam = 0.5
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=5, lambda_=lam, niter=8, use_cg=False,
        user_bias=user_bias, item_bias=item_bias, dtype=np.float64, verbose=False,
    )
    A, B = res["A"], res["B"]
    mu = res["glob_mean"]
    biasA = res["biasA"] if user_bias else None
    biasB = res["biasB"] if item_bias else None

    # A was updated last given B (the reference's in-iteration order,
    # collective.c:8614 B before :8802 A): check A's closed form exactly.
    B_ext = np.concatenate([B, np.ones((n, 1))], axis=1) if user_bias else B
    want = closed_form_rows(
        rows, cols, vals, B_ext, biasB, mu, lam, lam, m, user_bias
    )
    got = np.concatenate([A, biasA[:, None]], axis=1) if user_bias else A
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_cg_matches_chol_quality(rng):
    rows, cols, vals, m, n = make_synthetic(rng, noise=0.05)
    common = dict(k=5, lambda_=0.5, niter=15, dtype=np.float64)
    r1 = fit_explicit_als(rows, cols, vals, m, n, use_cg=False, **common)
    r2 = fit_explicit_als(
        rows, cols, vals, m, n, use_cg=True, finalize_chol=True, **common
    )

    def rmse(r):
        pred = (
            r["glob_mean"]
            + r["biasA"][rows]
            + r["biasB"][cols]
            + np.sum(r["A"][rows] * r["B"][cols], axis=1)
        )
        return np.sqrt(np.mean((pred - vals) ** 2))

    e1, e2 = rmse(r1), rmse(r2)
    assert e1 < 0.1
    assert abs(e1 - e2) < 0.02


def test_weighted_fixed_point(rng):
    rows, cols, vals, m, n = make_synthetic(rng)
    wgt = rng.uniform(0.5, 2.0, size=rows.size)
    lam = 0.7
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=4, lambda_=lam, niter=6, use_cg=False,
        user_bias=False, item_bias=False, weights=wgt, dtype=np.float64,
    )
    want = closed_form_rows(
        rows, cols, vals, res["B"], None, res["glob_mean"], lam, lam, m,
        False, weights=wgt,
    )
    np.testing.assert_allclose(res["A"], want, rtol=1e-6, atol=1e-8)


def test_bias_init_twosided_oracle(rng):
    """initialize_biases must match a direct per-entry re-implementation of
    the reference's iterated two-sided loop
    (initialize_biases_twosided, /root/reference/src/common.c:4410)."""
    from cmfrec_tpu.solvers.preprocess import initialize_biases

    rows, cols, vals, m, n = make_synthetic(rng)
    v = vals - vals.mean()
    for wgt in (None, rng.uniform(0.5, 2.0, size=vals.size)):
        for scale_lam in (False, True):
            lam_u, lam_i = 0.8, 1.3
            biasA, biasB = initialize_biases(
                rows, cols, v, m, n, lam_u, lam_i, wgt=wgt,
                user_bias=True, item_bias=True, scale_lam=scale_lam,
            )
            # oracle: literal alternating loop, items first, 5 iterations
            bA = np.zeros(m)
            bB = np.zeros(n)
            w = np.ones_like(v) if wgt is None else wgt
            for _ in range(5):
                for j in range(n):
                    sel = cols == j
                    s = np.sum(w[sel] * (v[sel] - bA[rows[sel]]))
                    c = np.sum(w[sel])
                    bB[j] = s / (c + lam_i * (max(c, 1.0) if scale_lam else 1.0))
                for i in range(m):
                    sel = rows == i
                    s = np.sum(w[sel] * (v[sel] - bB[cols[sel]]))
                    c = np.sum(w[sel])
                    bA[i] = s / (c + lam_u * (max(c, 1.0) if scale_lam else 1.0))
            np.testing.assert_allclose(biasA, bA, rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(biasB, bB, rtol=1e-10, atol=1e-12)


def test_scale_lam_fixed_point(rng):
    rows, cols, vals, m, n = make_synthetic(rng)
    lam = 0.05
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=4, lambda_=lam, niter=6, use_cg=False,
        user_bias=False, item_bias=False, scale_lam=True, dtype=np.float64,
    )
    want = closed_form_rows(
        rows, cols, vals, res["B"], None, res["glob_mean"], lam, lam, m,
        False, scale_lam=True,
    )
    np.testing.assert_allclose(res["A"], want, rtol=1e-6, atol=1e-8)


def test_na_as_zero_fixed_point(rng):
    """NA-as-zero: every column participates with raw value 0."""
    rows, cols, vals, m, n = make_synthetic(rng, density=0.2)
    lam = 0.5
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=4, lambda_=lam, niter=6, use_cg=False,
        user_bias=False, item_bias=False, center=False, NA_as_zero=True,
        dtype=np.float64,
    )
    # Oracle: densify X with zeros and solve A rows exactly (A is updated
    # last in the reference's B-then-A order).
    X = np.zeros((m, n))
    X[rows, cols] = vals
    B = res["B"]
    G = B.T @ B + lam * np.eye(4)
    want = np.linalg.solve(G, B.T @ X.T).T
    np.testing.assert_allclose(res["A"], want, rtol=1e-6, atol=1e-8)


def test_na_as_zero_with_center_and_bias(rng):
    """NA-as-zero + centering + biases exercises the BtXbias rhs base."""
    rows, cols, vals, m, n = make_synthetic(rng, density=0.3)
    lam = 1.0
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=3, lambda_=lam, niter=5, use_cg=False,
        user_bias=True, item_bias=True, center=True, NA_as_zero=True,
        dtype=np.float64,
    )
    A, B = res["A"], res["B"]
    mu, biasA, biasB = res["glob_mean"], res["biasA"], res["biasB"]
    # Oracle for A (last updated): dense zero-filled X, bias column on B.
    X = np.zeros((m, n))
    X[rows, cols] = vals
    B_ext = np.concatenate([B, np.ones((n, 1))], axis=1)
    T = X - mu - biasB[None, :]  # target net of the opposing bias
    G = B_ext.T @ B_ext + np.diag([lam] * 3 + [lam])
    want = np.linalg.solve(G, B_ext.T @ T.T).T
    got = np.concatenate([A, biasA[:, None]], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_nonneg_factors(rng):
    rows, cols, vals, m, n = make_synthetic(rng)
    vals = np.abs(vals)
    res = fit_explicit_als(
        rows, cols, vals, m, n, k=4, lambda_=0.5, niter=6,
        user_bias=False, item_bias=False, center=False, nonneg=True,
        dtype=np.float64,
    )
    assert (res["A"] >= 0).all() and (res["B"] >= 0).all()
    pred = np.sum(res["A"][rows] * res["B"][cols], axis=1)
    assert np.sqrt(np.mean((pred - vals) ** 2)) < np.std(vals)


class TestImplicit:
    def test_fixed_point_chol(self, rng):
        m, n, k = 50, 40, 4
        rows, cols = np.nonzero(rng.uniform(size=(m, n)) < 0.25)
        vals = rng.integers(1, 20, size=rows.size).astype(np.float64)
        lam, alpha = 2.0, 0.8
        res = fit_implicit_als(
            rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha,
            niter=10, use_cg=False, dtype=np.float64,
        )
        A, B = res["A"], res["B"]
        # Oracle: A rows from the WRMF normal equations given B (A is
        # updated last in the reference's B-then-A order).
        BtB = B.T @ B
        for i in range(m):
            sel = rows == i
            js = cols[sel]
            x = alpha * vals[sel]
            G = BtB + (B[js] * x[:, None]).T @ B[js] + lam * np.eye(k)
            rhs = B[js].T @ (1.0 + x)
            want = np.linalg.solve(G, rhs)
            np.testing.assert_allclose(A[i], want, rtol=1e-6, atol=1e-8)

    def test_cg_matches_chol(self, rng):
        m, n, k = 50, 40, 4
        rows, cols = np.nonzero(rng.uniform(size=(m, n)) < 0.25)
        vals = rng.integers(1, 20, size=rows.size).astype(np.float64)
        r1 = fit_implicit_als(
            rows, cols, vals, m, n, k=k, lambda_=2.0, niter=20,
            use_cg=False, dtype=np.float64,
        )
        r2 = fit_implicit_als(
            rows, cols, vals, m, n, k=k, lambda_=2.0, niter=20,
            use_cg=True, dtype=np.float64,
        )
        # Same fixed point -> near-identical score matrices.
        S1 = r1["A"] @ r1["B"].T
        S2 = r2["A"] @ r2["B"].T
        assert np.abs(S1 - S2).max() < 5e-2 * np.abs(S1).max()


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_warm_restart_continues_from_init(rng):
    """init= continues training (reset_values=False analog,
    /root/reference/src/cmfrec.h:1858): a 4+4 iteration split matches a
    straight 8-iteration fit's quality."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    m, n, kt = 120, 80, 4
    A0 = rng.normal(size=(m, kt))
    B0 = rng.normal(size=(n, kt))
    mask = rng.uniform(size=(m, n)) < 0.4
    ro, co = np.nonzero(mask)
    vals = (A0 @ B0.T)[ro, co] + 3.0 + 0.05 * rng.normal(size=ro.size)
    kw = dict(k=6, lambda_=0.3, user_bias=True, item_bias=True, seed=2,
              finalize_chol=False)

    full = fit_explicit_als(ro, co, vals, m, n, niter=8, **kw)
    half = fit_explicit_als(ro, co, vals, m, n, niter=1, **kw)
    cont = fit_explicit_als(
        ro, co, vals, m, n, niter=7,
        init=dict(A=np.asarray(half["A"]), B=np.asarray(half["B"]),
                  biasA=np.asarray(half["biasA"]),
                  biasB=np.asarray(half["biasB"])),
        **kw)

    def rmse(r):
        p = (r["glob_mean"] + np.asarray(r["biasA"])[ro]
             + np.asarray(r["biasB"])[co]
             + np.einsum("ek,ek->e", np.asarray(r["A"])[ro],
                         np.asarray(r["B"])[co]))
        return np.sqrt(np.mean((p - vals) ** 2))

    r_full, r_half, r_cont = rmse(full), rmse(half), rmse(cont)
    assert r_cont < r_half - 1e-4  # continuing makes real progress
    # 1+7 follows a slightly different CG trajectory than straight-8 (the
    # CG momentum state resets at the boundary) but lands close
    assert abs(r_cont - r_full) < 0.3 * r_full


def test_trajectory_matches_numpy_als(rng):
    """Full-trajectory parity: from an IDENTICAL init, niter exact-Cholesky
    iterations of the engine equal a literal NumPy ALS with joint
    bias-coordinate solves (same B-then-A order, same centering) — the
    matched-hyperparameter trajectory check of SURVEY §4."""
    rows, cols, vals, m, n = make_synthetic(rng)
    k, lam, lam_b, niter = 4, 0.7, 0.9, 3
    mu = float(np.mean(vals))
    v = vals - mu
    A0 = rng.normal(size=(m, k)) * 0.3
    B0 = rng.normal(size=(n, k)) * 0.3
    bA0 = rng.normal(size=m) * 0.1
    bB0 = rng.normal(size=n) * 0.1

    res = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=[lam_b, lam_b, lam, lam, 0, 0],
        niter=niter, use_cg=False, user_bias=True, item_bias=True,
        center=True, engine="sparse", dtype=np.float64,
        init=dict(A=A0, B=B0, biasA=bA0, biasB=bB0),
    )

    # literal NumPy ALS, B half-step then A half-step per iteration
    # (the reference's order, collective.c:8614 / :8802)
    A, B = A0.copy(), B0.copy()
    bA, bB = bA0.copy(), bB0.copy()
    for _ in range(niter):
        for c in range(n):
            sel = cols == c
            if not sel.any():
                B[c] = 0.0
                bB[c] = 0.0
                continue
            Ae = np.concatenate([A[rows[sel]],
                                 np.ones((sel.sum(), 1))], axis=1)
            t = v[sel] - bA[rows[sel]]
            lamv = np.concatenate([np.full(k, lam), [lam_b]])
            sol = np.linalg.solve(Ae.T @ Ae + np.diag(lamv), Ae.T @ t)
            B[c], bB[c] = sol[:k], sol[k]
        for r in range(m):
            sel = rows == r
            if not sel.any():
                A[r] = 0.0
                bA[r] = 0.0
                continue
            Be = np.concatenate([B[cols[sel]],
                                 np.ones((sel.sum(), 1))], axis=1)
            t = v[sel] - bB[cols[sel]]
            lamv = np.concatenate([np.full(k, lam), [lam_b]])
            sol = np.linalg.solve(Be.T @ Be + np.diag(lamv), Be.T @ t)
            A[r], bA[r] = sol[:k], sol[k]

    np.testing.assert_allclose(np.asarray(res["A"]), A, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res["B"]), B, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res["biasA"]), bA, rtol=1e-7,
                               atol=1e-9)
    assert abs(res["glob_mean"] - mu) < 1e-9


def test_implicit_trajectory_matches_numpy_als(rng):
    """WRMF trajectory parity from an identical init: exact-Cholesky
    iterations equal a literal NumPy implicit ALS (confidence 1+alpha*x,
    shared BtB base, B-then-A order)."""
    rows, cols, vals, m, n = make_synthetic(rng)
    x = np.abs(vals) + 1.0
    k, lam, alpha, niter = 4, 1.5, 0.6, 3
    A0 = rng.normal(size=(m, k)) * 0.3
    B0 = rng.normal(size=(n, k)) * 0.3

    res = fit_implicit_als(
        rows, cols, x, m, n, k=k, lambda_=lam, alpha=alpha, niter=niter,
        use_cg=False, dtype=np.float64, init=dict(A=A0, B=B0),
    )

    A, B = A0.copy(), B0.copy()
    for _ in range(niter):
        G0 = A.T @ A
        for c in range(n):
            sel = cols == c
            if not sel.any():
                B[c] = 0.0
                continue
            As = A[rows[sel]]
            av = alpha * x[sel]
            G = G0 + (As.T * av) @ As + lam * np.eye(k)
            B[c] = np.linalg.solve(G, As.T @ (1.0 + av))
        G0 = B.T @ B
        for r in range(m):
            sel = rows == r
            if not sel.any():
                A[r] = 0.0
                continue
            Bs = B[cols[sel]]
            av = alpha * x[sel]
            G = G0 + (Bs.T * av) @ Bs + lam * np.eye(k)
            A[r] = np.linalg.solve(G, Bs.T @ (1.0 + av))

    np.testing.assert_allclose(np.asarray(res["A"]), A, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res["B"]), B, rtol=1e-7, atol=1e-9)
