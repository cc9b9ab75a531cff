"""Tests for the L-BFGS path, offsets models, ContentBased, MostPopular,
and CMF_imputer."""

import numpy as np
import pytest

from cmfrec_tpu import (
    CMF,
    CMF_implicit,
    ContentBased,
    MostPopular,
    OMF_explicit,
    OMF_implicit,
    CMF_imputer,
)


@pytest.fixture
def small_problem(rng):
    m, n, kt = 60, 40, 3
    A = rng.normal(size=(m, kt))
    B = rng.normal(size=(n, kt))
    X = 2.5 + A @ B.T + 0.1 * rng.normal(size=(m, n))
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = X[rows, cols]
    U = A @ rng.normal(size=(kt, 7)) + 0.05 * rng.normal(size=(m, 7))
    I = B @ rng.normal(size=(kt, 5)) + 0.05 * rng.normal(size=(n, 5))
    Xd = np.where(mask, X, np.nan)
    return Xd, rows, cols, vals, U, I, X, mask


class TestLBFGS:
    def test_cmf_lbfgs_fits(self, small_problem, rng):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = CMF(method="lbfgs", k=4, lambda_=0.5, maxiter=300,
                    use_float=False, verbose=False).fit(Xd, U=U, I=I)
        pred = model.predict(rows, cols)
        rmse = np.sqrt(np.mean((pred - vals) ** 2))
        assert rmse < 0.35 * np.std(vals)
        assert model.C_ is not None and model.D_ is not None
        assert model.nfev_ is not None

    def test_lbfgs_gradient_is_zero_at_optimum(self, small_problem):
        """At convergence the joint-objective gradient must be ~0 — the
        analog of the reference's test_math numeric-gradient checks."""
        import jax

        Xd, rows, cols, vals, U, I, X, mask = small_problem
        from cmfrec_tpu.solvers.lbfgs import fit_collective_explicit_lbfgs

        res = fit_collective_explicit_lbfgs(
            rows, cols, vals, Xd.shape[0], Xd.shape[1],
            side_U=None, side_I=None, k=3, lambda_=1.0,
            user_bias=True, item_bias=True, maxiter=500,
            dtype=np.float64, tol=1e-14,
        )
        # check stationarity of A numerically: residual projection + lam*A
        A, B = res["A"], res["B"]
        bA, bB, mu = res["biasA"], res["biasB"], res["glob_mean"]
        pred = np.sum(A[rows] * B[cols], axis=1) + bA[rows] + bB[cols] + mu
        resid = vals - pred
        gA = np.zeros_like(A)
        np.add.at(gA, rows, -resid[:, None] * B[cols])
        gA += 1.0 * A
        assert np.abs(gA).max() < 1e-3 * max(1.0, np.abs(A).max())

    def test_binary_side_info(self, small_problem, rng):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        Ub = (U[:, :4] > 0).astype(np.float64)
        model = CMF(method="lbfgs", k=3, lambda_=1.0, maxiter=150,
                    use_float=False).fit(Xd, U_bin=Ub)
        assert model.Cb_ is not None
        assert model.Cb_.shape == (4, 3)
        with pytest.raises(ValueError):
            CMF(method="als", k=3).fit(Xd, U_bin=Ub)

    def test_factors_warm_with_binary_oracle(self, small_problem, rng):
        """factors_warm(U_bin=...) must minimize the reference's per-row
        objective (collective_fun_grad_single,
        /root/reference/src/collective.c:962-1110): squared error on X +
        squared error through a sigmoid on U_bin + L2.  Verified against
        scipy.optimize on the same objective."""
        from scipy.optimize import minimize

        Xd, rows, cols, vals, U, I, X, mask = small_problem
        Ub = (U[:, :4] > 0).astype(np.float64)
        lam = 1.0
        model = CMF(method="lbfgs", k=3, lambda_=lam, maxiter=300,
                    user_bias=False, item_bias=False,
                    use_float=False).fit(Xd, U=U, U_bin=Ub)
        sel = rows == 5
        xc, xv = cols[sel], vals[sel]
        a = model.factors_warm(X_col=xc, X_val=xv, U=U[5], U_bin=Ub[5])

        B = np.asarray(model.B_)
        C = np.asarray(model.C_)
        Cb = np.asarray(model.Cb_)
        mu = model.glob_mean_
        ucm = model.U_colmeans_
        u5 = U[5] - (ucm if ucm is not None else 0.0)

        def obj(av):
            f = 0.5 * np.sum((xv - mu - B[xc] @ av) ** 2)
            f += 0.5 * np.sum((u5 - C @ av) ** 2)
            f += 0.5 * np.sum(
                (Ub[5] - 1.0 / (1.0 + np.exp(-(Cb @ av)))) ** 2)
            f += 0.5 * lam * np.sum(av ** 2)
            return f

        want = minimize(obj, np.zeros(3), method="L-BFGS-B",
                        options={"maxiter": 500, "ftol": 1e-14}).x
        assert obj(a) <= obj(want) * (1 + 1e-6) + 1e-9
        np.testing.assert_allclose(a, want, rtol=1e-3, atol=1e-5)
        # cold variant: X term absent, k_main frozen (collective.c:3412)
        a_cold = model.factors_cold(U=U[5], U_bin=Ub[5])

        def obj_cold(av):
            f = 0.5 * np.sum((u5 - C @ av) ** 2)
            f += 0.5 * np.sum(
                (Ub[5] - 1.0 / (1.0 + np.exp(-(Cb @ av)))) ** 2)
            f += 0.5 * lam * np.sum(av ** 2)
            return f

        want_c = minimize(obj_cold, np.zeros(3), method="L-BFGS-B",
                          options={"maxiter": 500, "ftol": 1e-14}).x
        np.testing.assert_allclose(a_cold, want_c, rtol=1e-3, atol=1e-5)
        # U_bin on a model without Cb must raise
        m2 = CMF(method="als", k=3, niter=2, use_float=False).fit(Xd)
        with pytest.raises(ValueError):
            m2.factors_warm(X_col=xc, X_val=xv, U_bin=Ub[5])

    def test_validation_parity(self, small_problem):
        """Unsupported option combinations raise like the reference's
        _take_params (/root/reference/cmfrec/__init__.py:156-167)."""
        with pytest.raises(ValueError):
            CMF(method="lbfgs", NA_as_zero=True)
        with pytest.raises(ValueError):
            CMF(method="lbfgs", nonneg=True)
        with pytest.raises(ValueError):
            CMF(method="lbfgs", scale_lam=True)
        with pytest.raises(ValueError):
            CMF(method="lbfgs", l1_lambda=0.5)
        with pytest.raises(ValueError):
            CMF(method="lbfgs", add_implicit_features=True)
        with pytest.raises(ValueError):
            CMF(method="badmethod")
        with pytest.raises(ValueError):
            CMF(lambda_=-1.0)
        with pytest.raises(ValueError):
            CMF(lambda_=[1.0, 2.0])  # must be scalar or size 6
        with pytest.raises(ValueError):
            OMF_explicit(method="als", k_sec=2)
        with pytest.raises(ValueError):
            OMF_explicit(method="als", w_user=2.0)
        with pytest.raises(ValueError):
            OMF_explicit(method="als", lambda_=np.ones(6))
        # set_params then fit re-validates
        Xd = small_problem[0]
        m = CMF(method="lbfgs", k=3, maxiter=5)
        m.set_params(NA_as_zero=True)
        with pytest.raises(ValueError):
            m.fit(Xd)


class TestOMF:
    def test_omf_explicit_lbfgs(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=4, lambda_=0.5, method="lbfgs", maxiter=300,
                             use_float=False).fit(Xd, U=U, I=I)
        pred = model.predict(rows, cols)
        assert np.sqrt(np.mean((pred - vals) ** 2)) < 0.4 * np.std(vals)
        # cold start from attributes must correlate with the true scores
        a = model.factors_cold(U=U[5])
        s_cold = model.Bm_ @ a + model.glob_mean_
        corr = np.corrcoef(s_cold, X[5] - X[5].mean())[0, 1]
        assert corr > 0.5

    def test_omf_explicit_als_mode(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=4, lambda_=0.5, method="als", niter=8,
                             use_float=False).fit(Xd, U=U, I=I)
        pred = model.predict(rows, cols)
        assert np.sqrt(np.mean((pred - vals) ** 2)) < 0.4 * np.std(vals)
        # Am decomposition consistency: Am == A + U C + C_bias
        UC = np.nan_to_num(U - U.mean(axis=0)) @ model.C_ + model.C_bias_
        np.testing.assert_allclose(model.Am_, model.A_ + UC, rtol=1e-4,
                                   atol=1e-6)

    def test_omf_warm_factors(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=4, lambda_=0.5, method="als", niter=8,
                             use_float=False).fit(Xd, U=U, I=I)
        sel = rows == 2
        a = model.factors_warm(X_col=cols[sel], X_val=vals[sel], U=U[2])
        s = model.Bm_ @ a + model.glob_mean_ + model.item_bias_
        corr = np.corrcoef(s[cols[sel]], vals[sel])[0, 1]
        assert corr > 0.6

    def test_omf_warm_multiple_matches_single(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=4, lambda_=0.5, method="als", niter=8,
                             use_float=False).fit(Xd, U=U, I=I)
        A_batch = model.factors_warm_multiple(Xd[:6], U=U[:6])
        for r in range(6):
            a_one = model.factors_warm(X=Xd[r], U=U[r])
            np.testing.assert_allclose(A_batch[r], a_one, rtol=1e-5,
                                       atol=1e-7)
        # batched predict agrees with batched factors
        items = np.arange(6) % Xd.shape[1]
        p = model.predict_warm_multiple(Xd[:6], items, U=U[:6])
        expect = (np.sum(A_batch * np.asarray(model.Bm_)[items], axis=1)
                  + model.glob_mean_ + np.asarray(model.item_bias_)[items])
        np.testing.assert_allclose(p, expect, rtol=1e-6)
        # transform keeps observed entries and fills the rest
        out = model.transform(Xd[:6], U=U[:6])
        obs = np.isfinite(Xd[:6])
        np.testing.assert_allclose(out[obs], Xd[:6][obs])
        assert np.isfinite(out).all()

    @staticmethod
    def _warm_oracle(model, cols, vals, u=None, wgt=None):
        """NumPy re-implementation of offsets_factors_warm
        (/root/reference/src/offsets.c:578): the three reference cases."""
        Bm = np.asarray(model.Bm_)
        n, kk = Bm.shape
        ks = int(getattr(model, "k_sec", 0))
        k, km = model.k, int(getattr(model, "k_main", 0))
        lam6 = np.atleast_1d(np.asarray(model.lambda_, np.float64))
        lam = float(lam6[2] if lam6.size == 6 else lam6[0])
        v = np.asarray(vals, np.float64) - model.glob_mean_
        if model.item_bias_ is not None:
            v = v - np.asarray(model.item_bias_)[cols]
        if not getattr(model, "exact", False) and ks == 0:
            # ridge on observed entries over the full Am width; u ignored
            Bs = Bm[cols]
            w = np.ones(len(v)) if wgt is None else np.asarray(wgt)
            G = (Bs * w[:, None]).T @ Bs + lam * np.eye(kk)
            return np.linalg.solve(G, (Bs * w[:, None]).T @ v)
        # exact / k_sec path: X' = X - uc @ Bm[:, :ks+k]^T, FULL dense
        uc = np.zeros(ks + k)
        if u is not None and model.C_ is not None:
            uc = model.factors_cold(U=u)[: ks + k]
        Xp = -(Bm[:, : ks + k] @ uc)
        Xp[cols] += v
        w_full = np.ones(n)
        if wgt is not None:
            w_full[cols] = wgt
        Bf = Bm[:, ks:]
        G = (Bf * w_full[:, None]).T @ Bf + lam * np.eye(k + km)
        a = np.linalg.solve(G, (Bf * w_full[:, None]).T @ Xp)
        out = np.zeros(kk)
        out[: ks + k] = uc
        out[ks:] += a
        return out

    def test_omf_warm_oracle_ksec(self, small_problem):
        """Warm factors with k_sec>0 must freeze the attribute block and
        solve the free delta only over [k_sec:] (offsets.c:747-852)."""
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=3, k_sec=2, k_main=1, lambda_=0.7,
                             method="lbfgs", maxiter=120,
                             use_float=False).fit(Xd, U=U, I=I)
        sel = rows == 4
        a = model.factors_warm(X_col=cols[sel], X_val=vals[sel], U=U[4])
        expect = self._warm_oracle(model, cols[sel], vals[sel], u=U[4])
        np.testing.assert_allclose(a, expect, rtol=1e-6, atol=1e-8)
        # attribute block must equal the cold projection over [:ks+k]
        uc = model.factors_cold(U=U[4])[:5]
        np.testing.assert_allclose(a[:2], uc[:2], rtol=1e-6, atol=1e-8)
        # without U: free block only, first k_sec coords stay zero
        a0 = model.factors_warm(X_col=cols[sel], X_val=vals[sel])
        expect0 = self._warm_oracle(model, cols[sel], vals[sel])
        np.testing.assert_allclose(a0, expect0, rtol=1e-6, atol=1e-8)
        assert np.allclose(a0[:2], 0.0)

    def test_omf_warm_oracle_plain_and_exact(self, small_problem):
        """k_sec=0: non-exact ignores attributes (ridge on Am); exact=True
        solves the transformed full-dense system (offsets.c:654,747)."""
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        sel = rows == 7
        w = np.linspace(0.5, 2.0, sel.sum())
        for exact in (False, True):
            model = OMF_explicit(k=4, lambda_=0.5, method="als", niter=6,
                                 exact=exact, use_float=False)
            if exact:
                model.method = "lbfgs"
                model.maxiter = 120
            model.fit(Xd, U=U, I=I)
            a = model.factors_warm(X_col=cols[sel], X_val=vals[sel], U=U[7],
                                   W=w)
            expect = self._warm_oracle(model, cols[sel], vals[sel], u=U[7],
                                       wgt=w)
            np.testing.assert_allclose(a, expect, rtol=1e-6, atol=1e-8)

    def test_omf_implicit_warm_ignores_attributes(self, rng):
        """Implicit warm factors are a plain WRMF solve on Bm; the
        reference ignores u_vec entirely (offsets.c:654-729)."""
        import scipy.sparse as sp

        m, n = 50, 30
        A = rng.normal(size=(m, 3))
        B = rng.normal(size=(n, 3))
        mask = rng.uniform(size=(m, n)) < 1 / (1 + np.exp(-(A @ B.T)))
        rows, cols = np.nonzero(mask)
        vals = rng.integers(1, 6, rows.size).astype(float)
        U = A @ rng.normal(size=(3, 6))
        Xs = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
        model = OMF_implicit(k=4, lambda_=1.0, alpha=2.0, niter=6,
                             use_float=False).fit(Xs, U=U)
        sel = rows == 3
        a = model.factors_warm(cols[sel], vals[sel], U=U[3])
        a_nou = model.factors_warm(cols[sel], vals[sel])
        np.testing.assert_allclose(a, a_nou, rtol=1e-12)
        Bm = np.asarray(model.Bm_)
        av = 2.0 * vals[sel]
        G = Bm.T @ Bm + 1.0 * np.eye(Bm.shape[1])
        G += (Bm[cols[sel]] * av[:, None]).T @ Bm[cols[sel]]
        rhs = ((1.0 + av)[:, None] * Bm[cols[sel]]).sum(axis=0)
        np.testing.assert_allclose(a, np.linalg.solve(G, rhs), rtol=1e-6,
                                   atol=1e-8)

    def test_omf_implicit_warm_multiple_matches_single(self, rng):
        import scipy.sparse as sp

        m, n = 50, 30
        A = rng.normal(size=(m, 3))
        B = rng.normal(size=(n, 3))
        mask = rng.uniform(size=(m, n)) < 1 / (1 + np.exp(-(A @ B.T)))
        rows, cols = np.nonzero(mask)
        vals = rng.integers(1, 6, rows.size).astype(float)
        U = A @ rng.normal(size=(3, 6))
        Xs = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
        model = OMF_implicit(k=4, lambda_=1.0, niter=6,
                             use_float=False).fit(Xs, U=U)
        Xnew = sp.csr_matrix(Xs)[:5]
        A_batch = model.factors_warm_multiple(Xnew, U=U[:5])
        for r in range(5):
            s, e = Xnew.indptr[r], Xnew.indptr[r + 1]
            a_one = model.factors_warm(Xnew.indices[s:e], Xnew.data[s:e],
                                       U=U[r])
            np.testing.assert_allclose(A_batch[r], a_one, rtol=1e-5,
                                       atol=1e-7)

    def test_omf_implicit(self, rng):
        m, n = 50, 30
        A = rng.normal(size=(m, 3))
        B = rng.normal(size=(n, 3))
        mask = rng.uniform(size=(m, n)) < 1 / (1 + np.exp(-(A @ B.T)))
        rows, cols = np.nonzero(mask)
        vals = rng.integers(1, 6, rows.size).astype(float)
        U = A @ rng.normal(size=(3, 6))
        model = OMF_implicit(k=4, lambda_=1.0, niter=6, use_float=False).fit(
            __import__("scipy.sparse", fromlist=["coo_matrix"]).coo_matrix(
                (vals, (rows, cols)), shape=(m, n)
            ),
            U=U,
        )
        top = model.topN_cold(n=5, U=U[3])
        assert len(top) == 5


class TestOMFPrecompute:
    def test_warm_uses_gram_cache(self, small_problem):
        """OMF warm factors serve their shared Gram from the
        precompute_offsets_both caches (offsets.c:870), unchanged output."""
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = OMF_explicit(k=3, k_sec=2, k_main=1, lambda_=0.7,
                             method="lbfgs", maxiter=80,
                             use_float=False).fit(Xd, U=U, I=I)
        assert "BmtBm" in model._precomputed
        sel = rows == 4
        a1 = model.factors_warm(X_col=cols[sel], X_val=vals[sel], U=U[4])
        assert model._cache_stats.get("omf_gram", 0) >= 1
        model._precomputed = {}
        a2 = model.factors_warm(X_col=cols[sel], X_val=vals[sel], U=U[4])
        np.testing.assert_allclose(a1, a2, rtol=1e-10, atol=1e-12)


class TestContentBased:
    def test_fit_and_new_pairs(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = ContentBased(k=3, lambda_=10.0, maxiter=400,
                             use_float=False).fit(Xd, U, I)
        pred = model.predict(rows, cols)
        # content-only model: weaker fit but must beat the constant baseline
        assert np.sqrt(np.mean((pred - vals) ** 2)) < 0.8 * np.std(vals)
        # predictions for brand-new user/item attribute pairs
        p = model.predict_new(U[:4], I[:4])
        assert p.shape == (4,)
        top = model.topN_new(n=5, U=U[0], I=I)
        assert len(top) == 5


class TestMostPopular:
    def test_explicit(self, small_problem):
        Xd, rows, cols, vals, U, I, X, mask = small_problem
        model = MostPopular(center=True, lambda_=2.0).fit(Xd)
        top, scores = model.topN(n=10, output_score=True)
        assert len(top) == 10
        assert np.all(np.diff(scores) <= 1e-9)
        # the top item should have a high column mean
        col_means = np.nanmean(Xd, axis=0)
        assert col_means[int(top[0])] >= np.nanquantile(col_means, 0.7)
        p = model.predict(0, int(top[0]))
        assert np.isfinite(p)

    def test_explicit_with_user_bias(self, small_problem):
        Xd, *_ = small_problem
        model = MostPopular(center=True, user_bias=True, lambda_=2.0).fit(Xd)
        assert model.user_bias_ is not None
        assert np.isfinite(model.predict(3, 5))

    def test_implicit(self, rng):
        m, n = 40, 25
        rows = rng.integers(0, m, 300)
        cols = np.concatenate([rng.integers(0, 5, 200),
                               rng.integers(5, n, 100)])
        vals = rng.integers(1, 10, 300).astype(float)
        import scipy.sparse as sp

        X = sp.coo_matrix((vals, (rows, cols)), shape=(m, n))
        model = MostPopular(implicit=True, lambda_=1.0).fit(X)
        top = model.topN(n=5)
        # popular head items (0-4) dominate
        assert sum(1 for t in top if int(t) < 5) >= 3

    def test_validation(self):
        with pytest.raises(ValueError):
            MostPopular(implicit=True, scale_lam=True)
        with pytest.raises(ValueError):
            MostPopular(implicit=False, apply_log_transf=True)


class TestImputer:
    def test_fit_transform(self, small_problem):
        Xd, *_ = small_problem
        imp = CMF_imputer(k=3, lambda_=0.5, niter=6, use_float=False)
        out = imp.fit_transform(Xd)
        assert not np.isnan(out).any()
        obs = ~np.isnan(Xd)
        np.testing.assert_allclose(out[obs], Xd[obs])


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_omf_warm_zero_lambda_finite(small_problem):
    """lambda_=0 must not poison the padded coordinates (regression:
    padding diagonal needs a positive guard)."""
    Xd, rows, cols, vals, U, I, X, mask = small_problem
    model = OMF_explicit(k=4, method="als", lambda_=0.0, niter=4,
                         use_float=False).fit(Xd, U=U, I=I)
    sel = rows == 2
    a = model.factors_warm(X_col=cols[sel], X_val=vals[sel])
    assert np.isfinite(a).all()
