"""Offsets models (OMF_explicit, OMF_implicit) and ContentBased.

API mirrors /root/reference/cmfrec/__init__.py:6039 (OMF_explicit), :7122
(OMF_implicit), :7689 (ContentBased).  Predictions use the combined
matrices Am/Bm; cold-start factors come straight from the attribute
projection (Am_new = w_user * (u C + C_bias)), warm factors add a free
ridge offset against Bm (/root/reference/src/offsets.c:538,578).
"""

from __future__ import annotations

import numpy as np

from ..config import resolve_dtype
from ..solvers import offsets as offsets_solver
from .base import _BaseModel


class _OMFBase(_BaseModel):
    @property
    def _xA(self):
        return self.Am_

    @property
    def _xB(self):
        return self.Bm_

    def _store(self, res):
        self.A_ = res.get("A")
        self.B_ = res.get("B")
        self.C_ = res.get("C")
        self.D_ = res.get("D")
        self.C_bias_ = res.get("C_bias")
        self.D_bias_ = res.get("D_bias")
        self.Am_ = res["Am"] if "Am" in res else None
        self.Bm_ = res.get("Bm")
        self.user_bias_ = res.get("biasA")
        self.item_bias_ = res.get("biasB")
        self.glob_mean_ = res.get("glob_mean", 0.0)
        self.U_colmeans_ = res.get("U_colmeans")
        self.I_colmeans_ = res.get("I_colmeans")
        self.niter_ = res.get("niter")
        self.is_fitted_ = True
        self._build_dicts()
        if self.Bm_ is not None:
            self.force_precompute_for_predictions()

    def force_precompute_for_predictions(self):
        """Bm-space warm-factor caches (precompute_offsets_both,
        /root/reference/src/offsets.c:870)."""
        from ..solvers.warm import build_precomputed_offsets

        self._precomputed = build_precomputed_offsets(self)
        return self

    def _attr_vec(self, U, U_col, U_val, colmeans, C, C_bias, w):
        if U is None and U_col is None:
            raise ValueError("Must pass side info")
        if U is None:
            u = np.zeros(C.shape[0])
            u[np.asarray(U_col, np.int64)] = np.asarray(U_val, np.float64)
        else:
            u = np.asarray(U, np.float64).ravel()
        if colmeans is not None:
            u = u - colmeans
        u = np.nan_to_num(u, nan=0.0)
        out = u @ C
        if C_bias is not None:
            out = out + C_bias
        return w * out

    def factors_cold(self, U=None, U_col=None, U_val=None):
        """Am row for a new user from attributes only
        (/root/reference/src/offsets.c:538): zero free offset."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        uc = self._attr_vec(U, U_col, U_val, self.U_colmeans_, self.C_,
                            self.C_bias_, getattr(self, "w_user", 1.0))
        k_sec = getattr(self, "k_sec", 0)
        k_main = getattr(self, "k_main", 0)
        out = np.zeros(self.Am_.shape[1])
        out[: k_sec + self.k] = uc
        return out

    def predict_cold(self, items, U=None, U_col=None, U_val=None):
        a = self.factors_cold(U=U, U_col=U_col, U_val=U_val)
        i, _ = self._map_ids(items, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        p = self.Bm_[i] @ a + self.glob_mean_
        if self.item_bias_ is not None:
            p = p + self.item_bias_[i]
        return p

    def topN_cold(self, n=10, U=None, U_col=None, U_val=None,
                  include=None, exclude=None, output_score=False):
        a = self.factors_cold(U=U, U_col=U_col, U_val=U_val)
        return self._topN_vec(a, 0.0, n, include, exclude, output_score)

    def _attr_mat(self, M, colmeans, C, C_bias, w):
        """Batch attribute projection: [R, p] -> [R, k] factor rows."""
        M = np.asarray(M, np.float64)
        if M.ndim == 1:
            M = M[None, :]
        if colmeans is not None:
            M = M - np.asarray(colmeans)[None, :]
        M = np.nan_to_num(M, nan=0.0)
        out = w * (M @ np.asarray(C))
        if C_bias is not None:
            out = out + w * np.asarray(C_bias)[None, :]
        return out

    def factors_cold_multiple(self, U=None):
        """Am rows for many new users from attributes
        (/root/reference/cmfrec/__init__.py:5944 factors_cold batched)."""
        uc = self._attr_mat(U, self.U_colmeans_, self.C_, self.C_bias_,
                            getattr(self, "w_user", 1.0))
        k_sec = getattr(self, "k_sec", 0)
        out = np.zeros((uc.shape[0], self.Am_.shape[1]))
        out[:, : k_sec + self.k] = uc
        return out

    def item_factors_cold(self, I=None, I_col=None, I_val=None):
        """Bm row for a new item from its attributes (the D-side dual;
        /root/reference/cmfrec/__init__.py:5965)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        if self.D_ is None:
            raise ValueError("Model was fit without item side info")
        if I is None:
            i_vec = np.zeros(self.D_.shape[0])
            i_vec[np.asarray(I_col, np.int64)] = np.asarray(I_val, np.float64)
        else:
            i_vec = I
        bm = self._attr_mat(i_vec, self.I_colmeans_, self.D_, self.D_bias_,
                            getattr(self, "w_item", 1.0))
        k_sec = getattr(self, "k_sec", 0)
        out = np.zeros(self.Bm_.shape[1])
        out[: k_sec + self.k] = bm[0]
        return out

    def predict_cold_multiple(self, item, U=None):
        """(new user attrs, existing item) pairs
        (/root/reference/cmfrec/__init__.py:5994)."""
        a = self.factors_cold_multiple(U=U)
        i, _ = self._map_ids(item, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        p = np.sum(a * np.asarray(self.Bm_)[i], axis=1) + self.glob_mean_
        if self.item_bias_ is not None:
            p = p + np.asarray(self.item_bias_)[i]
        return p

    def predict_new(self, user, I=None):
        """(existing user, new item attrs) pairs
        (/root/reference/cmfrec/__init__.py:6013)."""
        bm = self._attr_mat(I, self.I_colmeans_, self.D_, self.D_bias_,
                            getattr(self, "w_item", 1.0))
        k_sec = getattr(self, "k_sec", 0)
        B_new = np.zeros((bm.shape[0], self.Bm_.shape[1]))
        B_new[:, : k_sec + self.k] = bm
        u, _ = self._map_ids(user, self.user_mapping_, "user")
        u = np.atleast_1d(u)
        p = np.sum(np.asarray(self.Am_)[u] * B_new, axis=1) + self.glob_mean_
        if self.user_bias_ is not None:
            p = p + np.asarray(self.user_bias_)[u]
        return p

    def topN_new(self, user, I=None, n=10, output_score=False):
        """Rank new items (attributes I) for an existing user
        (/root/reference/cmfrec/__init__.py:5862)."""
        bm = self._attr_mat(I, self.I_colmeans_, self.D_, self.D_bias_,
                            getattr(self, "w_item", 1.0))
        k_sec = getattr(self, "k_sec", 0)
        B_new = np.zeros((bm.shape[0], self.Bm_.shape[1]))
        B_new[:, : k_sec + self.k] = bm
        u, _ = self._map_ids(user, self.user_mapping_, "user")
        scores = B_new @ np.asarray(self.Am_)[int(u)] + self.glob_mean_
        if self.user_bias_ is not None:
            scores = scores + float(np.asarray(self.user_bias_)[int(u)])
        n = min(n, scores.shape[0])
        idx = np.argpartition(-scores, n - 1)[:n]
        idx = idx[np.argsort(-scores[idx])]
        return (idx, scores[idx]) if output_score else idx

    def _pack_dense_rows(self, X, W=None):
        """Dense [R, n] X with NaN=missing -> padded idx/val/weight blocks."""
        from ..solvers.warm import pack_padded_rows

        X = np.asarray(X, np.float64)
        obs = np.isfinite(X)
        rows, cols = np.nonzero(obs)
        vals = X[rows, cols]
        wgt = None if W is None else np.asarray(W, np.float64)[rows, cols]
        return pack_padded_rows(rows, cols, vals, wgt, X.shape[0])

    def _warm_base_multiple(self, R, U=None):
        """Attribute-projection base rows for a warm batch (zeros w/o U)."""
        if U is not None and self.C_ is not None:
            return self.factors_cold_multiple(U=U)
        return np.zeros((R, np.asarray(self.Bm_).shape[1]))

    def _warm_offset(self, base, cols, vals, wgt=None, implicit=False,
                     alpha=1.0, return_bias=False, exact=None):
        """Single-row warm factors via the batched reference-exact solver
        (offsets_factors_warm, /root/reference/src/offsets.c:578)."""
        from ..solvers.warm import offsets_warm_batch

        cols = np.atleast_1d(np.asarray(cols, np.int64))
        vals = np.atleast_1d(np.asarray(vals, np.float64))
        idx = cols[None, :] if cols.size else np.zeros((1, 1), np.int64)
        vv = vals[None, :] if cols.size else np.zeros((1, 1))
        ww = None
        if wgt is not None and cols.size:
            ww = np.atleast_1d(np.asarray(wgt, np.float64))[None, :]
        counts = np.array([cols.size], np.int64)
        b = None if base is None else np.asarray(base, np.float64)[None, :]
        res = offsets_warm_batch(self, idx, vv, counts, wgt=ww, base=b,
                                 implicit=implicit, alpha=alpha,
                                 return_bias=return_bias, exact=exact)
        if return_bias and not implicit:
            a, bias = res
            return a[0], float(bias[0])
        return res[0]


class OMF_explicit(_OMFBase):
    """Explicit-feedback offsets model (reference:
    /root/reference/cmfrec/__init__.py:6039)."""

    def __init__(self, k=50, lambda_=1e1, method="lbfgs", use_cg=True,
                 user_bias=True, item_bias=True, center=True, k_sec=0,
                 k_main=0, add_intercepts=True, w_user=1.0, w_item=1.0,
                 maxiter=10000, niter=10, parallelize="separate",
                 corr_pairs=7, max_cg_steps=3, precondition_cg=False,
                 finalize_chol=True, NA_as_zero=False, use_float=False,
                 random_state=1, verbose=False, print_every=100,
                 produce_dicts=False, handle_interrupt=True,
                 nthreads=-1, n_jobs=None, exact=False):
        self.k = k
        self.lambda_ = lambda_
        self.method = method
        self.use_cg = use_cg
        self.user_bias = user_bias
        self.item_bias = item_bias
        self.center = center
        self.k_sec = k_sec
        self.k_main = k_main
        self.add_intercepts = add_intercepts
        self.w_user = w_user
        self.w_item = w_item
        self.maxiter = maxiter
        self.niter = niter
        self.parallelize = parallelize
        self.corr_pairs = corr_pairs
        self.max_cg_steps = max_cg_steps
        self.precondition_cg = precondition_cg
        self.finalize_chol = finalize_chol
        self.NA_as_zero = NA_as_zero
        self.use_float = use_float
        self.random_state = random_state
        self.verbose = verbose
        self.print_every = print_every
        self.produce_dicts = produce_dicts
        self.handle_interrupt = handle_interrupt
        self.nthreads = nthreads
        self.n_jobs = n_jobs
        self.exact = exact
        self.is_fitted_ = False
        self._validate_offsets_params()

    def _validate_offsets_params(self):
        """_take_params_offsets analog
        (/root/reference/cmfrec/__init__.py:313-340)."""
        if self.method not in ("als", "lbfgs"):
            raise ValueError("'method' must be one of 'als' or 'lbfgs'")
        if int(self.k_sec) < 0 or int(self.k_main) < 0:
            raise ValueError("'k_sec'/'k_main' must be non-negative")
        if self.method == "als":
            if self.k_sec > 0 or self.k_main > 0:
                raise ValueError(
                    "'k_sec' and 'k_main' not supported with method='als'."
                )
            if np.atleast_1d(np.asarray(self.lambda_)).size > 1:
                raise ValueError(
                    "Different regularization for each parameter is not "
                    "supported with method='als'."
                )
            if self.w_user != 1.0 or self.w_item != 1.0:
                raise ValueError(
                    "'w_user' and 'w_item' are not supported with "
                    "method='als'."
                )

    def fit(self, X, U=None, I=None, W=None, mesh=None):
        self._validate_offsets_params()
        from ..config import set_handle_interrupt

        set_handle_interrupt(bool(self.handle_interrupt))
        self._reset()
        self.dtype_ = resolve_dtype(self.use_float)
        rows, cols, vals, wgt, m, n = self._ingest_X(X, W)
        side_U = self._ingest_side(U, self.user_mapping_, m, "U")
        side_I = self._ingest_side(I, self.item_mapping_, n, "I")
        if self.method == "lbfgs" or self.exact or self.k_sec or self.k_main:
            res = offsets_solver.fit_offsets_explicit_lbfgs(
                rows, cols, vals, m, n, side_U=side_U, side_I=side_I,
                k=self.k, k_sec=self.k_sec, k_main=self.k_main,
                lambda_=self.lambda_, w_user=self.w_user, w_item=self.w_item,
                user_bias=self.user_bias, item_bias=self.item_bias,
                center=self.center, add_intercepts=self.add_intercepts,
                maxiter=self.maxiter, corr_pairs=self.corr_pairs,
                weights=wgt, dtype=self.dtype_, seed=self.random_state,
                verbose=self.verbose, print_every=self.print_every,
                mesh=mesh,
            )
        else:
            res = offsets_solver.fit_offsets_als(
                rows, cols, vals, m, n, side_U=side_U, side_I=side_I,
                implicit=False, k=self.k, lambda_=self.lambda_,
                user_bias=self.user_bias, item_bias=self.item_bias,
                center=self.center, add_intercepts=self.add_intercepts,
                niter=self.niter, use_cg=self.use_cg,
                max_cg_steps=self.max_cg_steps,
                finalize_chol=self.finalize_chol, NA_as_zero=self.NA_as_zero,
                weights=wgt, dtype=self.dtype_, seed=self.random_state,
                verbose=self.verbose, mesh=mesh,
            )
        self._store(res)
        return self

    def factors_warm(self, X=None, X_col=None, X_val=None, W=None,
                     U=None, U_col=None, U_val=None, return_bias=False,
                     return_raw_A=False, exact=None):
        if X is not None:
            X = np.asarray(X, np.float64).ravel()
            cols = np.nonzero(~np.isnan(X))[0]
            vals = X[cols]
            if W is not None:
                W = np.asarray(W, np.float64).ravel()
                if W.shape[0] == X.shape[0]:
                    W = W[cols]
        else:
            cols, _ = self._map_ids(np.asarray(X_col), self.item_mapping_, "item")
            cols = np.atleast_1d(cols)
            vals = np.asarray(X_val, np.float64).ravel()
        base = (
            self.factors_cold(U=U, U_col=U_col, U_val=U_val)
            if (U is not None or U_col is not None) and self.C_ is not None
            else np.zeros(self.Bm_.shape[1])
        )
        if return_bias:
            a, bias = self._warm_offset(base, cols, vals, wgt=W,
                                        return_bias=True, exact=exact)
        else:
            a = self._warm_offset(base, cols, vals, wgt=W, exact=exact)
        if return_raw_A:
            # A := Am - w_user*U*C over the shared coords
            # (/root/reference/src/offsets.c:732-741,845-847)
            ks = int(getattr(self, "k_sec", 0))
            a = np.asarray(a) - np.asarray(base)
            a = a[ks:]
        return (a, bias) if return_bias else a

    def predict_warm(self, items, X=None, X_col=None, X_val=None, W=None,
                     U=None, U_col=None, U_val=None):
        a = self.factors_warm(X=X, X_col=X_col, X_val=X_val, W=W, U=U,
                              U_col=U_col, U_val=U_val)
        i, _ = self._map_ids(items, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        p = self.Bm_[i] @ a + self.glob_mean_
        if self.item_bias_ is not None:
            p = p + self.item_bias_[i]
        return p

    def topN_warm(self, n=10, X=None, X_col=None, X_val=None, W=None,
                  U=None, U_col=None, U_val=None, include=None,
                  exclude=None, output_score=False):
        a = self.factors_warm(X=X, X_col=X_col, X_val=X_val, W=W, U=U,
                              U_col=U_col, U_val=U_val)
        return self._topN_vec(a, 0.0, n, include, exclude, output_score)

    def factors_warm_multiple(self, X, W=None, U=None):
        """Warm factors for many new users at once: one batched Cholesky
        solve on device (/root/reference/cmfrec/__init__.py:6771 loop
        becomes a single dispatch)."""
        from ..solvers.warm import offsets_warm_batch

        idx, vv, ww, counts = self._pack_dense_rows(X, W)
        base = self._warm_base_multiple(idx.shape[0], U=U)
        return offsets_warm_batch(self, idx, vv, counts, wgt=ww, base=base)

    def predict_warm_multiple(self, X, item, W=None, U=None):
        """(new user row i, item[i]) for many users
        (/root/reference/cmfrec/__init__.py:6771)."""
        a = self.factors_warm_multiple(X, W=W, U=U)
        i, _ = self._map_ids(item, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        p = np.sum(a * np.asarray(self.Bm_)[i], axis=1) + self.glob_mean_
        if self.item_bias_ is not None:
            p = p + np.asarray(self.item_bias_)[i]
        return p

    def transform(self, X=None, y=None, U=None, W=None,
                  replace_existing=False):
        """Impute missing X entries for new rows (sklearn-style;
        /root/reference/cmfrec/__init__.py:7063).  Rows with no observed
        entries fall back to the attribute projection (cold) or zeros."""
        X = np.asarray(X, np.float64)
        Bm = np.asarray(self.Bm_)
        a = self.factors_warm_multiple(X, W=W, U=U)
        pred = a @ Bm.T + self.glob_mean_
        if self.item_bias_ is not None:
            pred = pred + np.asarray(self.item_bias_)[None, :]
        if replace_existing:
            return pred
        out = X.copy()
        nanmask = np.isnan(out)
        out[nanmask] = pred[nanmask]
        return out


class OMF_implicit(_OMFBase):
    """Implicit-feedback offsets model (reference:
    /root/reference/cmfrec/__init__.py:7122)."""

    def __init__(self, k=50, lambda_=1e0, alpha=1.0, use_cg=True,
                 add_intercepts=True, niter=10, apply_log_transf=False,
                 use_float=False, max_cg_steps=3, precondition_cg=False,
                 finalize_chol=False, random_state=1, verbose=False,
                 produce_dicts=False, handle_interrupt=True,
                 nthreads=-1, n_jobs=None):
        self.k = k
        self.lambda_ = lambda_
        self.alpha = alpha
        self.use_cg = use_cg
        self.add_intercepts = add_intercepts
        self.niter = niter
        self.apply_log_transf = apply_log_transf
        self.use_float = use_float
        self.max_cg_steps = max_cg_steps
        self.precondition_cg = precondition_cg
        self.finalize_chol = finalize_chol
        self.random_state = random_state
        self.verbose = verbose
        self.produce_dicts = produce_dicts
        self.handle_interrupt = handle_interrupt
        self.nthreads = nthreads
        self.n_jobs = n_jobs
        self.w_user = 1.0
        self.w_item = 1.0
        self.k_sec = 0
        self.k_main = 0
        self.is_fitted_ = False

    def fit(self, X, U=None, I=None, mesh=None):
        from ..config import set_handle_interrupt

        set_handle_interrupt(bool(self.handle_interrupt))
        self._reset()
        self.dtype_ = resolve_dtype(self.use_float)
        rows, cols, vals, _, m, n = self._ingest_X(X)
        side_U = self._ingest_side(U, self.user_mapping_, m, "U")
        side_I = self._ingest_side(I, self.item_mapping_, n, "I")
        res = offsets_solver.fit_offsets_als(
            rows, cols, vals, m, n, side_U=side_U, side_I=side_I,
            implicit=True, k=self.k, lambda_=self.lambda_, alpha=self.alpha,
            apply_log_transf=self.apply_log_transf,
            add_intercepts=self.add_intercepts, niter=self.niter,
            use_cg=self.use_cg, max_cg_steps=self.max_cg_steps,
            finalize_chol=self.finalize_chol, dtype=self.dtype_,
            seed=self.random_state, verbose=self.verbose, mesh=mesh,
        )
        self._store(res)
        self.w_main_multiplier_ = res.get("w_main_multiplier", 1.0)
        return self

    def factors_warm(self, X_col, X_val, U=None, U_col=None, U_val=None,
                     return_raw_A=False):
        cols, _ = self._map_ids(np.asarray(X_col), self.item_mapping_, "item")
        cols = np.atleast_1d(cols)
        vals = np.asarray(X_val, np.float64).ravel()
        if self.apply_log_transf:
            vals = np.log(vals)
        base = (
            self.factors_cold(U=U, U_col=U_col, U_val=U_val)
            if (U is not None or U_col is not None) and self.C_ is not None
            else np.zeros(self.Bm_.shape[1])
        )
        a = self._warm_offset(base, cols, vals, implicit=True,
                              alpha=self.alpha)
        if return_raw_A:
            a = np.asarray(a) - np.asarray(base)
        return a

    def predict_warm(self, items, X_col, X_val):
        a = self.factors_warm(X_col, X_val)
        i, _ = self._map_ids(items, self.item_mapping_, "item")
        return self.Bm_[np.atleast_1d(i)] @ a

    def topN_warm(self, n=10, X_col=None, X_val=None, U=None, U_col=None,
                  U_val=None, include=None, exclude=None, output_score=False):
        a = self.factors_warm(X_col, X_val, U=U, U_col=U_col, U_val=U_val)
        return self._topN_vec(a, 0.0, n, include, exclude, output_score)

    def factors_warm_multiple(self, X, U=None):
        """WRMF warm factors for many new users at once (X sparse [R, n]):
        one batched confidence-weighted solve on device."""
        import scipy.sparse as sp

        from ..solvers.warm import offsets_warm_batch, pack_padded_rows

        Xc = sp.coo_matrix(X)
        vals = np.asarray(Xc.data, np.float64)
        if self.apply_log_transf:
            vals = np.log(vals)
        idx, vv, _, counts = pack_padded_rows(Xc.row, Xc.col, vals, None,
                                              Xc.shape[0])
        base = self._warm_base_multiple(idx.shape[0], U=U)
        return offsets_warm_batch(self, idx, vv, counts, base=base,
                                  implicit=True, alpha=float(self.alpha))

    def predict_warm_multiple(self, X, item, U=None):
        """(new user row i, item[i]) for many users
        (/root/reference/cmfrec/__init__.py:7646).  X is sparse [R, n]."""
        a = self.factors_warm_multiple(X, U=U)
        i, _ = self._map_ids(item, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        return np.sum(a * np.asarray(self.Bm_)[i], axis=1)


class ContentBased(_OMFBase):
    """Pure attribute-based model: Am = U C + Cb, Bm = I D + Db
    (reference: /root/reference/cmfrec/__init__.py:7689,
    /root/reference/src/offsets.c:3283).  Requires both U and I."""

    def __init__(self, k=20, lambda_=1e2, user_bias=False, item_bias=False,
                 add_intercepts=True, maxiter=3000, corr_pairs=3,
                 parallelize="separate", verbose=False, print_every=100,
                 random_state=1, use_float=True, produce_dicts=False,
                 handle_interrupt=True, start_with_ALS=True,
                 nthreads=-1, n_jobs=None):
        self.k = k
        self.lambda_ = lambda_
        self.user_bias = user_bias
        self.item_bias = item_bias
        self.add_intercepts = add_intercepts
        self.maxiter = maxiter
        self.corr_pairs = corr_pairs
        self.parallelize = parallelize
        self.verbose = verbose
        self.print_every = print_every
        self.random_state = random_state
        self.use_float = use_float
        self.produce_dicts = produce_dicts
        self.handle_interrupt = handle_interrupt
        self.start_with_ALS = start_with_ALS
        self.nthreads = nthreads
        self.n_jobs = n_jobs
        self.w_user = 1.0
        self.w_item = 1.0
        self.k_main = 0
        self.is_fitted_ = False

    @property
    def k_sec(self):
        return self.k

    def fit(self, X, U, I, W=None, mesh=None):
        if U is None or I is None:
            raise ValueError("ContentBased requires both U and I")
        from ..config import set_handle_interrupt

        set_handle_interrupt(bool(self.handle_interrupt))
        self._reset()
        self.dtype_ = resolve_dtype(self.use_float)
        rows, cols, vals, wgt, m, n = self._ingest_X(X, W)
        side_U = self._ingest_side(U, self.user_mapping_, m, "U")
        side_I = self._ingest_side(I, self.item_mapping_, n, "I")
        init = None
        if self.start_with_ALS:
            als = offsets_solver.fit_offsets_als(
                rows, cols, vals, m, n, side_U=side_U, side_I=side_I,
                implicit=False, k=self.k, lambda_=self.lambda_,
                user_bias=self.user_bias, item_bias=self.item_bias,
                center=True, add_intercepts=self.add_intercepts,
                niter=5, weights=wgt, dtype=self.dtype_,
                seed=self.random_state, verbose=False, mesh=mesh,
            )
            init = {"C": als["C"], "D": als["D"]}
            if als.get("C_bias") is not None:
                init["C_bias"] = als["C_bias"]
            if als.get("D_bias") is not None:
                init["D_bias"] = als["D_bias"]
        res = offsets_solver.fit_offsets_explicit_lbfgs(
            rows, cols, vals, m, n, side_U=side_U, side_I=side_I,
            k=0, k_sec=self.k, k_main=0, lambda_=self.lambda_,
            user_bias=self.user_bias, item_bias=self.item_bias,
            center=True, add_intercepts=self.add_intercepts,
            maxiter=self.maxiter, corr_pairs=self.corr_pairs,
            weights=wgt, dtype=self.dtype_, seed=self.random_state,
            verbose=self.verbose, print_every=self.print_every,
            init_params=init, mesh=mesh,
        )
        self._store(res)
        return self

    def predict_new(self, U, I):
        """Predict for wholly-new user/item pairs given their attributes
        (/root/reference/cmfrec/__init__.py:8073+)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        U = np.asarray(U, np.float64)
        I = np.asarray(I, np.float64)
        am = self._attrs_to_factors(U, self.U_colmeans_, self.C_, self.C_bias_)
        bm = self._attrs_to_factors(I, self.I_colmeans_, self.D_, self.D_bias_)
        return np.sum(am * bm, axis=1) + self.glob_mean_

    @staticmethod
    def _attrs_to_factors(M, colmeans, C, C_bias):
        if colmeans is not None:
            M = M - colmeans[None, :]
        M = np.nan_to_num(M, nan=0.0)
        out = M @ C
        if C_bias is not None:
            out = out + C_bias[None, :]
        return out

    def factors_multiple(self, U=None):
        return self._attrs_to_factors(np.asarray(U, np.float64),
                                      self.U_colmeans_, self.C_, self.C_bias_)

    def topN_new(self, n=10, U=None, U_col=None, U_val=None, I=None,
                 include=None, exclude=None, output_score=False):
        """Rank new items (attributes I) for a new user (attributes U)."""
        a = self.factors_cold(U=U, U_col=U_col, U_val=U_val)
        if I is not None:
            bm = self._attrs_to_factors(np.asarray(I, np.float64),
                                        self.I_colmeans_, self.D_, self.D_bias_)
            scores = bm @ a + self.glob_mean_
            n_top = min(n, scores.shape[0])
            idx = np.argpartition(-scores, n_top - 1)[:n_top]
            idx = idx[np.argsort(-scores[idx])]
            return (idx, scores[idx]) if output_score else idx
        return self._topN_vec(a, 0.0, n, include, exclude, output_score)
