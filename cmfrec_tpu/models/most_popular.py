"""Most-popular (intercepts-only) baseline model.

Reference: /root/reference/cmfrec/__init__.py:8302 (class),
/root/reference/src/common.c:5371,5703 (fit math).

Explicit: biases via the shrunken-mean closed forms (optionally alternating
with user biases).  Implicit: biasB[j] = alpha*S_j / (alpha*S_j + (m -
cnt_j) + lam) with S_j = sum over observed (x+1)
(/root/reference/src/common.c:5804-5809) — the k=0 WRMF solution.
"""

from __future__ import annotations

import numpy as np

from ..config import resolve_dtype
from ..solvers import preprocess
from .base import _BaseModel


class MostPopular(_BaseModel):
    def __init__(self, implicit=False, center=True, user_bias=False,
                 lambda_=1e1, alpha=1.0, NA_as_zero=False, scale_lam=False,
                 scale_bias_const=False, apply_log_transf=False,
                 use_float=False, produce_dicts=False, nthreads=-1,
                 n_jobs=None):
        self.implicit = implicit
        self.center = center
        self.user_bias = user_bias
        self.lambda_ = lambda_
        self.alpha = alpha
        self.NA_as_zero = NA_as_zero
        self.scale_lam = scale_lam
        self.scale_bias_const = scale_bias_const
        self.apply_log_transf = apply_log_transf
        self.use_float = use_float
        self.produce_dicts = produce_dicts
        self.nthreads = nthreads
        self.n_jobs = n_jobs
        self.k = 0
        self.k_user = 0
        self.k_item = 0
        self.is_fitted_ = False
        if implicit and scale_lam:
            raise ValueError("'scale_lam' not supported for implicit-feedback.")
        if (not implicit) and apply_log_transf:
            raise ValueError(
                "Option 'apply_log_transf' only available for 'implicit=True'."
            )

    def fit(self, X, W=None):
        self._reset()
        self.dtype_ = resolve_dtype(self.use_float)
        rows, cols, vals, wgt, m, n = self._ingest_X(X, W)
        lam = np.atleast_1d(np.asarray(self.lambda_, np.float64))
        lam_user = float(lam[0])
        lam_item = float(lam[1] if lam.size == 6 else lam[0])

        if self.implicit:
            v = np.asarray(vals, np.float64)
            if self.apply_log_transf:
                v = np.log(v)
            cnt = np.bincount(cols, minlength=n).astype(np.float64)
            S = np.bincount(cols, weights=v + 1.0, minlength=n)
            a = self.alpha
            self.item_bias_ = (a * S) / (a * S + (m - cnt) + lam_item)
            self.user_bias_ = None
            self.glob_mean_ = 0.0
        else:
            glob_mean = (
                preprocess.weighted_global_mean(vals, wgt) if self.center else 0.0
            )
            if self.NA_as_zero and self.center:
                # mean over all m*n cells (unobserved = 0) — same rule as
                # the factorization drivers (common.c:3513)
                wsum = (float(len(vals)) if wgt is None
                        else float(np.sum(wgt)))
                glob_mean *= wsum / (wsum + float(m) * float(n)
                                     - float(len(vals)))
            vals_c = np.asarray(vals, np.float64) - glob_mean
            scale_lam = self.scale_lam
            # per-entity observation counts / weight sums (shared by the
            # scale_bias_const transform and the alternating solves)
            cA = (np.bincount(rows, minlength=m).astype(np.float64)
                  if wgt is None else np.bincount(rows, weights=wgt,
                                                  minlength=m))
            cB = (np.bincount(cols, minlength=n).astype(np.float64)
                  if wgt is None else np.bincount(cols, weights=wgt,
                                                  minlength=n))
            if scale_lam and self.scale_bias_const:
                # constant scaling: lam *= MEAN per-entity count (or weight
                # sum) instead of per-entity values, then per-entity
                # scaling turns off (common.c:5896-5925)
                lam_user *= float(np.mean(cA))
                lam_item *= float(np.mean(cB))
                scale_lam = False
            if self.NA_as_zero:
                # every unobserved cell participates as a zero with unit
                # weight: sums run over all m (or n) entries and the -mu
                # correction applies to the zeros too
                # (initialize_biases_twosided NA_as_zero,
                # /root/reference/src/common.c:4447)
                cntA = np.bincount(rows, minlength=m).astype(np.float64)
                cntB = np.bincount(cols, minlength=n).astype(np.float64)
                wsA = cA + (float(n) - cntA)  # per-user total cell weight
                wsB = cB + (float(m) - cntB)
                dB = wsB + lam_item * (wsB if scale_lam else 1.0)
                dA = wsA + lam_user * (wsA if scale_lam else 1.0)
                sB0 = np.bincount(
                    cols, weights=vals_c if wgt is None else vals_c * wgt,
                    minlength=n) - glob_mean * (float(m) - cntB)
                sA0 = np.bincount(
                    rows, weights=vals_c if wgt is None else vals_c * wgt,
                    minlength=m) - glob_mean * (float(n) - cntA)
                biasA = np.zeros(m)
                biasB = np.zeros(n)
                passes = 6 if self.user_bias else 1
                for _ in range(passes):
                    # TB_j = sum_i w_ij * biasA_i over ALL i (w=1 on zeros)
                    TB = biasA.sum() + (
                        0.0 if wgt is None else np.bincount(
                            cols, weights=(wgt - 1.0) * biasA[rows],
                            minlength=n))
                    biasB = (sB0 - TB) / dB
                    if not self.user_bias:
                        break
                    TA = biasB.sum() + (
                        0.0 if wgt is None else np.bincount(
                            rows, weights=(wgt - 1.0) * biasB[cols],
                            minlength=m))
                    biasA = (sA0 - TA) / dA
                if not self.user_bias:
                    biasA = None
            elif self.user_bias:
                # the reference's fit_most_popular_internal: biases start
                # at ZERO and run `iter <= maxiter` (maxiter=5) = SIX
                # alternating passes, items first
                # (/root/reference/src/common.c:5928-5932); head-to-head
                # pinned by tests/test_ref_parity.py
                biasA = np.zeros(m)
                biasB = np.zeros(n)
                denB = cB + lam_item * (cB if scale_lam else 1.0)
                denA = cA + lam_user * (cA if scale_lam else 1.0)
                for _ in range(6):
                    resB = vals_c - biasA[rows]
                    sB = np.bincount(
                        cols,
                        weights=resB if wgt is None else resB * wgt,
                        minlength=n,
                    )
                    biasB = np.divide(sB, denB, out=np.zeros_like(sB),
                                      where=denB > 0)
                    resA = vals_c - biasB[cols]
                    sA = np.bincount(
                        rows,
                        weights=resA if wgt is None else resA * wgt,
                        minlength=m,
                    )
                    biasA = np.divide(sA, denA, out=np.zeros_like(sA),
                                      where=denA > 0)
            else:
                _, biasB = preprocess.initialize_biases(
                    rows, cols, vals_c, m, n,
                    lam_user=lam_user, lam_item=lam_item, wgt=wgt,
                    user_bias=False, item_bias=True,
                    scale_lam=scale_lam, nonneg=False,
                )
                biasA = None
            self.item_bias_ = biasB
            self.user_bias_ = biasA if self.user_bias else None
            self.glob_mean_ = float(glob_mean)

        self.A_ = np.zeros((m, 0), self.dtype_)
        self.B_ = np.zeros((n, 0), self.dtype_)
        self.is_fitted_ = True
        return self

    def predict(self, user, item):
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        i, scalar = self._map_ids(item, self.item_mapping_, "item")
        i = np.atleast_1d(i)
        p = self.item_bias_[i] + self.glob_mean_
        if self.user_bias_ is not None:
            u, _ = self._map_ids(user, self.user_mapping_, "user")
            p = p + self.user_bias_[np.atleast_1d(u)]
        return float(p[0]) if scalar else p

    def topN(self, user=None, n=10, include=None, exclude=None,
             output_score=False):
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        scores = self.item_bias_ + self.glob_mean_
        if include is not None:
            inc, _ = self._map_ids(include, self.item_mapping_, "item")
            mask = np.zeros(scores.shape[0], bool)
            mask[np.atleast_1d(inc)] = True
            scores = np.where(mask, scores, -np.inf)
        elif exclude is not None:
            exc, _ = self._map_ids(exclude, self.item_mapping_, "item")
            scores = scores.copy()
            scores[np.atleast_1d(exc)] = -np.inf
        n = min(n, scores.shape[0])
        idx = np.argpartition(-scores, n - 1)[:n]
        idx = idx[np.argsort(-scores[idx])]
        items = self._unmap_items(idx)
        return (items, scores[idx]) if output_score else items
