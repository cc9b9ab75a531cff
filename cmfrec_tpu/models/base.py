"""Shared model-API plumbing: parameter handling, input ingestion with ID
reindexing, and prediction/ranking entry points.

Mirrors the reference's `_CMF` base (/root/reference/cmfrec/__init__.py:25):
pandas DataFrames with arbitrary Id columns are reindexed via categorical
codes (`_convert_ids`, __init__.py:378); SciPy sparse and dense NumPy inputs
pass through with positional indices.  Fitted attributes use the reference's
names (A_, B_, C_, D_, user_bias_, item_bias_, glob_mean_, user_mapping_,
item_mapping_, is_fitted_) so downstream code can switch frameworks without
renaming.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import resolve_dtype
from ..ops import predict as predict_ops


def _is_df(x):
    try:
        import pandas as pd

        return isinstance(x, pd.DataFrame)
    except ImportError:  # pragma: no cover
        return False


def _is_sparse(x):
    return hasattr(x, "tocoo") and hasattr(x, "shape")


def _parse_df_values(X, W):
    """Rating/Value/Count + Weight columns of an X DataFrame (shared by
    the fit-time and new-data ingesters)."""
    val_col = "Rating" if "Rating" in X.columns else (
        "Value" if "Value" in X.columns else "Count"
    )
    if val_col not in X.columns:
        raise ValueError("X DataFrame needs a Rating/Value/Count column")
    vals = X[val_col].to_numpy(np.float64)
    wgt = X["Weight"].to_numpy(np.float64) if "Weight" in X.columns else None
    if W is not None:
        wgt = np.asarray(W, np.float64).ravel()
    return vals, wgt


class _BaseModel:
    """sklearn-style base: set_params/get_params, ingestion, prediction."""

    _non_param_attrs = ("is_fitted_",)

    # Whether the fit path solves factor rows for entities present only in
    # the side info (m_u > m).  Only the CMF collective drivers do; other
    # models raise a clear error instead of failing deep in the solver.
    _supports_extra_side_rows = False

    def __repr__(self):
        return f"{self.__class__.__name__}({'fitted' if getattr(self, 'is_fitted_', False) else 'unfitted'})"

    __str__ = __repr__

    def get_params(self, deep=True):
        # sklearn semantics: the constructor's parameters by introspection
        # (a name filter on __dict__ would drop `lambda_`, whose trailing
        # underscore is a keyword-escape, not a fitted-attribute marker —
        # that silently reset lambda_ to its default through save/load
        # and sklearn clone())
        import inspect

        names = [p for p in
                 inspect.signature(type(self).__init__).parameters
                 if p != "self"]
        return {nm: getattr(self, nm) for nm in names if hasattr(self, nm)}

    def set_params(self, **params):
        if getattr(self, "is_fitted_", False):
            raise ValueError(
                "Cannot change parameters after the model has been fit."
            )
        for k, v in params.items():
            if not hasattr(self, k):
                raise ValueError(f"Invalid parameter: {k}")
            setattr(self, k, v)
        return self

    def fit_triplets(self, rows, cols, vals, m, n, W=None, **fit_kwargs):
        """Convenience: fit directly from positional COO triplets."""
        import scipy.sparse as sp

        X = sp.coo_matrix(
            (np.asarray(vals, np.float64),
             (np.asarray(rows, np.int64), np.asarray(cols, np.int64))),
            shape=(m, n),
        )
        if W is not None:
            fit_kwargs["W"] = W
        return self.fit(X, **fit_kwargs)

    # ------------------------------------------------------------------ #
    # input ingestion                                                     #
    # ------------------------------------------------------------------ #

    def _reset(self):
        self.A_ = None
        self.B_ = None
        self.C_ = None
        self.D_ = None
        self.Ai_ = None
        self.Bi_ = None
        self.C_bias_ = None
        self.D_bias_ = None
        self.user_bias_ = None
        self.item_bias_ = None
        self.glob_mean_ = 0.0
        self.scaling_biasA_ = 0.0
        self.scaling_biasB_ = 0.0
        self.U_colmeans_ = None
        self.I_colmeans_ = None
        self.user_mapping_ = np.array([], dtype=object)
        self.item_mapping_ = np.array([], dtype=object)
        self.reindex_ = False
        self.is_fitted_ = False
        self.nfev_ = None
        self.niter_ = None
        self.user_dict_ = {}
        self.item_dict_ = {}
        self._precomputed = {}

    def _ingest_X(self, X, W=None):
        """X as DataFrame(UserId, ItemId, Rating[, Weight]) / scipy sparse /
        dense ndarray (NaN = missing) -> COO triplets + dims + mappings.

        FIT-TIME ONLY (writes mappings and ``_n_orig`` = X's item count
        BEFORE any side-info-only item rows extend the mapping;
        ``include_all_X=False`` gates topN to it,
        /root/reference/cmfrec/__init__.py:2759).  New-data inference goes
        through :meth:`_ingest_X_new`, which must not touch model state."""
        out = self._ingest_X_inner(X, W)
        self._m_orig = out[4]
        self._n_orig = out[5]
        return out

    def _ingest_X_new(self, X, W=None):
        """New-data rows (factors_multiple / predict_warm_multiple):
        same formats as fit, but STATELESS — item ids are mapped through
        the EXISTING item mapping, new-row ids are local to this call,
        and no model attribute is written."""
        if _is_df(X):
            import pandas as pd

            need = {"UserId", "ItemId"}
            if not need.issubset(X.columns):
                raise ValueError("X DataFrame needs UserId and ItemId columns")
            ucodes, _ = pd.factorize(X["UserId"], use_na_sentinel=False)
            icodes, _ = self._map_ids(np.asarray(X["ItemId"]),
                                      self.item_mapping_, "item")
            icodes = np.atleast_1d(icodes)
            n_items = np.asarray(self._xB).shape[0]
            if (icodes < 0).any() or (icodes >= n_items).any():
                bad = np.asarray(X["ItemId"])[(icodes < 0)
                                              | (icodes >= n_items)][:5]
                raise ValueError(f"unknown item id(s) in new X: {bad}")
            vals, wgt = _parse_df_values(X, W)
            return (ucodes.astype(np.int64), icodes.astype(np.int64), vals,
                    wgt, int(ucodes.max()) + 1 if ucodes.size else 0,
                    n_items)
        # positional formats carry no ids to remap
        return self._ingest_X_inner(X, W, store=False)

    def _ingest_X_inner(self, X, W=None, store=True):
        if _is_df(X):
            import pandas as pd

            need = {"UserId", "ItemId"}
            if not need.issubset(X.columns):
                raise ValueError("X DataFrame needs UserId and ItemId columns")
            ucodes, umap = pd.factorize(X["UserId"], use_na_sentinel=False)
            icodes, imap = pd.factorize(X["ItemId"], use_na_sentinel=False)
            if store:
                self.user_mapping_ = np.asarray(umap)
                self.item_mapping_ = np.asarray(imap)
                self.reindex_ = True
            vals, wgt = _parse_df_values(X, W)
            return (
                ucodes.astype(np.int64),
                icodes.astype(np.int64),
                vals,
                wgt,
                len(umap),
                len(imap),
            )
        if _is_sparse(X):
            coo = X.tocoo()
            wgt = None
            if W is not None:
                wgt = W.tocoo().data if _is_sparse(W) else np.asarray(W).ravel()
            if store:
                self.reindex_ = False
            return (
                coo.row.astype(np.int64),
                coo.col.astype(np.int64),
                coo.data.astype(np.float64),
                wgt,
                X.shape[0],
                X.shape[1],
            )
        X = np.asarray(X, np.float64)
        if X.ndim != 2:
            raise ValueError("X must be 2-dimensional")
        mask = ~np.isnan(X)
        rows, cols = np.nonzero(mask)
        vals = X[rows, cols]
        wgt = None
        if W is not None:
            W = np.asarray(W, np.float64)
            wgt = W[rows, cols] if W.ndim == 2 else W.ravel()
        if store:
            self.reindex_ = False
        return rows, cols, vals, wgt, X.shape[0], X.shape[1]

    def _ingest_side(self, U, mapping, n_main, name="U"):
        """Side-info matrix: DataFrame with an Id column, sparse, or dense.

        Returns (rows, cols, vals, n_rows, n_cols, is_dense, dense_mat).
        Rows are aligned to the main matrix's id space; side-info may add
        extra rows beyond n_main (cold-start entities, m_u > m in the
        reference, /root/reference/src/collective.c:7263 signature).
        """
        if U is None:
            return None
        if _is_df(U):
            import pandas as pd

            id_col = f"{name}serId" if name == "U" else "ItemId"
            id_col = "UserId" if name == "U" else "ItemId"
            if id_col in U.columns:
                n_rows = n_main
                if self.reindex_:
                    # Index.get_indexer avoids the Categorical
                    # out-of-dtype deprecation (Pandas4Warning)
                    codes = pd.Index(mapping).get_indexer(
                        np.asarray(U[id_col])
                    ).astype(np.int64)
                    if (codes < 0).any() and not self._supports_extra_side_rows:
                        raise ValueError(
                            f"{name} contains ids not present in X; this "
                            "model does not support side-info-only entities"
                        )
                    if (codes < 0).any():
                        # ids present in U but not X are appended after
                        # n_main: their factor rows are solved from side
                        # info only (m_u > m; the reference's _append_NAs,
                        # /root/reference/cmfrec/__init__.py:342)
                        extra = np.unique(
                            np.asarray(U[id_col])[codes < 0]
                        )
                        mapping = np.concatenate(
                            [np.asarray(mapping), extra]
                        )
                        if name == "U":
                            self.user_mapping_ = mapping
                        else:
                            self.item_mapping_ = mapping
                        codes = pd.Index(mapping).get_indexer(
                            np.asarray(U[id_col])
                        ).astype(np.int64)
                    n_rows = len(mapping)
                else:
                    codes = U[id_col].to_numpy(np.int64)
                    n_ids = int(codes.max()) + 1 if codes.size else 0
                    if n_ids > n_main and not self._supports_extra_side_rows:
                        raise ValueError(
                            f"{name} contains ids not present in X; this "
                            "model does not support side-info-only entities"
                        )
                    n_rows = max(n_main, n_ids)
                feat = U.drop(columns=[id_col]).to_numpy(np.float64)
                dense = np.full((n_rows, feat.shape[1]), np.nan)
                dense[codes] = feat
                return self._side_from_dense(dense)
            U = U.to_numpy(np.float64)
        if _is_sparse(U):
            coo = U.tocoo()
            return (
                coo.row.astype(np.int64),
                coo.col.astype(np.int64),
                coo.data.astype(np.float64),
                U.shape[0],
                U.shape[1],
                False,
                None,
            )
        return self._side_from_dense(np.asarray(U, np.float64))

    @staticmethod
    def _side_from_dense(U):
        if np.isnan(U).any():
            rows, cols = np.nonzero(~np.isnan(U))
            return rows, cols, U[rows, cols], U.shape[0], U.shape[1], False, None
        rows, cols = None, None
        return None, None, None, U.shape[0], U.shape[1], True, U

    def _build_dicts(self):
        """id -> position dicts (the reference's produce_dicts,
        /root/reference/cmfrec/__init__.py:2727 user_dict_/item_dict_)."""
        if getattr(self, "produce_dicts", False) and self.reindex_:
            self.user_dict_ = {u: i for i, u in
                               enumerate(self.user_mapping_)}
            self.item_dict_ = {it: i for i, it in
                               enumerate(self.item_mapping_)}

    # ------------------------------------------------------------------ #
    # id mapping                                                          #
    # ------------------------------------------------------------------ #

    def _map_ids(self, ids, mapping, kind="user", allow_missing=False):
        ids = np.asarray(ids)
        scalar = ids.ndim == 0
        ids = np.atleast_1d(ids)
        if self.reindex_:
            import pandas as pd

            codes = pd.Index(mapping).get_indexer(ids).astype(np.int64)
            if (codes < 0).any() and not allow_missing:
                raise ValueError(f"unknown {kind} id(s): {ids[codes < 0][:5]}")
        else:
            codes = ids.astype(np.int64)
            if allow_missing:
                mat = self._xA if kind == "user" else self._xB
                codes = np.where((codes < 0) | (codes >= mat.shape[0]), -1,
                                 codes)
        return (codes[0] if scalar else codes), scalar

    def _unmap_items(self, idx):
        if self.reindex_:
            return self.item_mapping_[idx]
        return idx

    # ------------------------------------------------------------------ #
    # prediction surface                                                  #
    # ------------------------------------------------------------------ #

    @property
    def _xA(self):
        """A columns that participate in X (strips k_user)."""
        ku = getattr(self, "k_user", 0)
        return self.A_[:, ku:] if ku else self.A_

    @property
    def _xB(self):
        ki = getattr(self, "k_item", 0)
        return self.B_[:, ki:] if ki else self.B_

    # Unknown user/item combinations: the explicit CMF predicts the global
    # mean plus whichever bias is known; other models yield NaN
    # (/root/reference/cmfrec/__init__.py:1188-1192).
    _unknown_pred_mean = False

    def predict(self, user, item):
        """Predict X[user, item] for arrays or scalars of ids
        (reference: /root/reference/cmfrec/__init__.py:1183)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        u, scalar_u = self._map_ids(user, self.user_mapping_, "user",
                                    allow_missing=True)
        i, scalar_i = self._map_ids(item, self.item_mapping_, "item",
                                    allow_missing=True)
        u = np.atleast_1d(u)
        i = np.atleast_1d(i)
        if u.size == 1 and i.size > 1:
            u = np.repeat(u, i.size)
        if i.size == 1 and u.size > 1:
            i = np.repeat(i, u.size)
        bad = (u < 0) | (i < 0)
        p = predict_ops.predict_pairs(
            self._xA, self._xB, np.maximum(u, 0), np.maximum(i, 0),
            self.user_bias_, self.item_bias_, self.glob_mean_,
        )
        p = np.asarray(p).copy()
        if bad.any():
            if self._unknown_pred_mean:
                fill = np.full(bad.sum(), self.glob_mean_)
                if self.user_bias_ is not None:
                    ub = np.asarray(self.user_bias_)
                    fill += np.where(u[bad] >= 0, ub[np.maximum(u[bad], 0)], 0.0)
                if self.item_bias_ is not None:
                    ib = np.asarray(self.item_bias_)
                    fill += np.where(i[bad] >= 0, ib[np.maximum(i[bad], 0)], 0.0)
                p[bad] = fill
            else:
                p[bad] = np.nan
        return float(p[0]) if (scalar_u and scalar_i) else p

    def topN(self, user, n=10, include=None, exclude=None, output_score=False):
        """Top-N highest-predicted items for an existing user
        (reference: /root/reference/cmfrec/__init__.py:1355)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        u, _ = self._map_ids(user, self.user_mapping_, "user")
        a_vec = self._xA[int(u)]
        a_bias = float(self.user_bias_[int(u)]) if self.user_bias_ is not None else 0.0
        return self._topN_vec(a_vec, a_bias, n, include, exclude, output_score)

    def _topN_vec(self, a_vec, a_bias, n, include, exclude, output_score):
        if include is not None:
            include, _ = self._map_ids(include, self.item_mapping_, "item")
            include = np.atleast_1d(include)
        if exclude is not None:
            exclude, _ = self._map_ids(exclude, self.item_mapping_, "item")
            exclude = np.atleast_1d(exclude)
        B, ib = self._xB, self.item_bias_
        # include_all_X=False: items present only in the side info (rows of
        # I beyond X's columns) are excluded from recommendation
        # (/root/reference/cmfrec/__init__.py:2759 effect (a); ignored
        # under NA_as_zero, where every column counts as observed).
        lim = getattr(self, "_n_orig", None)
        if (not getattr(self, "include_all_X", True)
                and not getattr(self, "NA_as_zero", False)
                and lim is not None and lim < B.shape[0]):
            if include is not None and (include >= lim).any():
                raise ValueError(
                    "include= contains items absent from X; refit with "
                    "include_all_X=True to recommend side-info-only items"
                )
            if exclude is not None:
                # side-only items are already unrecommendable; keep only
                # in-range ids so the masked scatter stays in bounds
                # (negative ids would wrap Python-style)
                exclude = exclude[(exclude >= 0) & (exclude < lim)]
                if exclude.size == 0:
                    exclude = None
            B = B[:lim]
            ib = None if ib is None else ib[:lim]
        idx, scores = predict_ops.topn(
            a_vec, B, n, ib, self.glob_mean_, a_bias,
            include, exclude,
        )
        items = self._unmap_items(idx)
        return (items, scores) if output_score else items

    # ------------------------------------------------------------------ #
    # model-matrix utilities                                              #
    # ------------------------------------------------------------------ #

    def swap_users_and_items(self, precompute=True):
        """Return a clone with users and items exchanged
        (reference: /root/reference/cmfrec/__init__.py:2165)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        import copy

        new = copy.deepcopy(self)
        new.A_, new.B_ = self.B_, self.A_
        new.C_, new.D_ = self.D_, self.C_
        new.Ai_, new.Bi_ = self.Bi_, self.Ai_
        new.Cb_ = getattr(self, "Db_", None)
        new.Db_ = getattr(self, "Cb_", None)
        new.user_bias_, new.item_bias_ = self.item_bias_, self.user_bias_
        new.user_mapping_, new.item_mapping_ = (
            self.item_mapping_,
            self.user_mapping_,
        )
        # pre-expansion X dims swap with the axes (include_all_X gate)
        new._m_orig = getattr(self, "_n_orig", None)
        new._n_orig = getattr(self, "_m_orig", None)
        new.U_colmeans_, new.I_colmeans_ = self.I_colmeans_, self.U_colmeans_
        for a, b in (("k_user", "k_item"), ("w_user", "w_item"),
                     ("user_bias", "item_bias"), ("NA_as_zero_user", "NA_as_zero_item"),
                     ("nonneg_C", "nonneg_D"), ("center_U", "center_I")):
            if hasattr(new, a) and hasattr(new, b):
                va, vb = getattr(self, a), getattr(self, b)
                setattr(new, a, vb)
                setattr(new, b, va)
        new._precomputed = {}
        if precompute and hasattr(new, "force_precompute_for_predictions"):
            try:
                new.force_precompute_for_predictions()
            except Exception:
                pass
        return new

    def drop_nonessential_matrices(self, drop_precomputed=True):
        """Free everything not needed for NEW-user factor calculation
        (factors_warm/factors_cold/factors_multiple/topN_warm/topN_cold),
        matching the reference's production-memory trim
        (/root/reference/cmfrec/__init__.py:2366-2440): drops the user-side
        matrices (A, Ai, D, user biases, user id mapping) and keeps the
        item-side ones.  `predict`/`topN`/`swap_users_and_items` stop
        working afterwards.  With drop_precomputed, also drops the
        less-used solve caches (TransBtBinvBt/TransCtCinvCt/BeTBeChol)."""
        if not self.is_fitted_:
            raise RuntimeError("Model is not fitted")
        from .cmf import CMF, CMF_implicit

        if not isinstance(self, (CMF, CMF_implicit)):
            raise ValueError(
                "Method is only applicable to 'CMF' and 'CMF_implicit'."
            )
        self._only_prediction_info = True
        self.user_mapping_ = np.array([], dtype=object)
        self.user_dict_ = {}
        self.item_dict_ = {}
        self.A_ = None
        self.Ai_ = None
        self.D_ = None
        self.user_bias_ = None
        self.I_colmeans_ = None
        if drop_precomputed:
            for key in ("TransBtBinvBt", "TransCtCinvCt", "BeTBeChol"):
                self._precomputed.pop(key, None)
        return self

    # ------------------------------------------------------------------ #
    # checkpointing (SURVEY.md §5.4 — the reference relies on pickle;    #
    # here model state is plain arrays so .npz round-trips losslessly)    #
    # ------------------------------------------------------------------ #

    _ARRAY_ATTRS = (
        "A_", "B_", "C_", "D_", "Ai_", "Bi_", "Am_", "Bm_",
        "C_bias_", "D_bias_", "Cb_", "Db_",
        "user_bias_", "item_bias_", "U_colmeans_", "I_colmeans_",
        "user_mapping_", "item_mapping_",
    )

    def save(self, path):
        """Serialize fitted state + hyperparameters to one .npz file."""
        import json

        arrays = {}
        for name in self._ARRAY_ATTRS:
            v = getattr(self, name, None)
            if v is not None:
                v = np.asarray(v)
                if v.dtype == object:  # string id mappings
                    v = v.astype(str)
                arrays[name] = v
        meta = {
            "class": self.__class__.__name__,
            "params": {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in self.get_params().items()
            },
            "glob_mean": float(getattr(self, "glob_mean_", 0.0)),
            "reindex": bool(getattr(self, "reindex_", False)),
            "is_fitted": bool(getattr(self, "is_fitted_", False)),
            "w_main_multiplier": float(
                getattr(self, "w_main_multiplier_", 1.0)
            ),
            "scaling_biasA": float(getattr(self, "scaling_biasA_", 0.0)),
            "scaling_biasB": float(getattr(self, "scaling_biasB_", 0.0)),
            # X's fit-time dims, pre side-info expansion (include_all_X)
            "m_orig": getattr(self, "_m_orig", None),
            "n_orig": getattr(self, "_n_orig", None),
        }
        np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
        return self

    @classmethod
    def load(cls, path):
        """Restore a model saved with .save()."""
        import json

        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        import cmfrec_tpu

        klass = getattr(cmfrec_tpu, meta["class"])
        model = klass(**meta["params"])
        model._reset()
        from ..config import resolve_dtype

        model.dtype_ = resolve_dtype(meta["params"].get("use_float", True))
        for name in cls._ARRAY_ATTRS:
            if name in data:
                setattr(model, name, data[name])
        model.glob_mean_ = meta["glob_mean"]
        model.reindex_ = meta["reindex"]
        model.is_fitted_ = meta["is_fitted"]
        model.w_main_multiplier_ = meta["w_main_multiplier"]
        model.scaling_biasA_ = float(meta.get("scaling_biasA", 0.0))
        model.scaling_biasB_ = float(meta.get("scaling_biasB", 0.0))
        if meta.get("m_orig") is not None:
            model._m_orig = int(meta["m_orig"])
        if meta.get("n_orig") is not None:
            model._n_orig = int(meta["n_orig"])
        return model
