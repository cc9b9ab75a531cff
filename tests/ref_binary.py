"""Build + ctypes driver for the REAL reference binary (libcmfrec).

The reference C core (/root/reference/src) builds into a shared library
with no Cython involved (/root/reference/CMakeLists.txt:165 target
`cmfrec`).  This module builds it on demand into `.refbuild/` (cached
across test runs) and exposes ctypes wrappers for
`fit_collective_explicit_als` / `fit_collective_implicit_als`
(/tmp path: include/cmfrec.h.in), so tests can assert trajectory
agreement between cmfrec_tpu and the actual reference binary on
identical data, identical inits, and matched hyperparameters — a much
stronger anchor than hand-written NumPy oracles.

Used by tests/test_ref_parity.py; every consumer must tolerate
`get_lib() is None` (missing toolchain / reference tree) by skipping.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

REF_DIR = "/root/reference"
BUILD_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".refbuild")

_lib = None
_tried = False

c_real = ct.c_double
c_int_t = ct.c_int32


def _find_blas_links(tmp):
    """The image ships libblas.so.3/liblapack.so.3 without the dev
    symlinks FindBLAS needs; create them in a scratch dir."""
    os.makedirs(tmp, exist_ok=True)
    found = False
    for name in ("blas", "lapack"):
        for d in ("/lib/x86_64-linux-gnu", "/usr/lib/x86_64-linux-gnu",
                  "/usr/lib"):
            src = os.path.join(d, f"lib{name}.so.3")
            if os.path.exists(src):
                dst = os.path.join(tmp, f"lib{name}.so")
                if not os.path.exists(dst):
                    os.symlink(src, dst)
                found = True
                break
    return found


def build_ref_lib() -> str | None:
    """Configure+build libcmfrec.so (double precision, 32-bit ints).
    Returns the .so path, or None when it cannot be built."""
    so = os.path.join(BUILD_DIR, "libcmfrec.so")
    if os.path.exists(so):
        return so
    if not os.path.isdir(os.path.join(REF_DIR, "src")):
        return None
    try:
        os.makedirs(BUILD_DIR, exist_ok=True)
        linkdir = os.path.join(BUILD_DIR, "_blaslinks")
        if not _find_blas_links(linkdir):
            return None
        subprocess.run(
            ["cmake", REF_DIR, "-DCMAKE_BUILD_TYPE=Release",
             f"-DCMAKE_LIBRARY_PATH={linkdir}"],
            cwd=BUILD_DIR, check=True, capture_output=True, timeout=300)
        subprocess.run(["make", "-j2"], cwd=BUILD_DIR, check=True,
                       capture_output=True, timeout=900)
    except (subprocess.SubprocessError, OSError):
        return None
    return so if os.path.exists(so) else None


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = build_ref_lib()
    if so is None:
        return None
    try:
        _lib = ct.CDLL(so)
    except OSError:
        _lib = None
    return _lib


def _ptr(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ct.POINTER(c_real))


def _iptr(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ct.POINTER(c_int_t))


def ref_fit_explicit_als(
    rows, cols, vals, m, n, *, k, lam, niter,
    A0, B0, C0=None, U=None, D0=None, II=None,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, w_item=1.0, w_implicit=0.5,
    use_cg=False, max_cg_steps=3, precondition_cg=False,
    finalize_chol=True,
    user_bias=True, item_bias=True, center=True, center_U=True,
    NA_as_zero=False, NA_as_zero_U=False,
    scale_lam=False, scale_lam_sideinfo=False, scale_bias_const=False,
    add_implicit_features=False, Ai0=None, Bi0=None,
    weights=None, lam_unique=None, l1_lam=0.0,
    nonneg=False, max_cd_steps=100,
    Xfull=None, U_sp=None,
):
    """fit_collective_explicit_als with reset_values=false: A/B (and C,
    Ai/Bi) start from the provided inits, biases start at zero — the
    exact analog of cmfrec_tpu's init= warm start.

    ``U_sp`` = (u_rows, u_cols, u_vals, m_u, p) exercises the SPARSE
    side-info path (U_row/U_col/U_sp in the C API); mutually exclusive
    with dense ``U``.

    ``Xfull`` (m×n, NaN = missing) exercises the reference's DENSE code
    path instead of the sparse one: pass ``rows=cols=vals=None`` and,
    when weighting, an (m, n) dense ``weights`` array.  Notably the
    dense path does NOT have the sparse path's CSC weight-misalignment
    defect (collective.c:8642), so weighted fits can be pinned
    positively against the binary through it."""
    lib = get_lib()
    assert lib is not None
    width_A = k_user + k + k_main
    width_B = k_item + k + k_main
    if U_sp is not None:
        assert U is None
        u_rows, u_cols, u_vals, m_u, p = U_sp
        u_rows = np.ascontiguousarray(u_rows, np.int32)
        u_cols = np.ascontiguousarray(u_cols, np.int32)
        u_vals = np.ascontiguousarray(u_vals, np.float64)
        nnz_U = u_vals.size
    else:
        u_rows = u_cols = u_vals = None
        nnz_U = 0
        p = 0 if U is None else U.shape[1]
        m_u = 0 if U is None else U.shape[0]
    A = np.ascontiguousarray(np.zeros((max(m, m_u), width_A)), np.float64)
    A[: A0.shape[0], :] = A0
    n_b = max(n, 0 if II is None else II.shape[0])
    B = np.ascontiguousarray(np.zeros((n_b, width_B)), np.float64)
    B[: B0.shape[0], :] = B0
    biasA = np.zeros(max(m, m_u)) if user_bias else None
    biasB = np.zeros(n_b) if item_bias else None
    C = None
    if U is not None or U_sp is not None:
        C = np.ascontiguousarray(np.asarray(C0, np.float64)).copy()
        assert C.shape == (p, k_user + k)
    q = 0 if II is None else II.shape[1]
    n_i = 0 if II is None else II.shape[0]
    D = None
    if II is not None:
        D = np.ascontiguousarray(np.asarray(D0, np.float64)).copy()
        assert D.shape == (q, k_item + k)
    Ai = Bi = None
    if add_implicit_features:
        Ai = np.ascontiguousarray(np.asarray(Ai0, np.float64)).copy()
        Bi = np.ascontiguousarray(np.asarray(Bi0, np.float64)).copy()
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    Icont = None if II is None else np.ascontiguousarray(II, np.float64)
    U_colmeans = (np.zeros(p)
                  if ((U is not None or U_sp is not None) and center_U)
                  else None)
    I_colmeans = (np.zeros(q) if (II is not None and center_U) else None)
    if Xfull is not None:
        assert rows is None and cols is None and vals is None
        Xf = np.ascontiguousarray(Xfull, np.float64).copy()
        assert Xf.shape == (m, n)
        ixA = ixB = X = None
        nnz = 0
    else:
        Xf = None
        ixA = np.ascontiguousarray(rows, np.int32)
        ixB = np.ascontiguousarray(cols, np.int32)
        X = np.ascontiguousarray(vals, np.float64)
        nnz = X.size
    W = None if weights is None else np.ascontiguousarray(weights, np.float64)
    lam_u = (None if lam_unique is None
             else np.ascontiguousarray(lam_unique, np.float64))
    glob_mean = c_real(0.0)
    scaling_biasA = c_real(0.0)
    scaling_biasB = c_real(0.0)

    fn = lib.fit_collective_explicit_als
    fn.restype = c_int_t
    ret = fn(
        _ptr(biasA), _ptr(biasB),
        _ptr(A), _ptr(B),
        _ptr(C), _ptr(D),
        _ptr(Ai), _ptr(Bi),
        ct.c_bool(add_implicit_features),
        ct.c_bool(False), c_int_t(1),       # reset_values, seed
        ct.byref(glob_mean),
        _ptr(U_colmeans), _ptr(I_colmeans),
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(ixA), _iptr(ixB), _ptr(X), ct.c_size_t(nnz),
        _ptr(Xf),
        _ptr(W),
        ct.c_bool(user_bias), ct.c_bool(item_bias), ct.c_bool(center),
        c_real(lam), _ptr(lam_u),
        c_real(l1_lam), None,
        ct.c_bool(scale_lam), ct.c_bool(scale_lam_sideinfo),
        ct.c_bool(scale_bias_const),
        ct.byref(scaling_biasA), ct.byref(scaling_biasB),
        _ptr(Ucont), c_int_t(m_u), c_int_t(p),
        _ptr(Icont), c_int_t(n_i), c_int_t(q),
        _iptr(u_rows), _iptr(u_cols), _ptr(u_vals), ct.c_size_t(nnz_U),
        None, None, None, ct.c_size_t(0),   # I sparse
        ct.c_bool(NA_as_zero), ct.c_bool(NA_as_zero_U), ct.c_bool(False),
        c_int_t(k_main), c_int_t(k_user), c_int_t(k_item),
        c_real(w_main), c_real(w_user), c_real(w_item), c_real(w_implicit),
        c_int_t(niter), ct.c_int(1),        # niter, nthreads
        ct.c_bool(False), ct.c_bool(True),  # verbose, handle_interrupt
        ct.c_bool(use_cg), c_int_t(max_cg_steps),
        ct.c_bool(precondition_cg), ct.c_bool(finalize_chol),
        ct.c_bool(nonneg), c_int_t(max_cd_steps),
        ct.c_bool(False), ct.c_bool(False),  # nonneg_C, nonneg_D
        ct.c_bool(False),                    # precompute_for_predictions
        ct.c_bool(True),                     # include_all_X
        None, None, None, None, None, None, None, None, None,
    )
    assert ret == 0, f"reference fit_collective_explicit_als returned {ret}"
    return {
        "A": A[:, :], "B": B, "C": C, "D": D, "Ai": Ai, "Bi": Bi,
        "biasA": biasA, "biasB": biasB,
        "glob_mean": float(glob_mean.value),
        "scaling_biasA": float(scaling_biasA.value),
        "scaling_biasB": float(scaling_biasB.value),
        "U_colmeans": U_colmeans, "I_colmeans": I_colmeans,
    }


def ref_fit_implicit_als(
    rows, cols, vals, m, n, *, k, lam, niter, alpha,
    A0, B0, C0=None, U=None, D0=None, II=None,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, w_item=1.0, center_U=True,
    use_cg=False, max_cg_steps=3, precondition_cg=False,
    finalize_chol=False,
    apply_log_transf=False, adjust_weight=False,
    l1_lam=0.0, nonneg=False, max_cd_steps=100,
):
    lib = get_lib()
    assert lib is not None
    width_A = k_user + k + k_main
    width_B = k_item + k + k_main
    p = 0 if U is None else U.shape[1]
    m_u = 0 if U is None else U.shape[0]
    A = np.ascontiguousarray(np.zeros((max(m, m_u), width_A)), np.float64)
    A[: A0.shape[0], :] = A0
    q = 0 if II is None else II.shape[1]
    n_i = 0 if II is None else II.shape[0]
    B = np.ascontiguousarray(np.zeros((max(n, n_i), width_B)), np.float64)
    B[: B0.shape[0], :] = B0
    C = None
    if U is not None:
        C = np.ascontiguousarray(np.asarray(C0, np.float64)).copy()
        assert C.shape == (p, k_user + k)
    D = None
    if II is not None:
        D = np.ascontiguousarray(np.asarray(D0, np.float64)).copy()
        assert D.shape == (q, k_item + k)
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    Icont = None if II is None else np.ascontiguousarray(II, np.float64)
    U_colmeans = (np.zeros(p) if (U is not None and center_U) else None)
    I_colmeans = (np.zeros(q) if (II is not None and center_U) else None)
    X_row = np.ascontiguousarray(rows, np.int32)
    X_col = np.ascontiguousarray(cols, np.int32)
    # the C implicit path scales X by alpha IN PLACE via a copy? no — it
    # multiplies the caller's array; pass a copy to stay side-effect free
    X = np.ascontiguousarray(vals, np.float64).copy()
    w_main_multiplier = c_real(1.0)

    fn = lib.fit_collective_implicit_als
    fn.restype = c_int_t
    ret = fn(
        _ptr(A), _ptr(B),
        _ptr(C), _ptr(D),
        ct.c_bool(False), c_int_t(1),       # reset_values, seed
        _ptr(U_colmeans), _ptr(I_colmeans),
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(X_row), _iptr(X_col), _ptr(X), ct.c_size_t(X.size),
        c_real(lam), None,
        c_real(l1_lam), None,
        _ptr(Ucont), c_int_t(m_u), c_int_t(p),
        _ptr(Icont), c_int_t(n_i), c_int_t(q),
        None, None, None, ct.c_size_t(0),   # U sparse
        None, None, None, ct.c_size_t(0),   # I sparse
        ct.c_bool(False), ct.c_bool(False),  # NA_as_zero_U/I
        c_int_t(k_main), c_int_t(k_user), c_int_t(k_item),
        c_real(w_main), c_real(w_user), c_real(w_item),
        ct.byref(w_main_multiplier),
        c_real(alpha), ct.c_bool(adjust_weight), ct.c_bool(apply_log_transf),
        c_int_t(niter), ct.c_int(1),
        ct.c_bool(False), ct.c_bool(True),
        ct.c_bool(use_cg), c_int_t(max_cg_steps),
        ct.c_bool(precondition_cg), ct.c_bool(finalize_chol),
        ct.c_bool(nonneg), c_int_t(max_cd_steps),
        ct.c_bool(False), ct.c_bool(False),
        ct.c_bool(False),                    # precompute_for_predictions
        None, None, None, None,
    )
    assert ret == 0, f"reference fit_collective_implicit_als returned {ret}"
    return {"A": A, "B": B, "C": C, "D": D,
            "U_colmeans": U_colmeans, "I_colmeans": I_colmeans,
            "w_main_multiplier": float(w_main_multiplier.value)}


def ref_factors_collective_explicit_single(
    *, k, lam, B, xa, x_col, n,
    C=None, u_vec=None, U_colmeans=None,
    biasB=None, glob_mean=0.0, user_bias=False,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, w_implicit=0.5,
    Bi=None, add_implicit_features=False,
    weight=None, NA_as_zero_X=False, NA_as_zero_U=False,
    scale_lam=False, scale_lam_sideinfo=False, nonneg=False,
    lam_unique=None, l1_lam=0.0,
):
    """collective_factors_warm/cold through the exported single-row entry
    (/root/reference/include/cmfrec.h.in:1100).  All precomputed-cache
    pointers are NULL so the binary assembles the system from scratch."""
    lib = get_lib()
    assert lib is not None
    width = k_user + k + k_main
    a_vec = np.zeros(width)
    a_bias = c_real(0.0)
    p = 0 if u_vec is None else u_vec.shape[0]
    Ccont = None if C is None else np.ascontiguousarray(C, np.float64)
    ucont = None if u_vec is None else np.ascontiguousarray(u_vec, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    Xa = np.ascontiguousarray(xa, np.float64)
    Xcol = np.ascontiguousarray(x_col, np.int32)
    Bcont = np.ascontiguousarray(B, np.float64)
    Bicont = None if Bi is None else np.ascontiguousarray(Bi, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    W = None if weight is None else np.ascontiguousarray(weight, np.float64)
    lam_u = (None if lam_unique is None
             else np.ascontiguousarray(lam_unique, np.float64))

    fn = lib.factors_collective_explicit_single
    fn.restype = c_int_t
    ret = fn(
        _ptr(a_vec), ct.byref(a_bias) if user_bias else None,
        _ptr(ucont), c_int_t(p),
        None, None, ct.c_size_t(0),         # u_vec sparse
        None, c_int_t(0),                   # u_bin
        ct.c_bool(NA_as_zero_U), ct.c_bool(NA_as_zero_X),
        ct.c_bool(nonneg),
        _ptr(Ccont), None,                  # C, Cb
        c_real(glob_mean), _ptr(bb),
        _ptr(um),
        _ptr(Xa), _iptr(Xcol), ct.c_size_t(Xa.size),
        None, c_int_t(n),                   # Xa_dense, n
        _ptr(W),
        _ptr(Bcont),
        _ptr(Bicont), ct.c_bool(add_implicit_features),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), _ptr(lam_u),
        c_real(l1_lam), None,
        ct.c_bool(scale_lam), ct.c_bool(scale_lam_sideinfo),
        ct.c_bool(False), c_real(0.0),      # scale_bias_const, scaling_biasA
        c_real(w_main), c_real(w_user), c_real(w_implicit),
        c_int_t(n), ct.c_bool(True),        # n_max, include_all_X
        None, None, None, None, None, None, None, None, None,
    )
    assert ret == 0, f"factors_collective_explicit_single returned {ret}"
    return a_vec, float(a_bias.value)


def ref_fit_most_popular(
    rows, cols, vals, m, n, *, lam_user=0.0, lam_item=0.0,
    scale_lam=False, scale_bias_const=False, alpha=1.0, weights=None,
    implicit=False, adjust_weight=False, apply_log_transf=False,
    nonneg=False, center=True, NA_as_zero=False,
):
    """fit_most_popular (/root/reference/include/cmfrec.h.in:1538).
    Note: the C entry has no 'center' flag — the explicit path always
    centers; callers wanting center=False handle it outside."""
    lib = get_lib()
    assert lib is not None
    biasA = np.zeros(m)  # the built .so dereferences biasA even when the
    # caller only wants item biases — NULL segfaults
    biasB = np.zeros(n)
    glob_mean = c_real(0.0)
    w_main_multiplier = c_real(1.0)
    X_row = np.ascontiguousarray(rows, np.int32)
    X_col = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64).copy()
    W = None if weights is None else np.ascontiguousarray(weights, np.float64)

    fn = lib.fit_most_popular
    fn.restype = c_int_t
    ret = fn(
        _ptr(biasA), _ptr(biasB),
        ct.byref(glob_mean),
        c_real(lam_user), c_real(lam_item),
        ct.c_bool(scale_lam), ct.c_bool(scale_bias_const),
        c_real(alpha),
        c_int_t(m), c_int_t(n),
        _iptr(X_row), _iptr(X_col), _ptr(X), ct.c_size_t(X.size),
        None,                               # Xfull
        _ptr(W),
        ct.c_bool(implicit), ct.c_bool(adjust_weight),
        ct.c_bool(apply_log_transf),
        ct.c_bool(nonneg), ct.c_bool(NA_as_zero),  # (common.c:5383)
        ct.byref(w_main_multiplier),
        ct.c_int(1),
    )
    assert ret == 0, f"fit_most_popular returned {ret}"
    return {"biasA": biasA, "biasB": biasB,
            "glob_mean": float(glob_mean.value),
            "w_main_multiplier": float(w_main_multiplier.value)}


def ref_factors_offsets_explicit_single(
    *, k, lam, Bm, xa, x_col, n,
    C=None, u_vec=None, C_bias=None,
    biasB=None, glob_mean=0.0, with_bias=False,
    k_sec=0, k_main=0, w_user=1.0,
    weight=None, lam_unique=None, exact=False,
):
    """factors_offsets_explicit_single (cmfrec.h.in:2039) →
    offsets_factors_warm (offsets.c:578).  Returns the raw offset vector
    a_vec, the combined factor output_a (Bm-space), and the bias."""
    lib = get_lib()
    assert lib is not None
    # the binary writes k_sec+k+k_main entries into a_vec
    # (offsets.c:673/:717/:720) and, in the k_sec==0 branch, fills
    # output_a through offsets_factors_cold at the same width
    # (offsets.c:734) — allocate BOTH at full width or k_sec>0 calls
    # corrupt the heap
    width = k_sec + k + k_main
    a_vec = np.zeros(max(width, 1))
    output_a = np.zeros(max(width, 1))
    a_bias = c_real(0.0)
    p = 0 if u_vec is None else u_vec.shape[0]
    Ccont = None if C is None else np.ascontiguousarray(C, np.float64)
    Cb = None if C_bias is None else np.ascontiguousarray(C_bias, np.float64)
    ucont = None if u_vec is None else np.ascontiguousarray(u_vec, np.float64)
    Xa = np.ascontiguousarray(xa, np.float64)
    Xcol = np.ascontiguousarray(x_col, np.int32)
    Bcont = np.ascontiguousarray(Bm, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    W = None if weight is None else np.ascontiguousarray(weight, np.float64)
    lam_u = (None if lam_unique is None
             else np.ascontiguousarray(lam_unique, np.float64))

    fn = lib.factors_offsets_explicit_single
    fn.restype = c_int_t
    ret = fn(
        _ptr(a_vec), ct.byref(a_bias) if with_bias else None,
        _ptr(output_a),
        _ptr(ucont), c_int_t(p),
        None, None, ct.c_size_t(0),        # u_vec sparse
        _ptr(Xa), _iptr(Xcol), ct.c_size_t(Xa.size),
        None, c_int_t(n),                  # Xa_dense, n
        _ptr(W),
        _ptr(Bcont), _ptr(Ccont),
        _ptr(Cb),
        c_real(glob_mean), _ptr(bb),
        c_int_t(k), c_int_t(k_sec), c_int_t(k_main),
        c_real(w_user),
        c_real(lam), _ptr(lam_u),
        ct.c_bool(exact),
        None, None,                        # precomputed TransBtBinvBt, BtB
        None,                              # Bm_plus_bias
    )
    assert ret == 0, f"factors_offsets_explicit_single returned {ret}"
    return {"a_vec": a_vec, "output_a": output_a,
            "bias": float(a_bias.value)}


def ref_fit_offsets_explicit_als(
    rows, cols, vals, m, n, *, k, lam, niter,
    A0, B0, U=None, II=None, add_intercepts=True,
    use_cg=False, max_cg_steps=3, finalize_chol=False,
    user_bias=True, item_bias=True, center=True,
):
    """fit_offsets_explicit_als (/root/reference/include/cmfrec.h.in:1946)
    with reset_values=false: the inner Am/Bm ALS starts from A0/B0.
    NOTE: pass U/II already centered if comparing against cmfrec_tpu's
    regression, which centers side columns first."""
    lib = get_lib()
    assert lib is not None
    A = np.ascontiguousarray(np.asarray(A0, np.float64)).copy()
    B = np.ascontiguousarray(np.asarray(B0, np.float64)).copy()
    p = 0 if U is None else U.shape[1]
    q = 0 if II is None else II.shape[1]
    C = np.zeros((p, k)) if U is not None else None
    C_bias = np.zeros(k) if (U is not None and add_intercepts) else None
    D = np.zeros((q, k)) if II is not None else None
    D_bias = np.zeros(k) if (II is not None and add_intercepts) else None
    biasA = np.zeros(m) if user_bias else None
    biasB = np.zeros(n) if item_bias else None
    Am = np.zeros((m, k))
    Bm = np.zeros((n, k))
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    Icont = None if II is None else np.ascontiguousarray(II, np.float64)
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64)
    glob_mean = c_real(0.0)

    fn = lib.fit_offsets_explicit_als
    fn.restype = c_int_t
    ret = fn(
        _ptr(biasA), _ptr(biasB),
        _ptr(A), _ptr(B),
        _ptr(C), _ptr(C_bias),
        _ptr(D), _ptr(D_bias),
        ct.c_bool(False), c_int_t(1),       # reset_values, seed
        ct.byref(glob_mean),
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(ixA), _iptr(ixB), _ptr(X), ct.c_size_t(X.size),
        None,                               # Xfull
        None,                               # weight
        ct.c_bool(user_bias), ct.c_bool(item_bias), ct.c_bool(center),
        ct.c_bool(add_intercepts),
        c_real(lam),
        _ptr(Ucont), c_int_t(p),
        _ptr(Icont), c_int_t(q),
        ct.c_bool(False),                   # NA_as_zero_X
        c_int_t(niter), ct.c_int(1),
        ct.c_bool(use_cg), c_int_t(max_cg_steps),
        ct.c_bool(False), ct.c_bool(finalize_chol),
        ct.c_bool(False), ct.c_bool(True),  # verbose, handle_interrupt
        ct.c_bool(False),                   # precompute_for_predictions
        _ptr(Am), _ptr(Bm),
        None, None, None,
    )
    assert ret == 0, f"fit_offsets_explicit_als returned {ret}"
    return {"A": A, "B": B, "C": C, "C_bias": C_bias, "D": D,
            "D_bias": D_bias, "biasA": biasA, "biasB": biasB,
            "Am": Am, "Bm": Bm, "glob_mean": float(glob_mean.value)}


def ref_fit_offsets_implicit_als(
    rows, cols, vals, m, n, *, k, lam, niter, alpha=1.0,
    A0, B0, U=None, II=None, add_intercepts=True,
    apply_log_transf=False,
    use_cg=False, max_cg_steps=3, finalize_chol=False,
):
    """fit_offsets_implicit_als (/root/reference/src/offsets.c:2221)
    with reset_values=false: the inner WRMF Am/Bm ALS starts from A0/B0,
    then the GELSD attribute regression recovers C/D and the offsets.
    Like the explicit variant, pass U/II pre-centered."""
    lib = get_lib()
    assert lib is not None
    A = np.ascontiguousarray(np.asarray(A0, np.float64)).copy()
    B = np.ascontiguousarray(np.asarray(B0, np.float64)).copy()
    p = 0 if U is None else U.shape[1]
    q = 0 if II is None else II.shape[1]
    C = np.zeros((p, k)) if U is not None else None
    C_bias = np.zeros(k) if (U is not None and add_intercepts) else None
    D = np.zeros((q, k)) if II is not None else None
    D_bias = np.zeros(k) if (II is not None and add_intercepts) else None
    Am = np.zeros((m, k))
    Bm = np.zeros((n, k))
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    Icont = None if II is None else np.ascontiguousarray(II, np.float64)
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    # the implicit path scales X by alpha through the caller's pointer
    X = np.ascontiguousarray(vals, np.float64).copy()

    fn = lib.fit_offsets_implicit_als
    fn.restype = c_int_t
    ret = fn(
        _ptr(A), _ptr(B),
        _ptr(C), _ptr(C_bias),
        _ptr(D), _ptr(D_bias),
        ct.c_bool(False), c_int_t(1),       # reset_values, seed
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(ixA), _iptr(ixB), _ptr(X), ct.c_size_t(X.size),
        ct.c_bool(add_intercepts),
        c_real(lam),
        _ptr(Ucont), c_int_t(p),
        _ptr(Icont), c_int_t(q),
        c_real(alpha), ct.c_bool(apply_log_transf),
        c_int_t(niter), ct.c_int(1),
        ct.c_bool(use_cg), c_int_t(max_cg_steps),
        ct.c_bool(False), ct.c_bool(finalize_chol),
        ct.c_bool(False), ct.c_bool(True),  # verbose, handle_interrupt
        ct.c_bool(False),                   # precompute_for_predictions
        _ptr(Am), _ptr(Bm),
        None,
    )
    assert ret == 0, f"fit_offsets_implicit_als returned {ret}"
    return {"A": A, "B": B, "C": C, "C_bias": C_bias, "D": D,
            "D_bias": D_bias, "Am": Am, "Bm": Bm}


def ref_factors_collective_implicit_single(
    *, k, lam, B, xa, x_col, n, alpha,
    C=None, u_vec=None, U_colmeans=None,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, w_main_multiplier=1.0,
    apply_log_transf=False, l1_lam=0.0, nonneg=False,
):
    """collective_factors_warm_implicit through the exported single-row
    entry (/root/reference/include/cmfrec.h.in:1133); no caches passed."""
    lib = get_lib()
    assert lib is not None
    width = k_user + k + k_main
    a_vec = np.zeros(width)
    p = 0 if u_vec is None else u_vec.shape[0]
    Ccont = None if C is None else np.ascontiguousarray(C, np.float64)
    ucont = None if u_vec is None else np.ascontiguousarray(u_vec, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    Xa = np.ascontiguousarray(xa, np.float64)
    Xcol = np.ascontiguousarray(x_col, np.int32)
    Bcont = np.ascontiguousarray(B, np.float64)

    fn = lib.factors_collective_implicit_single
    fn.restype = c_int_t
    ret = fn(
        _ptr(a_vec),
        _ptr(ucont), c_int_t(p),
        None, None, ct.c_size_t(0),         # u_vec sparse
        ct.c_bool(False),                   # NA_as_zero_U
        ct.c_bool(nonneg),
        _ptr(um),
        _ptr(Bcont), c_int_t(n), _ptr(Ccont),
        _ptr(Xa), _iptr(Xcol), ct.c_size_t(Xa.size),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), c_real(l1_lam), c_real(alpha),
        c_real(w_main), c_real(w_user),
        c_real(w_main_multiplier),
        ct.c_bool(apply_log_transf),
        None, None, None, None,
    )
    assert ret == 0, f"factors_collective_implicit_single returned {ret}"
    return a_vec


def ref_topn_old_collective_explicit(
    *, a_vec, a_bias, B, biasB, glob_mean, k, n_top, n,
    k_user=0, k_item=0, k_main=0, include=None, exclude=None,
):
    """topN_old_collective_explicit on a caller-supplied factor vector."""
    lib = get_lib()
    assert lib is not None
    av = np.ascontiguousarray(a_vec, np.float64)
    Bc = np.ascontiguousarray(B, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    inc = (None if include is None
           else np.ascontiguousarray(include, np.int32))
    exc = (None if exclude is None
           else np.ascontiguousarray(exclude, np.int32))
    out_ix = np.zeros(n_top, np.int32)
    out_sc = np.zeros(n_top, np.float64)

    fn = lib.topN_old_collective_explicit
    fn.restype = c_int_t
    ret = fn(
        _ptr(av), c_real(a_bias),
        None, None, c_int_t(-1),            # A, biasA, row_index
        _ptr(Bc),
        _ptr(bb),
        c_real(glob_mean),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        _iptr(inc), c_int_t(0 if include is None else len(include)),
        _iptr(exc), c_int_t(0 if exclude is None else len(exclude)),
        _iptr(out_ix), _ptr(out_sc),
        c_int_t(n_top), c_int_t(n), c_int_t(n), ct.c_bool(True),
        ct.c_int(1),
    )
    assert ret == 0, f"topN_old_collective_explicit returned {ret}"
    return out_ix, out_sc


def ref_fit_lbfgs(
    rows, cols, vals, m, n, *, k, lam, maxiter=500,
    A0=None, B0=None, C0=None, U=None, U_bin=None, Cb0=None,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0,
    user_bias=True, item_bias=True, center=True, corr_pairs=5,
):
    """fit_collective_explicit_lbfgs with reset_values=false."""
    lib = get_lib()
    assert lib is not None
    width_A = k_user + k + k_main
    width_B = k_item + k + k_main
    p = 0 if U is None else U.shape[1]
    pbin = 0 if U_bin is None else U_bin.shape[1]
    A = np.ascontiguousarray(np.asarray(A0, np.float64)).copy()
    B = np.ascontiguousarray(np.asarray(B0, np.float64)).copy()
    assert A.shape == (m, width_A) and B.shape == (n, width_B)
    biasA = np.zeros(m) if user_bias else None
    biasB = np.zeros(n) if item_bias else None
    C = (np.ascontiguousarray(np.asarray(C0, np.float64)).copy()
         if U is not None else None)
    Cb = (np.ascontiguousarray(np.asarray(Cb0, np.float64)).copy()
          if U_bin is not None else None)
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    Ubcont = (None if U_bin is None
              else np.ascontiguousarray(U_bin, np.float64))
    U_colmeans = np.zeros(p) if U is not None else None
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64)
    glob_mean = c_real(0.0)
    niter_out = c_int_t(0)
    nfev_out = c_int_t(0)

    fn = lib.fit_collective_explicit_lbfgs
    fn.restype = c_int_t
    ret = fn(
        _ptr(biasA), _ptr(biasB),
        _ptr(A), _ptr(B),
        _ptr(C), _ptr(Cb),
        None, None,                         # D, Db
        ct.c_bool(False), c_int_t(1),       # reset_values, seed
        ct.byref(glob_mean),
        _ptr(U_colmeans), None,
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(ixA), _iptr(ixB), _ptr(X), ct.c_size_t(X.size),
        None,                               # Xfull
        None,                               # weight
        ct.c_bool(user_bias), ct.c_bool(item_bias), ct.c_bool(center),
        c_real(lam), None,
        _ptr(Ucont), c_int_t(m if U is not None else 0), c_int_t(p),
        None, c_int_t(0), c_int_t(0),       # II, n_i, q
        _ptr(Ubcont), c_int_t(m if U_bin is not None else 0), c_int_t(pbin),
        None, c_int_t(0), c_int_t(0),       # Ib
        None, None, None, ct.c_size_t(0),   # U sparse
        None, None, None, ct.c_size_t(0),   # I sparse
        c_int_t(k_main), c_int_t(k_user), c_int_t(k_item),
        c_real(w_main), c_real(w_user), c_real(1.0),
        c_int_t(corr_pairs), ct.c_size_t(maxiter),
        ct.c_int(1), ct.c_bool(False),      # nthreads, prefer_onepass
        ct.c_bool(False), c_int_t(100), ct.c_bool(True),
        ct.byref(niter_out), ct.byref(nfev_out),
        ct.c_bool(False),                   # precompute_for_predictions
        ct.c_bool(True),                    # include_all_X
        None, None, None, None, None, None,
    )
    assert ret == 0, f"fit_collective_explicit_lbfgs returned {ret}"
    return {"A": A, "B": B, "C": C, "Cb": Cb,
            "biasA": biasA, "biasB": biasB,
            "glob_mean": float(glob_mean.value),
            "U_colmeans": U_colmeans,
            "niter": int(niter_out.value), "nfev": int(nfev_out.value)}


def ref_fit_content_based(
    rows, cols, vals, m, n, *, k, lam, maxiter,
    C0, D0, U, II, add_intercepts=False,
    user_bias=False, item_bias=False, corr_pairs=5,
):
    """fit_content_based_lbfgs with reset_values=false, no ALS warm-up."""
    lib = get_lib()
    assert lib is not None
    p = U.shape[1]
    q = II.shape[1]
    C = np.ascontiguousarray(np.asarray(C0, np.float64)).copy()
    D = np.ascontiguousarray(np.asarray(D0, np.float64)).copy()
    C_bias = np.zeros(k) if add_intercepts else None
    D_bias = np.zeros(k) if add_intercepts else None
    biasA = np.zeros(m) if user_bias else None
    biasB = np.zeros(n) if item_bias else None
    Am = np.zeros((m, k))
    Bm = np.zeros((n, k))
    Ucont = np.ascontiguousarray(U, np.float64)
    Icont = np.ascontiguousarray(II, np.float64)
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64)
    glob_mean = c_real(0.0)
    niter_out = c_int_t(0)
    nfev_out = c_int_t(0)

    fn = lib.fit_content_based_lbfgs
    fn.restype = c_int_t
    ret = fn(
        _ptr(biasA), _ptr(biasB),
        _ptr(C), _ptr(C_bias),
        _ptr(D), _ptr(D_bias),
        ct.c_bool(False), ct.c_bool(False), c_int_t(1),
        ct.byref(glob_mean),
        c_int_t(m), c_int_t(n), c_int_t(k),
        _iptr(ixA), _iptr(ixB), _ptr(X), ct.c_size_t(X.size),
        None,                               # Xfull
        None,                               # weight
        ct.c_bool(user_bias), ct.c_bool(item_bias),
        ct.c_bool(add_intercepts),
        c_real(lam), None,
        _ptr(Ucont), c_int_t(p),
        _ptr(Icont), c_int_t(q),
        None, None, None, ct.c_size_t(0),
        None, None, None, ct.c_size_t(0),
        c_int_t(corr_pairs), ct.c_size_t(maxiter),
        ct.c_int(1), ct.c_bool(False),
        ct.c_bool(False), c_int_t(100), ct.c_bool(True),
        ct.byref(niter_out), ct.byref(nfev_out),
        _ptr(Am), _ptr(Bm),
    )
    assert ret == 0, f"fit_content_based_lbfgs returned {ret}"
    return {"C": C, "D": D, "C_bias": C_bias, "D_bias": D_bias,
            "biasA": biasA, "biasB": biasB, "Am": Am, "Bm": Bm,
            "glob_mean": float(glob_mean.value)}


def ref_impute_X(
    Xfull, *, k, lam, B, biasB=None, glob_mean=0.0, user_bias=False,
    C=None, U=None, U_colmeans=None,
    k_user=0, k_item=0, k_main=0, w_main=1.0, w_user=1.0,
):
    """impute_X_collective_explicit: fills the NaNs of Xfull IN PLACE
    using warm factors computed from each row's observed entries."""
    lib = get_lib()
    assert lib is not None
    Xf = np.ascontiguousarray(Xfull, np.float64).copy()
    m, n = Xf.shape
    p = 0 if U is None else U.shape[1]
    m_u = 0 if U is None else U.shape[0]
    Bcont = np.ascontiguousarray(B, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    Ccont = None if C is None else np.ascontiguousarray(C, np.float64)
    Ucont = None if U is None else np.ascontiguousarray(U, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))

    fn = lib.impute_X_collective_explicit
    fn.restype = c_int_t
    ret = fn(
        c_int_t(m), ct.c_bool(user_bias),
        _ptr(Ucont), c_int_t(m_u), c_int_t(p),
        ct.c_bool(False),                   # NA_as_zero_U
        ct.c_bool(False),                   # nonneg
        None, None, None, ct.c_size_t(0),   # U sparse
        None, None, None,                   # U csr
        None, c_int_t(0), c_int_t(0),       # Ub
        _ptr(Ccont), None,                  # C, Cb
        c_real(glob_mean), _ptr(bb),
        _ptr(um),
        _ptr(Xf), c_int_t(n),
        None,                               # weight
        _ptr(Bcont),
        None, ct.c_bool(False),             # Bi, add_implicit_features
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), None,
        c_real(0.0), None,
        ct.c_bool(False), ct.c_bool(False),
        ct.c_bool(False), c_real(0.0),
        c_real(w_main), c_real(w_user), c_real(0.5),
        c_int_t(n), ct.c_bool(True),
        None, None, None, None, None, None, None, None,
        ct.c_int(1),
    )
    assert ret == 0, f"impute_X_collective_explicit returned {ret}"
    return Xf


def ref_precompute_collective_explicit(
    *, B, n, C=None, Bi=None, biasB=None, glob_mean=0.0,
    U_colmeans=None, NA_as_zero_X=False, NA_as_zero_U=False,
    k, k_user=0, k_item=0, k_main=0, user_bias=False, nonneg=False,
    lam=1.0, lam_unique=None, scale_lam=False, scale_lam_sideinfo=False,
    scale_bias_const=False, scaling_biasA=0.0,
    w_main=1.0, w_user=1.0, w_implicit=0.5,
):
    """precompute_collective_explicit (collective.c:10209).  Returns every
    output buffer the binary fills; callers compare against our
    warm.build_precomputed caches.  Buffer dims follow the source: with
    user_bias the binary bumps k_main by one and swaps in B_plus_bias
    (collective.c:10296)."""
    lib = get_lib()
    assert lib is not None
    p = 0 if C is None else C.shape[0]
    kb = k + k_main + (1 if user_bias else 0)   # B-system width
    ke = k_user + kb                            # extended width
    Bc = np.ascontiguousarray(B, np.float64)
    Cc = None if C is None else np.ascontiguousarray(C, np.float64)
    Bic = None if Bi is None else np.ascontiguousarray(Bi, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    lam_u = (None if lam_unique is None
             else np.ascontiguousarray(lam_unique, np.float64))

    B_plus_bias = np.zeros((n, k_item + k + k_main + 1)) if user_bias else None
    BtB = np.zeros((kb, kb))
    add_if = Bi is not None
    TransBtBinvBt = (np.zeros((n, kb))
                     if (not nonneg and not add_if) else None)
    BtXbias = np.zeros(kb) if NA_as_zero_X else None
    BeTBeChol = (np.zeros((ke, ke))
                 if (not nonneg and (C is not None or add_if)) else None)
    BiTBi = np.zeros((k + k_main, k + k_main)) if add_if else None
    TransCtCinvCt = (np.zeros((p, k_user + k))
                     if (C is not None and not nonneg and not add_if)
                     else None)
    CtCw = np.zeros((k_user + k, k_user + k)) if C is not None else None
    CtUbias = (np.zeros(k_user + k)
               if (C is not None and NA_as_zero_U and um is not None)
               else None)

    fn = lib.precompute_collective_explicit
    fn.restype = c_int_t
    ret = fn(
        _ptr(Bc), c_int_t(n), c_int_t(n), ct.c_bool(True),
        _ptr(Cc), c_int_t(p),
        _ptr(Bic), ct.c_bool(add_if),
        _ptr(bb), c_real(glob_mean), ct.c_bool(NA_as_zero_X),
        _ptr(um), ct.c_bool(NA_as_zero_U),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        ct.c_bool(user_bias),
        ct.c_bool(nonneg),
        c_real(lam), _ptr(lam_u),
        ct.c_bool(scale_lam), ct.c_bool(scale_lam_sideinfo),
        ct.c_bool(scale_bias_const), c_real(scaling_biasA),
        c_real(w_main), c_real(w_user), c_real(w_implicit),
        _ptr(B_plus_bias),
        _ptr(BtB),
        _ptr(TransBtBinvBt),
        _ptr(BtXbias),
        _ptr(BeTBeChol),
        _ptr(BiTBi),
        _ptr(TransCtCinvCt),
        _ptr(CtCw),
        _ptr(CtUbias),
    )
    assert ret == 0, f"precompute_collective_explicit returned {ret}"
    return {
        "B_plus_bias": B_plus_bias, "BtB": BtB,
        "TransBtBinvBt": TransBtBinvBt, "BtXbias": BtXbias,
        "BeTBeChol": BeTBeChol, "BiTBi": BiTBi,
        "TransCtCinvCt": TransCtCinvCt, "CtCw": CtCw, "CtUbias": CtUbias,
    }


def ref_precompute_collective_implicit(
    *, B, n, C=None, U_colmeans=None, NA_as_zero_U=False,
    k, k_user=0, k_item=0, k_main=0, lam=1.0,
    w_main=1.0, w_user=1.0, w_main_multiplier=1.0, nonneg=False,
    extra_precision=False,
):
    """precompute_collective_implicit (collective.c:10487)."""
    lib = get_lib()
    assert lib is not None
    p = 0 if C is None else C.shape[0]
    kb = k + k_main
    ke = k_user + k + k_main
    Bc = np.ascontiguousarray(B, np.float64)
    Cc = None if C is None else np.ascontiguousarray(C, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    BtB = np.zeros((kb, kb))
    BeTBe = np.zeros((ke, ke)) if p else None
    BeTBeChol = np.zeros((ke, ke)) if (p and not nonneg) else None
    CtUbias = (np.zeros(k_user + k)
               if (p and NA_as_zero_U and um is not None) else None)

    fn = lib.precompute_collective_implicit
    fn.restype = c_int_t
    ret = fn(
        _ptr(Bc), c_int_t(n),
        _ptr(Cc), c_int_t(p),
        _ptr(um), ct.c_bool(NA_as_zero_U),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), c_real(w_main), c_real(w_user),
        c_real(w_main_multiplier),
        ct.c_bool(nonneg),
        ct.c_bool(extra_precision),
        _ptr(BtB),
        _ptr(BeTBe),
        _ptr(BeTBeChol),
        _ptr(CtUbias),
    )
    assert ret == 0, f"precompute_collective_implicit returned {ret}"
    return {"BtB": BtB, "BeTBe": BeTBe, "BeTBeChol": BeTBeChol,
            "CtUbias": CtUbias}


def ref_topn_old_collective_implicit(
    *, a_vec, B, k, n_top, n,
    k_user=0, k_item=0, k_main=0, include=None, exclude=None,
):
    """topN_old_collective_implicit (cmfrec.h:2117) on a caller-supplied
    factor vector — the implicit serving ranking path."""
    lib = get_lib()
    assert lib is not None
    av = np.ascontiguousarray(a_vec, np.float64)
    Bc = np.ascontiguousarray(B, np.float64)
    inc = (None if include is None
           else np.ascontiguousarray(include, np.int32))
    exc = (None if exclude is None
           else np.ascontiguousarray(exclude, np.int32))
    out_ix = np.zeros(n_top, np.int32)
    out_sc = np.zeros(n_top, np.float64)

    fn = lib.topN_old_collective_implicit
    fn.restype = c_int_t
    ret = fn(
        _ptr(av),
        None, c_int_t(-1),                  # A, row_index
        _ptr(Bc),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        _iptr(inc), c_int_t(0 if include is None else len(include)),
        _iptr(exc), c_int_t(0 if exclude is None else len(exclude)),
        _iptr(out_ix), _ptr(out_sc),
        c_int_t(n_top), c_int_t(n),
        ct.c_int(1),
    )
    assert ret == 0, f"topN_old_collective_implicit returned {ret}"
    return out_ix, out_sc


def ref_predict_X_old_collective_explicit(
    *, row, col, A, B, biasA=None, biasB=None, glob_mean=0.0,
    k, k_user=0, k_item=0, k_main=0, m, n_max,
):
    """predict_X_old_collective_explicit (collective.c:11797): fused
    factor dot + biases, with out-of-range ids falling back to
    glob_mean (+ whichever bias index IS valid)."""
    lib = get_lib()
    assert lib is not None
    rowc = np.ascontiguousarray(row, np.int32)
    colc = np.ascontiguousarray(col, np.int32)
    out = np.zeros(rowc.size)
    Ac = np.ascontiguousarray(A, np.float64)
    Bc = np.ascontiguousarray(B, np.float64)
    ba = None if biasA is None else np.ascontiguousarray(biasA, np.float64)
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    fn = lib.predict_X_old_collective_explicit
    fn.restype = c_int_t
    ret = fn(
        _iptr(rowc), _iptr(colc), _ptr(out), ct.c_size_t(out.size),
        _ptr(Ac), _ptr(ba),
        _ptr(Bc), _ptr(bb),
        c_real(glob_mean),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_int_t(m), c_int_t(n_max),
        ct.c_int(1),
    )
    assert ret == 0
    return out


def ref_factors_collective_explicit_multiple(
    *, m_new, rows, cols, vals, n, B, k, lam,
    U=None, C=None, U_colmeans=None,
    biasB=None, glob_mean=0.0, user_bias=False,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, weight=None,
):
    """factors_collective_explicit_multiple (collective.c:10865) with no
    precomputed inputs: the batch warm/cold path exactly as the Python
    wrapper drives it.  X passed as COO over the new rows."""
    lib = get_lib()
    assert lib is not None
    p = 0 if U is None else U.shape[1]
    m_u = 0 if U is None else U.shape[0]
    m_max = max(m_new, m_u)
    width = k_user + k + k_main
    A = np.zeros((m_max, width))
    biasA = np.zeros(m_max) if user_bias else None
    Uc = None if U is None else np.ascontiguousarray(U, np.float64)
    Cc = None if C is None else np.ascontiguousarray(C, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    bb = None if biasB is None else np.ascontiguousarray(biasB, np.float64)
    Bc = np.ascontiguousarray(B, np.float64)
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64)
    W = None if weight is None else np.ascontiguousarray(weight, np.float64)

    fn = lib.factors_collective_explicit_multiple
    fn.restype = c_int_t
    ret = fn(
        _ptr(A), _ptr(biasA), c_int_t(m_new),
        _ptr(Uc), c_int_t(m_u), c_int_t(p),
        ct.c_bool(False), ct.c_bool(False),   # NA_as_zero_U / _X
        ct.c_bool(False),                     # nonneg
        None, None, None, ct.c_size_t(0),     # U COO
        None, None, None,                     # U CSR
        None, c_int_t(0), c_int_t(0),         # Ub
        _ptr(Cc), None,                       # C, Cb
        c_real(glob_mean), _ptr(bb),
        _ptr(um),
        _ptr(X), _iptr(ixA), _iptr(ixB), ct.c_size_t(X.size),
        None, None, None,                     # X CSR
        None, c_int_t(n),                     # Xfull, n
        _ptr(W),
        _ptr(Bc),
        None, ct.c_bool(False),               # Bi, add_implicit_features
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), None,
        c_real(0.0), None,
        ct.c_bool(False), ct.c_bool(False),   # scale_lam / _sideinfo
        ct.c_bool(False), c_real(0.0),        # scale_bias_const
        c_real(w_main), c_real(w_user), c_real(0.5),
        c_int_t(n), ct.c_bool(True),          # n_max, include_all_X
        None, None, None, None, None, None, None, None, None,
        ct.c_int(1),
    )
    assert ret == 0, f"factors_collective_explicit_multiple returned {ret}"
    return {"A": A, "biasA": biasA}


def ref_factors_collective_implicit_multiple(
    *, m_new, rows, cols, vals, n, B, k, lam, alpha=1.0,
    U=None, C=None, U_colmeans=None,
    k_user=0, k_item=0, k_main=0,
    w_main=1.0, w_user=1.0, w_main_multiplier=1.0,
    apply_log_transf=False,
):
    """factors_collective_implicit_multiple (collective.c:11176), no
    precomputed inputs, X as COO over the new rows."""
    lib = get_lib()
    assert lib is not None
    p = 0 if U is None else U.shape[1]
    m_u = 0 if U is None else U.shape[0]
    m_max = max(m_new, m_u)
    width = k_user + k + k_main
    A = np.zeros((m_max, width))
    Uc = None if U is None else np.ascontiguousarray(U, np.float64)
    Cc = None if C is None else np.ascontiguousarray(C, np.float64)
    um = (None if U_colmeans is None
          else np.ascontiguousarray(U_colmeans, np.float64))
    Bc = np.ascontiguousarray(B, np.float64)
    ixA = np.ascontiguousarray(rows, np.int32)
    ixB = np.ascontiguousarray(cols, np.int32)
    X = np.ascontiguousarray(vals, np.float64)

    fn = lib.factors_collective_implicit_multiple
    fn.restype = c_int_t
    ret = fn(
        _ptr(A), c_int_t(m_new),
        _ptr(Uc), c_int_t(m_u), c_int_t(p),
        ct.c_bool(False),                     # NA_as_zero_U
        ct.c_bool(False),                     # nonneg
        None, None, None, ct.c_size_t(0),     # U COO
        None, None, None,                     # U CSR
        _ptr(X), _iptr(ixA), _iptr(ixB), ct.c_size_t(X.size),
        None, None, None,                     # X CSR
        _ptr(Bc), c_int_t(n),
        _ptr(Cc),
        _ptr(um),
        c_int_t(k), c_int_t(k_user), c_int_t(k_item), c_int_t(k_main),
        c_real(lam), c_real(0.0), c_real(alpha), c_real(w_main),
        c_real(w_user),
        c_real(w_main_multiplier),
        ct.c_bool(apply_log_transf),
        None, None, None, None,
        ct.c_int(1),
    )
    assert ret == 0, f"factors_collective_implicit_multiple returned {ret}"
    return A
