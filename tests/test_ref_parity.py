"""Head-to-head parity against the REAL reference binary (libcmfrec).

These tests build the reference C core with cmake (tests/ref_binary.py,
cached in .refbuild/) and drive `fit_collective_explicit_als` /
`fit_collective_implicit_als` over ctypes on identical data, identical
inits (reset_values=false), and matched hyperparameters — anchoring
cmfrec_tpu's trajectories to the actual reference implementation instead
of hand-written NumPy oracles.

Verified agreements (max |diff| over full factor matrices, f64):
  * explicit Cholesky, biases+centering, 3 iters ........ ~1e-13
  * explicit CG(3), bias-free, centering, 2 iters ....... ~1e-13
  * collective Cholesky (side U, k_user/k_main, w_user),
    biases+centering, 3 iters ........................... ~1e-15
  * implicit (WRMF) Cholesky, 3 iters ................... ~1e-13
  * explicit Chol: lam_unique (6-entry), NA_as_zero,
    add_implicit_features (Ai/Bi), nonneg CD (1 iter) .... ~1e-9..1e-5
  * implicit Chol: side info + k splits, log-transform +
    adjust_weight ........................................ ~1e-9
  * OMF (offsets) ALS: Am/Bm + GELSD attribute regression
    (C/C_bias/D) + offset residuals ...................... ~1e-6
  * single warm/cold factors, explicit (plain, side-info,
    weighted, scale_lam) and implicit (plain, side-info) . ~1e-8
  * topN ranking incl. include=/exclude= ................. exact
  * MostPopular two-sided (6 alternating passes) ......... ~1e-9
  * dense Xfull path, plain and WEIGHTED (the dense path
    lacks the sparse CSC weight defect, so weighted fits
    pin positively here), biases+centering ............... ~1e-9
  * OMF implicit (fit_offsets_implicit_als): inner WRMF
    Am/Bm + attribute regression ......................... ~1e-6

Documented divergences (each pinned by a test below):
  * explicit CG with biases: the reference's pre-update "restore the
    bias into the warm-start column" copy writes through the caller's
    factor pointer with the wrong leading stride, so the bias column of
    the CG warm start still holds the ONES left by the previous
    half-step (/root/reference/src/collective.c:8636-8641 area).  Ours
    warm-starts from the current bias.  A NumPy replica of the
    leftover-ones semantics matches the binary to 1e-14; the same
    replica with the clean warm start matches ours.
  * implicit CG: the reference's initial residual uses coefficient
    `-(coef-1)*Xa - coef` per observed entry
    (/root/reference/src/common.c:1938) where the WRMF normal equations
    give `(1+Xa) - coef*Xa`; the `+1` preference term became `-coef`.
    Consequence (asserted below): the reference's implicit CG does NOT
    converge to its own Cholesky solution even with 60 CG steps, while
    ours does.  We keep the convergent solver.
  * weighted sparse X: the reference's B half-step passes the raw
    COO-order weight array where CSC order is expected
    (/root/reference/src/collective.c:8642, inverted ternary — the A
    half-step at :8813 correctly uses weightR), so each column system
    reads other entries' weights.  A replica of the misaligned
    semantics matches the binary to 1e-15; the clean replica matches
    our engine.
"""

import numpy as np
import pytest

from .ref_binary import get_lib, ref_fit_explicit_als, ref_fit_implicit_als

pytestmark = [
    pytest.mark.skipif(
        get_lib() is None, reason="reference libcmfrec could not be built"),
    # the h2h program needs the cmake binary build and runs ~50 fits;
    # inner loop: pytest -m "not slow" (full suite at round end)
    pytest.mark.slow,
]


def _data(seed=0, m=30, n=20, density=0.4):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(m, n)) < density
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    return rng, rows, cols, vals, m, n


def test_explicit_chol_bias_center():
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data()
    k, lam = 4, 0.8
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        use_cg=False, user_bias=True, item_bias=True, center=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, use_cg=False,
        user_bias=True, item_bias=True, center=True)
    assert abs(ref["glob_mean"] - ours["glob_mean"]) < 1e-10
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_explicit_cg_biasfree():
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data()
    k, lam = 4, 0.8
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=2,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=True,
        dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=2,
        A0=A0, B0=B0, use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


def _cg_row(a, Bm, x, lam, steps):
    """Literal replica of the reference's truncated CG
    (/root/reference/src/common.c:1110-1190): skip below 1e-12, break
    below 1e-8 post-step."""
    a = a.copy()
    r = Bm.T @ (x - Bm @ a) - lam * a
    r_old = r @ r
    if r_old <= 1e-12:
        return a
    p = r.copy()
    for _ in range(steps):
        Ap = Bm.T @ (Bm @ p) + lam * p
        al = r_old / (p @ Ap)
        a += al * p
        r -= al * Ap
        r_new = r @ r
        if r_new <= 1e-8:
            break
        p = (r_new / r_old) * p + r
        r_old = r_new
    return a


def _explicit_cg_bias_replica(rows, cols, vals, m, n, k, lam, niter,
                              A0, B0, gm, leftover_ones):
    """NumPy replica of one CG fit with joint bias coordinates, with the
    bias column of the warm start either restored (ours) or left at the
    ONES of the previous half-step (the reference's effective
    semantics)."""
    vc = vals - gm
    bycol = [np.nonzero(cols == j)[0] for j in range(n)]
    byrow = [np.nonzero(rows == i)[0] for i in range(m)]
    A = np.column_stack([A0, np.zeros(m)])
    B = np.column_stack([B0, np.zeros(n)])
    first = True
    for _ in range(niter):
        Bw = B.copy()
        if leftover_ones and not first:
            Bw[:, k] = 1.0
        first = False
        Bn = np.zeros_like(B)
        for j, ix in enumerate(bycol):
            Opp = np.column_stack([A[rows[ix], :k], np.ones(len(ix))])
            Bn[j] = _cg_row(Bw[j], Opp, vc[ix] - A[rows[ix], k], lam, 3)
        B = Bn
        Aw = A.copy()
        if leftover_ones:
            Aw[:, k] = 1.0
        An = np.zeros_like(A)
        for i, ix in enumerate(byrow):
            Opp = np.column_stack([B[cols[ix], :k], np.ones(len(ix))])
            An[i] = _cg_row(Aw[i], Opp, vc[ix] - B[cols[ix], k], lam, 3)
        A = An
    return A, B


def test_explicit_cg_bias_quirk_documented():
    """Pins BOTH sides of the one explicit divergence: the leftover-ones
    replica == the reference binary, and the clean-warm-start replica ==
    our engine."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data()
    k, lam, niter = 4, 0.8, 2
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=niter,
        A0=A0, B0=B0, use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=True, item_bias=True, center=True)
    gm = ref["glob_mean"]

    Aq, Bq = _explicit_cg_bias_replica(
        rows, cols, vals, m, n, k, lam, niter, A0, B0, gm,
        leftover_ones=True)
    np.testing.assert_allclose(Aq[:, :k], ref["A"], atol=1e-10)
    np.testing.assert_allclose(Bq[:, :k], ref["B"], atol=1e-10)
    np.testing.assert_allclose(Aq[:, k], ref["biasA"], atol=1e-10)
    np.testing.assert_allclose(Bq[:, k], ref["biasB"], atol=1e-10)

    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=niter,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    Ac, Bc = _explicit_cg_bias_replica(
        rows, cols, vals, m, n, k, lam, niter, A0, B0, gm,
        leftover_ones=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), Ac[:, :k], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), Bc[:, :k], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), Ac[:, k],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), Bc[:, k],
                               atol=1e-9)


def test_collective_chol_side_info():
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(2)
    m, n, k, p = 25, 18, 4, 6
    k_user, k_item, k_main = 2, 0, 1
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k_user + k + k_main)) * 0.1
    B0 = rng.normal(size=(n, k_item + k + k_main)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(None, None, None, m, p, True, U),
        k_user=k_user, k_item=k_item, k_main=k_main,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U=U,
        k_user=k_user, k_item=k_item, k_main=k_main,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def _implicit_data():
    rng = np.random.default_rng(1)
    m, n, k = 25, 18, 4
    nnz = 150
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    key = rows.astype(np.int64) * n + cols
    _, uix = np.unique(key, return_index=True)
    rows, cols = rows[uix], cols[uix]
    vals = rng.uniform(1, 10, rows.size)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    return rows, cols, vals, m, n, k, A0, B0


def test_implicit_chol():
    from cmfrec_tpu.solvers.drivers import fit_implicit_als

    rows, cols, vals, m, n, k, A0, B0 = _implicit_data()
    lam, alpha = 0.9, 2.0
    ours = fit_implicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha, niter=3,
        use_cg=False, finalize_chol=False, dtype=np.float64,
        init={"A": A0, "B": B0})
    ref = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3, alpha=alpha,
        A0=A0, B0=B0, use_cg=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


def test_implicit_cg_divergence_documented():
    """Ours CG converges to the (shared) Cholesky fixed point; the
    reference's does not — its initial CG residual drops the `+1`
    preference term (common.c:1938, see module docstring)."""
    from cmfrec_tpu.solvers.drivers import fit_implicit_als

    rows, cols, vals, m, n, k, A0, B0 = _implicit_data()
    lam, alpha = 0.9, 2.0
    chol = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=1, alpha=alpha,
        A0=A0, B0=B0, use_cg=False)
    ours_cg = fit_implicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha, niter=1,
        use_cg=True, max_cg_steps=60, finalize_chol=False,
        dtype=np.float64, init={"A": A0, "B": B0})
    np.testing.assert_allclose(np.asarray(ours_cg["A"]), chol["A"],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ours_cg["B"]), chol["B"],
                               atol=1e-7)
    ref_cg = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=1, alpha=alpha,
        A0=A0, B0=B0, use_cg=True, max_cg_steps=60)
    assert np.abs(ref_cg["B"] - chol["B"]).max() > 1e-3


# --------------------------------------------------------------------- #
# Round-3 widening: the bench-critical and feature configs               #
# --------------------------------------------------------------------- #


def _weighted_replica(rows, cols, vals, wgt, m, n, k, lam, niter, A0, B0,
                      misaligned_B):
    """Literal weighted ALS (Chol, B then A).  With ``misaligned_B`` the B
    half-step reads the weight array in RAW COO order indexed by CSC
    position — the reference binary's effective semantics (see
    test_explicit_weighted_quirk_documented)."""
    csc_rank = np.empty(rows.size, np.int64)
    csc_rank[np.argsort(cols, kind="stable")] = np.arange(rows.size)
    wB = wgt[csc_rank] if misaligned_B else wgt
    A, B = A0.copy(), B0.copy()

    def solve(opp, x, w):
        G = opp.T @ (opp * w[:, None]) + lam * np.eye(opp.shape[1])
        return np.linalg.solve(G, opp.T @ (w * x))

    for _ in range(niter):
        for j in range(n):
            ix = np.nonzero(cols == j)[0]
            B[j] = solve(A[rows[ix]], vals[ix], wB[ix])
        for i in range(m):
            ix = np.nonzero(rows == i)[0]
            A[i] = solve(B[cols[ix]], vals[ix], wgt[ix])
    return A, B


def test_explicit_weighted_quirk_documented():
    """Weighted sparse X: the reference's B half-step passes the RAW
    COO-order weight array where CSC-ordered weights are expected
    (/root/reference/src/collective.c:8642 `(Xfull == NULL)?
    weight:weightC` — ternary inverted; the A half-step at :8813 correctly
    uses weightR), so each column system reads other entries' weights.
    Pins BOTH sides: the misaligned replica == the binary, and the clean
    replica == our engine (we do not copy the bug)."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=3)
    wgt = rng.uniform(0.5, 2.0, rows.size)
    k, lam, niter = 4, 0.3, 2
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=niter,
        A0=A0, B0=B0, use_cg=False, weights=wgt, finalize_chol=False,
        user_bias=False, item_bias=False, center=False)
    Aq, Bq = _weighted_replica(rows, cols, vals, wgt, m, n, k, lam, niter,
                               A0, B0, misaligned_B=True)
    np.testing.assert_allclose(Aq, ref["A"], atol=1e-10)
    np.testing.assert_allclose(Bq, ref["B"], atol=1e-10)

    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=niter,
        use_cg=False, user_bias=False, item_bias=False, center=False,
        weights=wgt, dtype=np.float64, init={"A": A0, "B": B0})
    Ac, Bc = _weighted_replica(rows, cols, vals, wgt, m, n, k, lam, niter,
                               A0, B0, misaligned_B=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), Ac, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), Bc, atol=1e-9)


def test_explicit_chol_lam_unique():
    """Six-entry lambda (user_bias, item_bias, A, B, C, D ordering)."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=4)
    k = 4
    lam6 = np.array([0.2, 0.4, 0.6, 0.9, 1.0, 1.0])
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam6, niter=3,
        use_cg=False, user_bias=True, item_bias=True, center=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=0.0, lam_unique=lam6, niter=3,
        A0=A0, B0=B0, use_cg=False,
        user_bias=True, item_bias=True, center=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_explicit_chol_na_as_zero():
    """NA_as_zero: unobserved entries count as zeros (bias-free)."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=5)
    k, lam = 4, 0.8
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        use_cg=False, user_bias=False, item_bias=False, center=False,
        NA_as_zero=True, dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, use_cg=False, NA_as_zero=True,
        user_bias=False, item_bias=False, center=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)

    # center=True: the mean is taken over ALL m*n cells (unobserved = 0)
    # and applied to unobserved cells through the rhs correction — the
    # full pipeline must still match the binary (common.c:3513)
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        use_cg=False, user_bias=False, item_bias=False, center=True,
        NA_as_zero=True, dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, use_cg=False, NA_as_zero=True,
        user_bias=False, item_bias=False, center=True)
    assert abs(ours["glob_mean"] - ref["glob_mean"]) < 1e-12
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


def test_collective_chol_implicit_features():
    """add_implicit_features (the reference's best-RMSE benchmark config):
    Ai/Bi trained alongside A/B."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=6)
    k, lam = 4, 0.7
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    Ai0 = rng.normal(size=(m, k)) * 0.1
    Bi0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        add_implicit_features=True, w_implicit=0.5,
        use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, dtype=np.float64,
        init={"A": A0, "B": B0, "Ai": Ai0, "Bi": Bi0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, use_cg=False, finalize_chol=False,
        add_implicit_features=True, Ai0=Ai0, Bi0=Bi0, w_implicit=0.5,
        user_bias=True, item_bias=True, center=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["Bi"]), ref["Bi"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["Ai"]), ref["Ai"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)


def test_explicit_chol_nonneg_cd():
    """Non-negative factors via coordinate descent.  Each half-step's NNLS
    problem is strictly convex (unique minimizer), so one iteration agrees
    to CD tolerance.  (Multi-iteration trajectories drift apart: CD stops
    at ~1e-8, and NNLS support switching amplifies that across ALS
    iterations — verified for the binary and for scipy.nnls alike.)"""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=7)
    k, lam = 3, 0.5
    A0 = np.abs(rng.normal(size=(m, k))) * 0.1
    B0 = np.abs(rng.normal(size=(n, k))) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=1,
        use_cg=False, user_bias=False, item_bias=False, center=True,
        nonneg=True, max_cd_steps=400, dtype=np.float64,
        init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=1,
        A0=A0, B0=B0, use_cg=False, nonneg=True, max_cd_steps=400,
        user_bias=False, item_bias=False, center=True)
    assert np.asarray(ours["A"]).min() >= 0 and ref["A"].min() >= 0
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-5)


def test_explicit_chol_l1_cd_vs_binary():
    """Elastic-net (l1_lambda > 0) half-steps via coordinate descent.
    Same protocol as the nonneg test: each half-step's lasso problem is
    strictly convex (ridge term), so one iteration pins to CD tolerance."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=9)
    k, lam, l1 = 3, 0.5, 0.3
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, l1_lambda=l1, niter=1,
        use_cg=False, user_bias=False, item_bias=False, center=True,
        max_cd_steps=400, dtype=np.float64,
        init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, l1_lam=l1, niter=1,
        A0=A0, B0=B0, use_cg=False, max_cd_steps=400,
        user_bias=False, item_bias=False, center=True)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-5)
    # l1 must actually sparsify OUR solution with exact zeros (and the
    # binary's, so the allclose above compares genuinely sparse factors)
    assert (np.asarray(ours["A"]) == 0).any()
    assert (ref["A"] == 0).any()


def test_implicit_chol_side_info():
    """Collective WRMF with dense user side info and k splits."""
    from cmfrec_tpu.solvers.collective import fit_collective_implicit_als

    rows, cols, vals, m, n, k, _, _ = _implicit_data()
    rng = np.random.default_rng(8)
    p, k_user, k_main = 5, 2, 1
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k_user + k + k_main)) * 0.1
    B0 = rng.normal(size=(n, k + k_main)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    lam, alpha = 0.9, 2.0
    ours = fit_collective_implicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha, niter=3,
        side_U=(None, None, None, m, p, True, U),
        k_user=k_user, k_main=k_main, w_user=0.6,
        use_cg=False, finalize_chol=False, center_U=True,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0})
    ref = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3, alpha=alpha,
        A0=A0, B0=B0, C0=C0, U=U, k_user=k_user, k_main=k_main,
        w_user=0.6, center_U=True, use_cg=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)


def test_implicit_chol_both_sides_vs_binary():
    """Two-sided collective WRMF: item side info (D) in the implicit
    model — the implicit D half-step was never binary-pinned before."""
    from cmfrec_tpu.solvers.collective import fit_collective_implicit_als

    rows, cols, vals, m, n, k, _, _ = _implicit_data()
    rng = np.random.default_rng(11)
    p, q, k_user, k_item = 5, 4, 2, 1
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    A0 = rng.normal(size=(m, k_user + k)) * 0.1
    B0 = rng.normal(size=(n, k_item + k)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    D0 = rng.normal(size=(q, k_item + k)) * 0.1
    lam, alpha = 0.9, 2.0
    ours = fit_collective_implicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha, niter=3,
        side_U=(None, None, None, m, p, True, U),
        side_I=(None, None, None, n, q, True, I),
        k_user=k_user, k_item=k_item, w_user=0.6, w_item=0.8,
        use_cg=False, finalize_chol=False, center_U=True, center_I=True,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0, "D": D0})
    ref = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3, alpha=alpha,
        A0=A0, B0=B0, C0=C0, U=U, D0=D0, II=I,
        k_user=k_user, k_item=k_item, w_user=0.6, w_item=0.8,
        center_U=True, use_cg=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["D"]), ref["D"], atol=1e-9)


def test_implicit_chol_log_transf_adjust_weight():
    """apply_log_transf + adjust_weight: the w_main multiplier becomes
    nnz/(m*n) and X is log-transformed before confidence weighting."""
    from cmfrec_tpu.solvers.drivers import fit_implicit_als

    rows, cols, vals, m, n, k, A0, B0 = _implicit_data()
    vals = vals + 1.0  # log-transform needs values > 1 to stay positive
    lam, alpha = 0.9, 2.0
    ours = fit_implicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, alpha=alpha, niter=3,
        use_cg=False, finalize_chol=False, apply_log_transf=True,
        adjust_weight=True, dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3, alpha=alpha,
        A0=A0, B0=B0, use_cg=False, apply_log_transf=True,
        adjust_weight=True)
    assert abs(ours.get("w_main_multiplier", ref["w_main_multiplier"])
               - ref["w_main_multiplier"]) < 1e-12
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


# --------------------------------------------------------------------- #
# Inference surface: warm/cold factors + MostPopular vs the binary       #
# --------------------------------------------------------------------- #


def test_factors_warm_single_vs_binary():
    """model.factors_warm == factors_collective_explicit_single on the
    same trained parameters: plain, with dense side info, and cold.
    Fit through the positional (non-reindexing) path so B_'s row order is
    the raw item-id space the binary indexes with."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_factors_collective_explicit_single

    rng = np.random.default_rng(11)
    m, n, p = 40, 25, 6
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    k, k_user, k_main, lam = 4, 2, 1, 0.7
    model = CMF(k=k, k_user=k_user, k_main=k_main, lambda_=lam,
                w_user=0.6, niter=4, use_cg=False, use_float=False,
                user_bias=True, item_bias=True).fit_triplets(
                    rows, cols, vals, m, n, U=U)

    sel = rows == 7
    xc, xv = cols[sel].astype(np.int64), vals[sel]
    a_ours, b_ours = model.factors_warm(
        X_col=xc, X_val=xv, U=U[7], return_bias=True)
    a_ref, b_ref = ref_factors_collective_explicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=xv, x_col=xc, n=n,
        C=np.asarray(model.C_, np.float64), u_vec=U[7],
        U_colmeans=model.U_colmeans_,
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=True,
        k_user=k_user, k_main=k_main, w_user=0.6)
    np.testing.assert_allclose(a_ours, a_ref, atol=1e-8)
    assert abs(b_ours - b_ref) < 1e-8

    # cold: side info only
    a_cold = model.factors_cold(U=U[7])
    a_refc, _ = ref_factors_collective_explicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=np.zeros(0), x_col=np.zeros(0, np.int64), n=n,
        C=np.asarray(model.C_, np.float64), u_vec=U[7],
        U_colmeans=model.U_colmeans_,
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=False,
        k_user=k_user, k_main=k_main, w_user=0.6)
    np.testing.assert_allclose(a_cold, a_refc, atol=1e-8)


def test_factors_warm_plain_vs_binary():
    """No side info: warm factors with bias, weights, and scale_lam."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_factors_collective_explicit_single

    rng = np.random.default_rng(12)
    m, n = 40, 25
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    k, lam = 5, 0.5
    for scale_lam in (False, True):
        model = CMF(k=k, lambda_=lam, niter=4, use_cg=False,
                    scale_lam=scale_lam, use_float=False,
                    user_bias=True, item_bias=True).fit_triplets(
                        rows, cols, vals, m, n)
        sel = rows == 3
        xc, xv = cols[sel].astype(np.int64), vals[sel]
        wv = rng.uniform(0.5, 2.0, xv.size)
        a_ours, b_ours = model.factors_warm(
            X_col=xc, X_val=xv, W=wv, return_bias=True)
        a_ref, b_ref = ref_factors_collective_explicit_single(
            k=k, lam=lam, B=np.asarray(model.B_, np.float64),
            xa=xv, x_col=xc, n=n, weight=wv,
            biasB=np.asarray(model.item_bias_, np.float64),
            glob_mean=model.glob_mean_, user_bias=True,
            scale_lam=scale_lam)
        np.testing.assert_allclose(a_ours, a_ref, atol=1e-8,
                                   err_msg=f"scale_lam={scale_lam}")
        assert abs(b_ours - b_ref) < 1e-8


def test_factors_implicit_features_vs_binary():
    """Warm AND cold single factors on an add_implicit_features model.
    Pins the r2-advisor fix: cold solves must EXCLUDE the Bi/BiTBi block
    (collective_factors_cold solves only against C, collective.c:3309)
    while warm solves include it."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_factors_collective_explicit_single

    rng = np.random.default_rng(13)
    m, n, p = 40, 25, 6
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    k, lam = 4, 0.7
    model = CMF(k=k, lambda_=lam, w_user=0.6, niter=4, use_cg=False,
                add_implicit_features=True, w_implicit=0.4,
                use_float=False, user_bias=True,
                item_bias=True).fit_triplets(rows, cols, vals, m, n, U=U)

    sel = rows == 7
    xc, xv = cols[sel].astype(np.int64), vals[sel]
    a_ours, b_ours = model.factors_warm(
        X_col=xc, X_val=xv, U=U[7], return_bias=True)
    a_ref, b_ref = ref_factors_collective_explicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=xv, x_col=xc, n=n,
        C=np.asarray(model.C_, np.float64), u_vec=U[7],
        U_colmeans=model.U_colmeans_,
        Bi=np.asarray(model.Bi_, np.float64), add_implicit_features=True,
        w_implicit=0.4,
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=True, w_user=0.6)
    np.testing.assert_allclose(a_ours, a_ref, atol=1e-8)
    assert abs(b_ours - b_ref) < 1e-8

    # cold: the Bi block must NOT enter the system
    a_cold = model.factors_cold(U=U[7])
    a_refc, _ = ref_factors_collective_explicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=np.zeros(0), x_col=np.zeros(0, np.int64), n=n,
        C=np.asarray(model.C_, np.float64), u_vec=U[7],
        U_colmeans=model.U_colmeans_,
        Bi=np.asarray(model.Bi_, np.float64), add_implicit_features=True,
        w_implicit=0.4,
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=False, w_user=0.6)
    np.testing.assert_allclose(a_cold, a_refc, atol=1e-8)


def test_factors_scale_lam_sideinfo_vs_binary():
    """Warm single factors on a scale_lam_sideinfo model: the lambda
    multiplier counts X entries + side entries (r2-advisor fix)."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_factors_collective_explicit_single

    rng = np.random.default_rng(14)
    m, n, p = 40, 25, 6
    mask = rng.uniform(size=(m, n)) < 0.4
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    k, lam = 4, 0.05
    model = CMF(k=k, lambda_=lam, w_user=0.6, niter=4, use_cg=False,
                scale_lam_sideinfo=True, use_float=False,
                user_bias=True, item_bias=True).fit_triplets(
                    rows, cols, vals, m, n, U=U)

    sel = rows == 5
    xc, xv = cols[sel].astype(np.int64), vals[sel]
    a_ours, b_ours = model.factors_warm(
        X_col=xc, X_val=xv, U=U[5], return_bias=True)
    a_ref, b_ref = ref_factors_collective_explicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=xv, x_col=xc, n=n,
        C=np.asarray(model.C_, np.float64), u_vec=U[5],
        U_colmeans=model.U_colmeans_,
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=True, w_user=0.6,
        scale_lam_sideinfo=True)
    np.testing.assert_allclose(a_ours, a_ref, atol=1e-8)
    assert abs(b_ours - b_ref) < 1e-8


def test_most_popular_vs_binary():
    """MostPopular two-sided explicit (user_bias=True: the iterated
    alternating bias solve) vs fit_most_popular.  The binary's
    single-sided entry (biasA=NULL) segfaults inside its own
    initialize_biases, so only the two-sided path can be driven head to
    head; the single-sided formula is pinned by the NumPy oracle in
    tests/test_other_models.py instead."""
    from cmfrec_tpu import MostPopular
    from .ref_binary import ref_fit_most_popular

    rng = np.random.default_rng(13)
    m, n = 50, 30
    mask = rng.uniform(size=(m, n)) < 0.3
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    lam = 2.0
    model = MostPopular(lambda_=lam, user_bias=True,
                        use_float=False).fit_triplets(rows, cols, vals, m, n)
    ref = ref_fit_most_popular(rows, cols, vals, m, n,
                               lam_user=lam, lam_item=lam)
    assert abs(model.glob_mean_ - ref["glob_mean"]) < 1e-10
    np.testing.assert_allclose(np.asarray(model.item_bias_), ref["biasB"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(model.user_bias_), ref["biasA"],
                               atol=1e-9)

    # scale_lam + scale_bias_const: lam becomes a constant scaled by the
    # MEAN per-entity count, per-entity scaling off (common.c:5896-5925).
    # The BINARY segfaults on this combination (cnt buffers not allocated
    # on the two-sided sparse path), so pin against a literal replica of
    # the intended semantics instead of head-to-head.
    ms = MostPopular(lambda_=lam, user_bias=True, scale_lam=True,
                     scale_bias_const=True,
                     use_float=False).fit_triplets(rows, cols, vals, m, n)
    gm = float(np.mean(vals))
    vc = vals - gm
    cA = np.bincount(rows, minlength=m).astype(np.float64)
    cB = np.bincount(cols, minlength=n).astype(np.float64)
    lu = lam * float(np.mean(cA))
    li = lam * float(np.mean(cB))
    bA = np.zeros(m)
    for _ in range(6):
        sB = np.bincount(cols, weights=vc - bA[rows], minlength=n)
        bB = sB / (cB + li)
        sA = np.bincount(rows, weights=vc - bB[cols], minlength=m)
        bA = sA / (cA + lu)
    np.testing.assert_allclose(np.asarray(ms.item_bias_), bB, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ms.user_bias_), bA, atol=1e-9)


def test_offsets_factors_warm_vs_binary():
    """OMF warm single factors (offsets_factors_warm, offsets.c:578) on
    the same trained parameters: with side info (base = U@C + C_bias) and
    without, exact=False and exact=True — the three reference cases in
    solvers/warm.py:396-542 were previously only oracle-tested."""
    from cmfrec_tpu import OMF_explicit
    from .ref_binary import ref_factors_offsets_explicit_single

    rng = np.random.default_rng(57)
    m, n, p = 35, 22, 5
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    k, lam = 4, 0.8
    model = OMF_explicit(k=k, lambda_=lam, method="als", niter=4,
                         use_cg=False, user_bias=True, item_bias=True,
                         add_intercepts=True,
                         use_float=False).fit_triplets(
                             rows, cols, vals, m, n, U=U)

    sel = rows == 3
    xc, xv = cols[sel].astype(np.int64), vals[sel]
    u_raw = U[3]
    u_centered = u_raw - np.asarray(model.U_colmeans_)
    Bm = np.asarray(model.Bm_, np.float64)
    C = np.asarray(model.C_, np.float64)
    Cb = (None if model.C_bias_ is None
          else np.asarray(model.C_bias_, np.float64))
    bB = np.asarray(model.item_bias_, np.float64)

    for exact in (False, True):
        a_ours, bias_ours = model.factors_warm(
            X_col=xc, X_val=xv, U=u_raw, return_bias=True, exact=exact)
        ref = ref_factors_offsets_explicit_single(
            k=k, lam=lam, Bm=Bm, xa=xv, x_col=xc, n=n,
            C=C, u_vec=u_centered, C_bias=Cb,
            biasB=bB, glob_mean=model.glob_mean_, with_bias=True,
            exact=exact)
        # a_vec is the combined factor Am — ours matches exactly
        np.testing.assert_allclose(np.asarray(a_ours), ref["a_vec"],
                                   atol=1e-8, err_msg=f"exact={exact}")
        assert abs(bias_ours - ref["bias"]) < 1e-8
        base = u_centered @ C + Cb
        if not exact:
            # REFERENCE DEFECT (not copied): in the k_sec==0 fast branch
            # the binary's output_a ("A := Am - U*C", offsets.c:732)
            # actually computes w_user*(U*C) - w_user*Am — sign inverted,
            # w_user on the wrong operand.  Replica pin:
            np.testing.assert_allclose(ref["output_a"],
                                       base - ref["a_vec"], atol=1e-8)
        else:
            # the exact branch (offsets.c:845) stores A correctly
            np.testing.assert_allclose(ref["output_a"],
                                       ref["a_vec"] - base, atol=1e-8)
        # ours returns the intended A = Am - base (same call family:
        # return_bias changes the solve by appending the bias coordinate)
        a_raw, _ = model.factors_warm(X_col=xc, X_val=xv, U=u_raw,
                                      return_raw_A=True, return_bias=True,
                                      exact=exact)
        np.testing.assert_allclose(np.asarray(a_raw),
                                   np.asarray(a_ours) - base, atol=1e-8)

    # no side info for the new row: base is zero
    a_ours, bias_ours = model.factors_warm(
        X_col=xc, X_val=xv, return_bias=True)
    ref = ref_factors_offsets_explicit_single(
        k=k, lam=lam, Bm=Bm, xa=xv, x_col=xc, n=n,
        biasB=bB, glob_mean=model.glob_mean_, with_bias=True)
    np.testing.assert_allclose(np.asarray(a_ours), ref["a_vec"],
                               atol=1e-8)
    assert abs(bias_ours - ref["bias"]) < 1e-8


def test_offsets_explicit_als_vs_binary():
    """OMF (offsets model, ALS mode): inner Am/Bm ALS from a shared init,
    then the attribute regression — A/B offsets, C/C_bias, Am/Bm all
    compared against fit_offsets_explicit_als.  The binary regresses on
    U as given, so it receives the pre-centered U our pipeline uses
    (offsets.c's GELSD has no centering of its own)."""
    from cmfrec_tpu.solvers.offsets import fit_offsets_als
    from .ref_binary import ref_fit_offsets_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=21, m=35, n=22)
    p, q, k, lam = 5, 4, 4, 0.8
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    Uc = U - U.mean(axis=0)
    Ic = I - I.mean(axis=0)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_offsets_als(
        rows, cols, vals, m, n,
        side_U=(None, None, None, m, p, True, U),
        side_I=(None, None, None, n, q, True, I),
        k=k, lambda_=lam, niter=3, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, add_intercepts=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_offsets_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, U=Uc, II=Ic, add_intercepts=True,
        use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True)
    np.testing.assert_allclose(np.asarray(ours["Am"]), ref["Am"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["Bm"]), ref["Bm"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["C_bias"]), ref["C_bias"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["D"]), ref["D"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-8)


def test_factors_implicit_single_vs_binary():
    """CMF_implicit.factors_warm == factors_collective_implicit_single,
    plain and with dense side info."""
    from cmfrec_tpu import CMF_implicit
    from .ref_binary import ref_factors_collective_implicit_single

    rows, cols, vals, m, n, k, _, _ = _implicit_data()
    rng = np.random.default_rng(31)
    p, k_user = 5, 2
    U = rng.normal(size=(m, p))
    lam, alpha = 0.9, 2.0
    model = CMF_implicit(k=k, k_user=k_user, lambda_=lam, alpha=alpha,
                         w_user=0.7, niter=4, use_cg=False,
                         use_float=False).fit_triplets(
                             rows, cols, vals, m, n, U=U)
    sel = rows == 5
    xc, xv = cols[sel].astype(np.int64), vals[sel]
    a_ours = model.factors_warm(X_col=xc, X_val=xv, U=U[5])
    a_ref = ref_factors_collective_implicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=xv, x_col=xc, n=n, alpha=alpha,
        C=np.asarray(model.C_, np.float64), u_vec=U[5],
        U_colmeans=model.U_colmeans_,
        k_user=k_user, w_user=0.7,
        w_main_multiplier=getattr(model, "w_main_multiplier_", 1.0))
    np.testing.assert_allclose(a_ours, a_ref, atol=1e-8)

    # plain (no side info)
    m2 = CMF_implicit(k=k, lambda_=lam, alpha=alpha, niter=4,
                      use_cg=False, use_float=False).fit_triplets(
                          rows, cols, vals, m, n)
    a_ours2 = m2.factors_warm(X_col=xc, X_val=xv)
    a_ref2 = ref_factors_collective_implicit_single(
        k=k, lam=lam, B=np.asarray(m2.B_, np.float64),
        xa=xv, x_col=xc, n=n, alpha=alpha,
        w_main_multiplier=getattr(m2, "w_main_multiplier_", 1.0))
    np.testing.assert_allclose(a_ours2, a_ref2, atol=1e-8)

    # cold (side info only): the system must still include the B Gram
    # (collective.c:3491 — lam and w_user are w_main-normalized around a
    # full BtB+CtC solve)
    a_cold = model.factors_cold(U=U[5])
    a_refc = ref_factors_collective_implicit_single(
        k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        xa=np.zeros(0), x_col=np.zeros(0, np.int64), n=n, alpha=alpha,
        C=np.asarray(model.C_, np.float64), u_vec=U[5],
        U_colmeans=model.U_colmeans_,
        k_user=k_user, w_user=0.7,
        w_main_multiplier=getattr(model, "w_main_multiplier_", 1.0))
    np.testing.assert_allclose(a_cold, a_refc, atol=1e-8)


def test_topn_vs_binary():
    """model.topN (and the include/exclude variants) returns the same
    ranking as topN_old_collective_explicit on the same factors."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_topn_old_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=41)
    model = CMF(k=5, lambda_=0.8, niter=4, use_cg=False,
                use_float=False).fit_triplets(rows, cols, vals, m, n)
    u = 4
    a_vec = np.asarray(model.A_, np.float64)[u]
    a_bias = float(model.user_bias_[u])
    ours = model.topN(u, n=8)
    ref_ix, ref_sc = ref_topn_old_collective_explicit(
        a_vec=a_vec, a_bias=a_bias, B=np.asarray(model.B_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, k=5, n_top=8, n=n)
    np.testing.assert_array_equal(np.asarray(ours), ref_ix)

    exc = np.array([int(ref_ix[0]), int(ref_ix[2])])
    ours_exc = model.topN(u, n=8, exclude=exc)
    ref_exc, _ = ref_topn_old_collective_explicit(
        a_vec=a_vec, a_bias=a_bias, B=np.asarray(model.B_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, k=5, n_top=8, n=n, exclude=exc)
    np.testing.assert_array_equal(np.asarray(ours_exc), ref_exc)

    inc = np.arange(0, n, 2, dtype=np.int64)
    ours_inc = model.topN(u, n=6, include=inc)
    ref_inc, _ = ref_topn_old_collective_explicit(
        a_vec=a_vec, a_bias=a_bias, B=np.asarray(model.B_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, k=5, n_top=6, n=n, include=inc)
    np.testing.assert_array_equal(np.asarray(ours_inc), ref_inc)


def test_topn_implicit_vs_binary():
    """CMF_implicit.topN matches topN_old_collective_implicit
    (cmfrec.h:2117) on the same factors, incl. exclude lists — the
    implicit serving ranking path (bench_serving.run_implicit)."""
    from cmfrec_tpu import CMF_implicit
    from .ref_binary import ref_topn_old_collective_implicit

    rng, rows, cols, vals, m, n = _data(seed=43)
    model = CMF_implicit(k=5, lambda_=1.0, niter=4, use_cg=False,
                         use_float=False).fit_triplets(
        rows, cols, np.abs(vals) + 1.0, m, n)
    u = 3
    a_vec = np.asarray(model.A_, np.float64)[u]
    ours = model.topN(u, n=8)
    ref_ix, _ = ref_topn_old_collective_implicit(
        a_vec=a_vec, B=np.asarray(model.B_, np.float64), k=5, n_top=8, n=n)
    np.testing.assert_array_equal(np.asarray(ours), ref_ix)

    exc = np.array([int(ref_ix[0]), int(ref_ix[3])])
    ours_exc = model.topN(u, n=8, exclude=exc)
    ref_exc, _ = ref_topn_old_collective_implicit(
        a_vec=a_vec, B=np.asarray(model.B_, np.float64), k=5, n_top=8,
        n=n, exclude=exc)
    np.testing.assert_array_equal(np.asarray(ours_exc), ref_exc)


def test_lbfgs_objective_quality_vs_binary():
    """method='lbfgs': optimizer internals differ (optax + zoom vs the
    reference's vendored libLBFGS), so trajectories are not comparable —
    instead both start from the SAME init and the final objective values
    of the shared collective loss must agree to a small relative slack
    (neither optimizer stuck somewhere meaningfully worse)."""
    from cmfrec_tpu.solvers.lbfgs import fit_collective_explicit_lbfgs
    from .ref_binary import ref_fit_lbfgs

    rng, rows, cols, vals, m, n = _data(seed=51, m=25, n=18)
    p, k, k_user, lam = 4, 3, 1, 0.5
    U = rng.normal(size=(m, p))
    Uc = U - U.mean(axis=0)
    A0 = rng.normal(size=(m, k_user + k)) * 0.3
    B0 = rng.normal(size=(n, k)) * 0.3
    C0 = rng.normal(size=(p, k_user + k)) * 0.3

    def objective(A, B, C, biasA, biasB, gm, w_user=0.7):
        ax = A[:, k_user:]
        resid = vals - gm - biasA[rows] - biasB[cols] - np.einsum(
            "nk,nk->n", ax[rows], B[cols])
        f = 0.5 * np.sum(resid ** 2)
        f += 0.5 * w_user * np.sum((Uc - A @ C.T) ** 2)
        f += 0.5 * lam * (np.sum(A ** 2) + np.sum(B ** 2) + np.sum(C ** 2)
                          + np.sum(biasA ** 2) + np.sum(biasB ** 2))
        return f

    ours = fit_collective_explicit_lbfgs(
        rows, cols, vals, m, n,
        side_U=(None, None, None, m, p, True, U),
        k=k, k_user=k_user, lambda_=lam, w_user=0.7,
        user_bias=True, item_bias=True, center=True,
        maxiter=1000, corr_pairs=5, dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_lbfgs(
        rows, cols, vals, m, n, k=k, lam=lam, maxiter=1000,
        A0=A0, B0=B0, C0=C0, U=U, k_user=k_user, w_user=0.7,
        user_bias=True, item_bias=True, center=True, corr_pairs=5)
    f_ours = objective(
        np.asarray(ours["A"], np.float64), np.asarray(ours["B"], np.float64),
        np.asarray(ours["C"], np.float64),
        np.asarray(ours["biasA"], np.float64),
        np.asarray(ours["biasB"], np.float64), ours["glob_mean"])
    f_ref = objective(ref["A"], ref["B"], ref["C"],
                      ref["biasA"], ref["biasB"], ref["glob_mean"])
    assert abs(ours["glob_mean"] - ref["glob_mean"]) < 1e-10
    # ours must be at least as good (within 0.5% slack), and not
    # mysteriously better by an amount suggesting a different objective
    assert f_ours <= f_ref * 1.005, (f_ours, f_ref)
    assert f_ours >= f_ref * 0.95, (f_ours, f_ref)


def test_lbfgs_ubin_objective_quality_vs_binary():
    """U_bin (binary side info, sigmoid-squared loss through Cb) — the
    only capability the reference restricts to its L-BFGS path.  Same
    same-init final-objective protocol as the plain L-BFGS test."""
    from cmfrec_tpu.solvers.lbfgs import fit_collective_explicit_lbfgs
    from .ref_binary import ref_fit_lbfgs

    rng, rows, cols, vals, m, n = _data(seed=53, m=25, n=18)
    pbin, k, lam = 4, 3, 0.5
    Ub = (rng.uniform(size=(m, pbin)) < 0.5).astype(np.float64)
    A0 = rng.normal(size=(m, k)) * 0.3
    B0 = rng.normal(size=(n, k)) * 0.3
    Cb0 = rng.normal(size=(pbin, k)) * 0.3

    def objective(A, B, Cb, biasA, biasB, gm, w_user=0.7):
        resid = vals - gm - biasA[rows] - biasB[cols] - np.einsum(
            "nk,nk->n", A[rows], B[cols])
        f = 0.5 * np.sum(resid ** 2)
        s = 1.0 / (1.0 + np.exp(-(A @ Cb.T)))
        f += 0.5 * w_user * np.sum((Ub - s) ** 2)
        f += 0.5 * lam * (np.sum(A ** 2) + np.sum(B ** 2) + np.sum(Cb ** 2)
                          + np.sum(biasA ** 2) + np.sum(biasB ** 2))
        return f

    ours = fit_collective_explicit_lbfgs(
        rows, cols, vals, m, n,
        side_Ub=(None, None, None, m, pbin, True, Ub),
        k=k, lambda_=lam, w_user=0.7,
        user_bias=True, item_bias=True, center=True,
        maxiter=1000, corr_pairs=5, dtype=np.float64,
        init={"A": A0, "B": B0, "Cb": Cb0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_lbfgs(
        rows, cols, vals, m, n, k=k, lam=lam, maxiter=1000,
        A0=A0, B0=B0, U_bin=Ub, Cb0=Cb0, w_user=0.7,
        user_bias=True, item_bias=True, center=True, corr_pairs=5)
    f_ours = objective(
        np.asarray(ours["A"], np.float64), np.asarray(ours["B"], np.float64),
        np.asarray(ours["Cb"], np.float64),
        np.asarray(ours["biasA"], np.float64),
        np.asarray(ours["biasB"], np.float64), ours["glob_mean"])
    f_ref = objective(ref["A"], ref["B"], ref["Cb"],
                      ref["biasA"], ref["biasB"], ref["glob_mean"])
    assert abs(ours["glob_mean"] - ref["glob_mean"]) < 1e-10
    assert f_ours <= f_ref * 1.005, (f_ours, f_ref)
    assert f_ours >= f_ref * 0.95, (f_ours, f_ref)


def test_content_based_objective_quality_vs_binary():
    """ContentBased (pure attribute model, k_sec=k): same-init final
    objective parity with fit_content_based_lbfgs, like the L-BFGS test
    (optimizer internals differ; the reached optimum must not)."""
    from cmfrec_tpu.solvers.offsets import fit_offsets_explicit_lbfgs
    from .ref_binary import ref_fit_content_based

    rng, rows, cols, vals, m, n = _data(seed=61, m=25, n=18)
    p, q, k, lam = 4, 3, 3, 0.5
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    Uc = U - U.mean(axis=0)
    Ic = I - I.mean(axis=0)
    C0 = rng.normal(size=(p, k)) * 0.3
    D0 = rng.normal(size=(q, k)) * 0.3

    def objective(C, D, gm):
        Am = Uc @ C
        Bm = Ic @ D
        resid = vals - gm - np.einsum("nk,nk->n", Am[rows], Bm[cols])
        return (0.5 * np.sum(resid ** 2)
                + 0.5 * lam * (np.sum(C ** 2) + np.sum(D ** 2)))

    ours = fit_offsets_explicit_lbfgs(
        rows, cols, vals, m, n,
        side_U=(None, None, None, m, p, True, U),
        side_I=(None, None, None, n, q, True, I),
        k=0, k_sec=k, k_main=0, lambda_=lam,
        user_bias=False, item_bias=False, center=True,
        add_intercepts=False, maxiter=1500, corr_pairs=5,
        dtype=np.float64, init_params={"C": C0, "D": D0})
    ref = ref_fit_content_based(
        rows, cols, vals, m, n, k=k, lam=lam, maxiter=1500,
        C0=C0, D0=D0, U=Uc, II=Ic, add_intercepts=False,
        user_bias=False, item_bias=False, corr_pairs=5)
    f_ours = objective(np.asarray(ours["C"], np.float64),
                       np.asarray(ours["D"], np.float64),
                       ours["glob_mean"])
    f_ref = objective(ref["C"], ref["D"], ref["glob_mean"])
    assert f_ours <= f_ref * 1.005, (f_ours, f_ref)
    assert f_ours >= f_ref * 0.95, (f_ours, f_ref)


def test_imputer_transform_vs_binary():
    """CMF.transform (the imputer surface) fills NaNs with the same
    values as impute_X_collective_explicit on the trained parameters."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_impute_X

    rng, rows, cols, vals, m, n = _data(seed=71)
    k, lam = 4, 0.7
    model = CMF(k=k, lambda_=lam, niter=4, use_cg=False, use_float=False,
                user_bias=True, item_bias=True).fit_triplets(
                    rows, cols, vals, m, n)
    # new rows to impute: dense with NaNs
    Xnew = np.full((6, n), np.nan)
    rng2 = np.random.default_rng(72)
    for i in range(6):
        obs = rng2.choice(n, size=8, replace=False)
        Xnew[i, obs] = 3.0 + rng2.normal(size=8)
    ours = model.transform(X=Xnew)
    ref = ref_impute_X(
        Xnew, k=k, lam=lam, B=np.asarray(model.B_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=model.glob_mean_, user_bias=True)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_most_popular_na_as_zero_vs_binary():
    """MostPopular with NA_as_zero: sums run over all m*n cells
    (unobserved = zero), two-sided.  The binary's NA0 path
    (initialize_biases_twosided, common.c:4690/4850) carries two quirks a
    replica pins here: the item update averages biasA[:n] (a length-m
    array iterated with the ITEM count, common.c "row < n" loop) and both
    updates skip the opposing-bias mean entirely on the first pass
    (`if (iter > 0)`).  Our implementation solves the intended exact
    alternating closed forms instead; the intent is asserted by checking
    the two coincide when m == n is not degenerate... (here: replica ==
    binary; exact == ours)."""
    from cmfrec_tpu import MostPopular
    from .ref_binary import ref_fit_most_popular

    rng = np.random.default_rng(14)
    m, n = 40, 25
    mask = rng.uniform(size=(m, n)) < 0.3
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    lam = 1.5
    ref = ref_fit_most_popular(rows, cols, vals, m, n,
                               lam_user=lam, lam_item=lam, NA_as_zero=True)
    mu = ref["glob_mean"]
    assert abs(mu - np.sum(vals) / (m * n)) < 1e-10

    # literal replica of the binary's quirky recursion (5 passes)
    meanA = np.bincount(rows, weights=vals, minlength=m) / n
    meanB = np.bincount(cols, weights=vals, minlength=n) / m
    biasA = np.zeros(m)
    biasB = np.zeros(n)
    for it in range(5):
        bmeanA = biasA[:n].mean() if it > 0 else 0.0
        biasB = (meanB - bmeanA - mu) * (m / (m + lam))
        bmeanB = biasB[:n].mean() if it > 0 else 0.0
        biasA = (meanA - bmeanB - mu) * (n / (n + lam))
    np.testing.assert_allclose(biasB, ref["biasB"], atol=1e-10)
    np.testing.assert_allclose(biasA, ref["biasA"], atol=1e-10)

    # ours == the exact alternating closed forms (intended semantics)
    model = MostPopular(lambda_=lam, user_bias=True, NA_as_zero=True,
                        use_float=False).fit_triplets(rows, cols, vals, m, n)
    assert abs(model.glob_mean_ - mu) < 1e-10
    bA = np.zeros(m)
    for _ in range(6):
        bB = (np.bincount(cols, weights=vals, minlength=n)
              - m * mu - bA.sum()) / (m + lam)
        bA = (np.bincount(rows, weights=vals, minlength=m)
              - n * mu - bB.sum()) / (n + lam)
    np.testing.assert_allclose(np.asarray(model.item_bias_), bB, atol=1e-9)
    np.testing.assert_allclose(np.asarray(model.user_bias_), bA, atol=1e-9)


def test_explicit_dense_weighted_vs_binary():
    """Weighted fit pinned POSITIVELY against the binary through its
    DENSE code path (Xfull + dense weights), which does not have the
    sparse path's CSC weight-misalignment defect (collective.c:8642).
    Our engine treats dense X as the equivalent COO triplets, so the
    same weighted fit must match the binary exactly here — biases,
    weighted centering, and factor trajectories included."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=11)
    wgt = rng.uniform(0.5, 2.0, rows.size)
    k, lam, niter = 4, 0.3, 3
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    Xfull = np.full((m, n), np.nan)
    Xfull[rows, cols] = vals
    Wfull = np.ones((m, n))
    Wfull[rows, cols] = wgt

    ref = ref_fit_explicit_als(
        None, None, None, m, n, k=k, lam=lam, niter=niter,
        A0=A0, B0=B0, use_cg=False, weights=Wfull, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, Xfull=Xfull)
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=niter,
        use_cg=False, user_bias=True, item_bias=True, center=True,
        weights=wgt, dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    assert abs(ours["glob_mean"] - ref["glob_mean"]) < 1e-10
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


def test_collective_short_dense_side_vs_binary():
    """DENSE side matrix with FEWER rows than the main dimension
    (m_u < m, supported by the reference): entities beyond m_u must get
    NO side contribution (X-only systems) — previously the dense fast
    paths crashed or fed every row the shared CtC base.  Short dense
    sides are re-expressed as sparse triplets
    (collective._sparsify_short_dense_side); pinned for the explicit and
    implicit collective fits."""
    from cmfrec_tpu.solvers.collective import (
        fit_collective_explicit_als,
        fit_collective_implicit_als,
    )
    from .ref_binary import ref_fit_implicit_als

    rng = np.random.default_rng(11)
    m, n, m_u, p, k = 24, 15, 17, 4, 3
    rows = rng.integers(0, m, 160)
    cols = rng.integers(0, n, 160)
    pairs = np.unique(rows * n + cols)
    rows, cols = pairs // n, pairs % n
    vals = rng.normal(size=rows.size) + 3
    U = rng.normal(size=(m_u, p))
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.6
    side_U = (None, None, None, m_u, p, True, U)

    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=2,
        A0=A0, B0=B0, C0=C0, U=U, use_cg=False, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=False)
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, side_U=side_U, k=k, lambda_=lam,
        niter=2, use_cg=False, finalize_chol=False, user_bias=False,
        item_bias=False, center=False, center_U=False,
        dtype=np.float64, seed=5, init=dict(A=A0, B=B0, C=C0))
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(np.asarray(ours[key])[:, :k],
                                   ref[key][:, :k], atol=1e-12, err_msg=key)

    vi = rng.integers(1, 9, rows.size).astype(np.float64)
    ref = ref_fit_implicit_als(
        rows, cols, vi, m, n, k=k, lam=lam, niter=2, alpha=0.7,
        A0=A0, B0=B0, C0=C0, U=U, center_U=False, use_cg=False)
    ours = fit_collective_implicit_als(
        rows, cols, vi, m, n, side_U=side_U, k=k, lambda_=lam,
        alpha=0.7, niter=2, use_cg=False, center_U=False,
        dtype=np.float64, seed=5, init=dict(A=A0, B=B0, C=C0))
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(np.asarray(ours[key])[:, :k],
                                   ref[key][:, :k], atol=1e-12, err_msg=key)


def test_collective_scale_bias_const_defect_replica():
    """Reference defect #6 (replica-pinned, not copied): under
    scale_lam + scale_bias_const the COLLECTIVE closed form double-scales
    the bias penalty — collective_closed_form_block multiplies lam_last
    by the per-row multiplier unconditionally (collective.c:1349-1355;
    the scale_bias_const gate there protects only the L1 lambdas), on
    top of the fit-level lam *= scaling_biasA (collective.c:8151) — so
    the side-info path applies lam * scaling * row_count while the plain
    path (common.c:717-722) and the reference's own docs hold the bias
    penalty CONSTANT at lam * scaling.  This test replica-pins the
    binary's double-scaled A half-step exactly, pins the plain-path B
    half-step at the constant form, and pins OUR fit at the intended
    constant form on both sides."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(9)
    m, n, p, k = 22, 16, 5, 3
    rows = rng.integers(0, m, 160)
    cols = rng.integers(0, n, 160)
    pairs = np.unique(rows * n + cols)
    rows, cols = pairs // n, pairs % n
    vals = rng.normal(size=rows.size) + 3
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.5
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=1,
        A0=A0, B0=B0, C0=C0, U=U, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=False, center_U=False,
        scale_lam=True, scale_bias_const=True)
    sA, sB = ref["scaling_biasA"], ref["scaling_biasB"]

    # replica: C (dense, scaled by per-feature count m), then B (plain
    # path: CONSTANT bias penalty), then A (collective path:
    # DOUBLE-scaled bias penalty)
    C1 = np.linalg.solve(A0.T @ A0 + lam * m * np.eye(k), A0.T @ U).T
    B1 = np.zeros((n, k))
    bB1 = np.zeros(n)
    for c in range(n):
        sel = cols == c
        rs, xs = rows[sel], vals[sel]
        Ae = np.concatenate([A0[rs], np.ones((rs.size, 1))], axis=1)
        G = Ae.T @ Ae + np.diag([lam * rs.size] * k + [lam * sB])
        sol = np.linalg.solve(G, Ae.T @ xs)
        B1[c], bB1[c] = sol[:k], sol[k]
    np.testing.assert_allclose(B1, ref["B"][:, :k], atol=1e-12)
    np.testing.assert_allclose(bB1, ref["biasB"], atol=1e-12)
    A1 = np.zeros((m, k))
    bA1 = np.zeros(m)
    for r in range(m):
        sel = rows == r
        cs, xs = cols[sel], vals[sel]
        Be = np.concatenate([B1[cs], np.ones((cs.size, 1))], axis=1)
        G = Be.T @ Be
        G[:k, :k] += C1.T @ C1
        G += np.diag([lam * cs.size] * k
                     + [lam * sA * max(cs.size, 1)])  # the defect
        rhs = Be.T @ (xs - bB1[cs])
        rhs[:k] += C1.T @ U[r]
        sol = np.linalg.solve(G, rhs)
        A1[r], bA1[r] = sol[:k], sol[k]
    np.testing.assert_allclose(A1, ref["A"][:, :k], atol=1e-12)
    np.testing.assert_allclose(bA1, ref["biasA"], atol=1e-12)

    # OURS: intended constant form on BOTH sides
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, side_U=(None, None, None, m, p, True, U),
        k=k, lambda_=lam, niter=1, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=False, center_U=False,
        scale_lam=True, scale_bias_const=True, dtype=np.float64, seed=5,
        init=dict(A=A0, B=B0, C=C0, biasA=np.zeros(m), biasB=np.zeros(n)))
    A1c = np.zeros((m, k))
    bA1c = np.zeros(m)
    for r in range(m):
        sel = rows == r
        cs, xs = cols[sel], vals[sel]
        Be = np.concatenate([B1[cs], np.ones((cs.size, 1))], axis=1)
        G = Be.T @ Be
        G[:k, :k] += C1.T @ C1
        G += np.diag([lam * cs.size] * k + [lam * sA])  # intended form
        rhs = Be.T @ (xs - bB1[cs])
        rhs[:k] += C1.T @ U[r]
        sol = np.linalg.solve(G, rhs)
        A1c[r], bA1c[r] = sol[:k], sol[k]
    np.testing.assert_allclose(np.asarray(ours["B"])[:, :k], B1, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), bB1, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["A"])[:, :k], A1c, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), bA1c, atol=1e-10)


def test_collective_extra_side_rows_vs_binary():
    """Side info with EXTRA entities (m_u > m): the shared Gram/rhs bases
    of the B/A systems must sum over the X dimension only — side-only
    users have live factor rows that the reference's opposing row counts
    exclude (optimizeA_collective_implicit passes m, collective.c:9924) —
    EXCEPT under NA_as_zero, where extra entities are genuine all-zero X
    rows and the reference includes them (both verified here).  Pins the
    implicit fit, the explicit NA0 fit, and the plain explicit fit with
    biases, all at m_u > m."""
    from cmfrec_tpu.solvers.collective import (
        fit_collective_explicit_als,
        fit_collective_implicit_als,
    )
    from .ref_binary import ref_fit_implicit_als

    rng = np.random.default_rng(7)
    m, n, m_u, p, k = 20, 14, 26, 5, 3
    rows = rng.integers(0, m, 150)
    cols = rng.integers(0, n, 150)
    pairs = np.unique(rows * n + cols)
    rows, cols = pairs // n, pairs % n
    U = rng.normal(size=(m_u, p))
    A0 = rng.normal(size=(m_u, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.8
    side_U = (None, None, None, m_u, p, True, U)

    # implicit (WRMF): Gram over the first m rows of A only
    vals_i = rng.integers(1, 9, rows.size).astype(np.float64)
    ref = ref_fit_implicit_als(
        rows, cols, vals_i, m, n, k=k, lam=lam, niter=2, alpha=0.7,
        A0=A0, B0=B0, C0=C0, U=U, w_user=0.9, center_U=False, use_cg=False)
    ours = fit_collective_implicit_als(
        rows, cols, vals_i, m, n, side_U=side_U, k=k, lambda_=lam,
        w_user=0.9, alpha=0.7, niter=2, use_cg=False, center_U=False,
        dtype=np.float64, seed=5, init=dict(A=A0, B=B0, C=C0))
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(np.asarray(ours[key])[:, :k],
                                   ref[key][:, :k], atol=1e-12, err_msg=key)

    # explicit NA_as_zero: extra rows ARE included (all-zero X rows)
    vals_e = rng.normal(size=rows.size) + 3
    ref = ref_fit_explicit_als(
        rows, cols, vals_e, m, n, k=k, lam=lam, niter=2,
        A0=A0, B0=B0, C0=C0, U=U, use_cg=False, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=False,
        NA_as_zero=True)
    ours = fit_collective_explicit_als(
        rows, cols, vals_e, m, n, side_U=side_U, k=k, lambda_=lam,
        niter=2, use_cg=False, finalize_chol=False, user_bias=False,
        item_bias=False, center=False, center_U=False, NA_as_zero=True,
        dtype=np.float64, seed=5, init=dict(A=A0, B=B0, C=C0))
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(np.asarray(ours[key])[:, :k],
                                   ref[key][:, :k], atol=1e-12, err_msg=key)

    # plain explicit with biases and centering
    ref = ref_fit_explicit_als(
        rows, cols, vals_e, m, n, k=k, lam=lam, niter=2,
        A0=A0, B0=B0, C0=C0, U=U, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=False)
    ours = fit_collective_explicit_als(
        rows, cols, vals_e, m, n, side_U=side_U, k=k, lambda_=lam,
        niter=2, use_cg=False, finalize_chol=False, user_bias=True,
        item_bias=True, center=True, center_U=False,
        dtype=np.float64, seed=5,
        init=dict(A=A0, B=B0, C=C0, biasA=np.zeros(m_u),
                  biasB=np.zeros(n)))
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(np.asarray(ours[key])[:, :k],
                                   ref[key][:, :k], atol=1e-12, err_msg=key)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-12)


def test_collective_weighted_implicit_features_vs_binary():
    """WEIGHTED fit with add_implicit_features.  The Bi/Ai (Xones)
    half-steps must be UNWEIGHTED even though X is weighted — the
    reference's Bi/Ai optimizeA calls pass weight = NULL
    (collective.c:8458-8530); pinned exactly against the binary on BOTH
    its sparse and dense code paths.

    The main A/B half-steps cannot be pinned head-to-head in this
    combination on either path: the sparse path has the documented CSC
    weight-misalignment defect (collective.c:8642), and the binary's
    DENSE path with add_implicit_features disagrees with its own sparse
    path even UNWEIGHTED (measured ~1.1 max-abs after one iteration on
    identical data/inits — there is no transposed Xones copy, see the
    TODO at collective.c:7639, so the B update indexes the user-major
    Xones in a layout the sparse path does not reproduce).  A/B are
    therefore pinned against the direct NumPy normal equations of the
    intended model instead."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=23)
    wgt = rng.uniform(0.5, 2.0, rows.size)
    k, lam, w_imp = 4, 0.5, 0.5
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    Ai0 = rng.normal(size=(m, k)) * 0.1
    Bi0 = rng.normal(size=(n, k)) * 0.1
    Xfull = np.full((m, n), np.nan)
    Xfull[rows, cols] = vals
    Wfull = np.ones((m, n))
    Wfull[rows, cols] = wgt

    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=1,
        use_cg=False, finalize_chol=False,
        add_implicit_features=True, w_implicit=w_imp,
        user_bias=False, item_bias=False, center=False,
        weights=wgt, dtype=np.float64,
        init={"A": A0, "B": B0, "Ai": Ai0, "Bi": Bi0})

    for Xf, Wf, coo in ((Xfull, Wfull, (None, None, None)),
                        (None, wgt, (rows, cols, vals))):
        ref = ref_fit_explicit_als(
            coo[0], coo[1], coo[2], m, n, k=k, lam=lam, niter=1,
            A0=A0, B0=B0, use_cg=False, weights=Wf, finalize_chol=False,
            add_implicit_features=True, Ai0=Ai0, Bi0=Bi0, w_implicit=w_imp,
            user_bias=False, item_bias=False, center=False, Xfull=Xf)
        np.testing.assert_allclose(np.asarray(ours["Bi"]), ref["Bi"],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours["Ai"]), ref["Ai"],
                                   atol=1e-12)

    # A/B: direct NumPy oracle of the intended weighted system with the
    # UNWEIGHTED implicit parts (reference order: Bi, Ai, then B, then A)
    Ai1 = np.asarray(ours["Ai"], np.float64)
    Bi1 = np.asarray(ours["Bi"], np.float64)
    B1 = np.zeros((n, k))
    for c in range(n):
        sel = cols == c
        rs, xs, ws = rows[sel], vals[sel], wgt[sel]
        G = (A0[rs].T * ws) @ A0[rs] + w_imp * (Ai1.T @ Ai1)             + lam * np.eye(k)
        rhs = A0[rs].T @ (ws * xs) + w_imp * Ai1[rs].sum(axis=0)
        B1[c] = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(np.asarray(ours["B"]), B1, atol=1e-10)
    A1 = np.zeros((m, k))
    for r in range(m):
        sel = rows == r
        cs, xs, ws = cols[sel], vals[sel], wgt[sel]
        G = (B1[cs].T * ws) @ B1[cs] + w_imp * (Bi1.T @ Bi1)             + lam * np.eye(k)
        rhs = B1[cs].T @ (ws * xs) + w_imp * Bi1[cs].sum(axis=0)
        A1[r] = np.linalg.solve(G, rhs)
    np.testing.assert_allclose(np.asarray(ours["A"]), A1, atol=1e-10)


def test_explicit_dense_plain_vs_binary():
    """Unweighted dense-Xfull fit == our COO fit == the binary's sparse
    fit: anchors that our single engine covers BOTH reference input
    paths (the reference maintains separate dense/sparse kernels;
    collective.c optimizeA cases)."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=12)
    k, lam, niter = 5, 0.6, 3
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    Xfull = np.full((m, n), np.nan)
    Xfull[rows, cols] = vals

    ref = ref_fit_explicit_als(
        None, None, None, m, n, k=k, lam=lam, niter=niter,
        A0=A0, B0=B0, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, Xfull=Xfull)
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=niter,
        use_cg=False, user_bias=True, item_bias=True, center=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "biasA": np.zeros(m), "biasB": np.zeros(n)})
    assert abs(ours["glob_mean"] - ref["glob_mean"]) < 1e-10
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_offsets_implicit_als_vs_binary():
    """OMF implicit (offsets WRMF): inner Am/Bm implicit ALS from a
    shared init, then the GELSD attribute regression — pinned against
    fit_offsets_implicit_als (/root/reference/src/offsets.c:2221).
    As with the explicit variant, the binary regresses on U as given,
    so it receives the pre-centered side matrices."""
    from cmfrec_tpu.solvers.offsets import fit_offsets_als
    from .ref_binary import ref_fit_offsets_implicit_als

    rng = np.random.default_rng(31)
    m, n = 32, 24
    mask = rng.uniform(size=(m, n)) < 0.3
    rows, cols = np.nonzero(mask)
    vals = rng.uniform(1.0, 10.0, rows.size)
    p, q, k, lam, alpha = 5, 4, 4, 0.8, 2.0
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    Uc = U - U.mean(axis=0)
    Ic = I - I.mean(axis=0)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    ours = fit_offsets_als(
        rows, cols, vals, m, n, implicit=True,
        side_U=(None, None, None, m, p, True, U),
        side_I=(None, None, None, n, q, True, I),
        k=k, lambda_=lam, alpha=alpha, niter=3,
        use_cg=False, finalize_chol=False, add_intercepts=True,
        dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_offsets_implicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, alpha=alpha, niter=3,
        A0=A0, B0=B0, U=Uc, II=Ic, add_intercepts=True,
        use_cg=False, finalize_chol=False)
    np.testing.assert_allclose(np.asarray(ours["Am"]), ref["Am"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["Bm"]), ref["Bm"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["C_bias"]), ref["C_bias"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["D"]), ref["D"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-6)


def test_collective_chol_both_sides_vs_binary():
    """Two-sided collective model (C from U AND D from I), k_user/k_item/
    k_main splits, w_user/w_item — the item-side (D) half-step was never
    binary-pinned before this test."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(7)
    m, n, k, p, q = 25, 18, 4, 6, 5
    k_user, k_item, k_main = 2, 1, 1
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    A0 = rng.normal(size=(m, k_user + k + k_main)) * 0.1
    B0 = rng.normal(size=(n, k_item + k + k_main)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    D0 = rng.normal(size=(q, k_item + k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(None, None, None, m, p, True, U),
        side_I=(None, None, None, n, q, True, I),
        k_user=k_user, k_item=k_item, k_main=k_main,
        w_main=1.0, w_user=0.5, w_item=0.8,
        use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0, "D": D0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U=U, D0=D0, II=I,
        k_user=k_user, k_item=k_item, k_main=k_main,
        w_main=1.0, w_user=0.5, w_item=0.8,
        use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["D"]), ref["D"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def _sparse_side(rng, m, p, density=0.5):
    mask = rng.uniform(size=(m, p)) < density
    ur, uc = np.nonzero(mask)
    uv = rng.normal(size=ur.size)
    return ur, uc, uv


def test_collective_chol_sparse_U_vs_binary():
    """Sparse side-info matrix (U_row/U_col/U_sp path in the C API) with a
    k_user split — the sparse-U ingestion path was previously only
    oracle-tested.  center_U=False here: the binary's sparse-U centering
    is defective (see test_sparse_U_centering_defect_replica)."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(17)
    m, n, k, p = 25, 18, 4, 6
    k_user, k_main = 2, 1
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    ur, uc, uv = _sparse_side(rng, m, p)
    A0 = rng.normal(size=(m, k_user + k + k_main)) * 0.1
    B0 = rng.normal(size=(n, k + k_main)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(ur, uc, uv, m, p, False, None),
        k_user=k_user, k_main=k_main,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=False,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U_sp=(ur, uc, uv, m, p),
        k_user=k_user, k_main=k_main,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_sparse_U_centering_defect_replica():
    """REFERENCE DEFECT (not copied): for sparse U without NA_as_zero_U and
    center_U=True, preprocess_sideinfo_matrix captures the COO values
    pointer BEFORE center_by_cols replaces it with a centered copy
    (collective.c:6508 vs :6529), so coo_to_csr_and_csc (:6551) builds the
    fit's CSR/CSC from the STALE UNCENTERED array.  The binary thus fits
    on raw U while still reporting observed-count U_colmeans (which its
    own factor routines later subtract — internally inconsistent).  We
    center for real.  Replica pin: binary(center_U=True) == ours
    (center_U=False) on every fitted matrix, while the binary's returned
    U_colmeans are the observed means."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(17)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    ur, uc, uv = _sparse_side(rng, m, p)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.7
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U_sp=(ur, uc, uv, m, p),
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=True)
    ours_uncentered = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(ur, uc, uv, m, p, False, None),
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=False,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0})
    # the binary fit on raw values == our explicit center_U=False fit
    np.testing.assert_allclose(
        np.asarray(ours_uncentered["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours_uncentered["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours_uncentered["C"]), ref["C"], atol=1e-9)
    # ...yet the binary reports observed-count column means as if it had
    # centered (the means its factor routines will subtract at inference)
    obs_means = (np.bincount(uc, weights=uv, minlength=p)
                 / np.bincount(uc, minlength=p))
    np.testing.assert_allclose(ref["U_colmeans"], obs_means, atol=1e-12)
    # and OUR center_U=True fit genuinely differs (it actually centers)
    ours_centered = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(ur, uc, uv, m, p, False, None),
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=True,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0})
    assert np.abs(np.asarray(ours_centered["C"]) - ref["C"]).max() > 1e-3


def test_collective_cg_side_info_vs_binary():
    """Collective CG (the bench's flagship solver family) with dense side
    info — previously only the Chol collective path was binary-pinned.
    Bias-free: the reference's CG bias warm-start quirk (documented in
    test_explicit_cg_bias_quirk_documented) would otherwise diverge."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(23)
    m, n, k, p = 25, 18, 4, 6
    k_user, k_main = 2, 1
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k_user + k + k_main)) * 0.1
    B0 = rng.normal(size=(n, k + k_main)) * 0.1
    C0 = rng.normal(size=(p, k_user + k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=4,
        side_U=(None, None, None, m, p, True, U),
        k_user=k_user, k_main=k_main,
        w_main=1.0, w_user=0.5,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=True,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=4,
        A0=A0, B0=B0, C0=C0, U=U,
        k_user=k_user, k_main=k_main,
        w_main=1.0, w_user=0.5,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=False, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)


def test_collective_cg_implicit_features_vs_binary():
    """CG + add_implicit_features — the reference's best-RMSE benchmark
    config (benchmark/README.md:29 is its Chol variant; :28 is this one).
    Bias-free for the CG bias quirk."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(29)
    m, n, k = 25, 18, 4
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    Ai0 = rng.normal(size=(m, k)) * 0.1
    Bi0 = rng.normal(size=(n, k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=4,
        add_implicit_features=True, w_implicit=0.5,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=False,
        dtype=np.float64,
        init={"A": A0, "B": B0, "Ai": Ai0, "Bi": Bi0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=4,
        A0=A0, B0=B0, Ai0=Ai0, Bi0=Bi0,
        add_implicit_features=True, w_implicit=0.5,
        use_cg=True, max_cg_steps=3, finalize_chol=False,
        user_bias=False, item_bias=False, center=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["Ai"]), ref["Ai"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["Bi"]), ref["Bi"], atol=1e-9)


@pytest.mark.parametrize("engine", ["dense", "sparse"])
def test_explicit_pcg_vs_binary(engine):
    """precondition_cg=True: the Jacobi-preconditioned CG trajectory
    (previously pinned only against our own oracle).  The reference PCG
    has NO stopping tests (factors_explicit_pcg) — both our engines
    replicate that."""
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng = np.random.default_rng(43)
    m, n, k = 25, 18, 4
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    lam = 0.7
    ours = fit_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=4,
        use_cg=True, max_cg_steps=3, precondition_cg=True,
        finalize_chol=False, engine=engine,
        user_bias=False, item_bias=False, center=False,
        dtype=np.float64, init={"A": A0, "B": B0})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=4,
        A0=A0, B0=B0,
        use_cg=True, max_cg_steps=3, precondition_cg=True,
        finalize_chol=False,
        user_bias=False, item_bias=False, center=False)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)


def test_collective_pcg_objective_quality_vs_binary():
    """Collective PCG: our preconditioner is the true Jacobi diagonal of
    the weighted system; the reference's collective_block_cg uses RAW
    Grams (no w_user on CtC, collective.c:2266; BiTBi built with 1.0
    under CG, :1493).  Trajectories legitimately diverge (documented in
    rowsolve.solve_cg), so this pins OBJECTIVE quality at the respective
    fixed points instead, like the L-BFGS tests."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(47)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    Uc = U - U.mean(axis=0)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam, w_user = 0.7, 0.5

    def objective(A, B, C):
        resid = vals - np.einsum("nk,nk->n", A[rows], B[cols])
        f = 0.5 * np.sum(resid ** 2)
        f += 0.5 * w_user * np.sum((Uc - A @ C.T) ** 2)
        f += 0.5 * lam * (np.sum(A ** 2) + np.sum(B ** 2) + np.sum(C ** 2))
        return f

    kw = dict(use_cg=True, max_cg_steps=3, precondition_cg=True,
              finalize_chol=True, user_bias=False, item_bias=False,
              center=False, center_U=True)
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=25,
        side_U=(None, None, None, m, p, True, U), w_user=w_user,
        dtype=np.float64, init={"A": A0, "B": B0, "C": C0}, **kw)
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=25,
        A0=A0, B0=B0, C0=C0, U=U, w_user=w_user, **kw)
    f_ours = objective(np.asarray(ours["A"], np.float64),
                       np.asarray(ours["B"], np.float64),
                       np.asarray(ours["C"], np.float64))
    f_ref = objective(ref["A"], ref["B"], ref["C"])
    assert f_ours <= f_ref * 1.005, (f_ours, f_ref)
    assert f_ours >= f_ref * 0.95, (f_ours, f_ref)


def test_collective_chol_scale_lam_sideinfo_vs_binary():
    """scale_lam_sideinfo=True (scale_lam=False): per-row lambda scaling
    counts BOTH the X entries and the side-info entries — the wiring the
    r2 advisor flagged at inference is here pinned for the fit itself."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(31)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.05
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(None, None, None, m, p, True, U),
        scale_lam_sideinfo=True,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U=U,
        scale_lam_sideinfo=True,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_collective_chol_lam_unique_vs_binary():
    """Six-entry lambda on a collective model: lam_unique[4] governs C
    (divided by w_user inside the reference's C half-step)."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(37)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam6 = np.array([0.3, 0.4, 0.6, 0.8, 1.1, 0.9])
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam6, niter=3,
        side_U=(None, None, None, m, p, True, U),
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=1.0, lam_unique=lam6, niter=3,
        A0=A0, B0=B0, C0=C0, U=U,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-9)


def test_collective_dense_X_side_info_vs_binary():
    """Dense Xfull (NaN = missing) + dense side info: the reference's
    dense collective half-steps (whole-matrix optimizeA_collective) reach
    the same fixed point as our triplet engine from identical init."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(41)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    Xfull = np.full((m, n), np.nan)
    Xfull[rows, cols] = vals
    U = rng.normal(size=(m, p))
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(None, None, None, m, p, True, U),
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        None, None, None, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U=U, Xfull=Xfull,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["biasA"]), ref["biasA"],
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours["biasB"]), ref["biasB"],
                               atol=1e-8)


def test_collective_chol_na_as_zero_U_vs_binary():
    """Sparse U with NA_as_zero_U: missing side entries are literal
    zeros (dense closed form over all p columns per row)."""
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng = np.random.default_rng(19)
    m, n, k, p = 25, 18, 4, 6
    mask = rng.uniform(size=(m, n)) < 0.45
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    ur, uc, uv = _sparse_side(rng, m, p, density=0.35)
    A0 = rng.normal(size=(m, k)) * 0.1
    B0 = rng.normal(size=(n, k)) * 0.1
    C0 = rng.normal(size=(p, k)) * 0.1
    lam = 0.7
    ours = fit_collective_explicit_als(
        rows, cols, vals, m, n, k=k, lambda_=lam, niter=3,
        side_U=(ur, uc, uv, m, p, False, None),
        NA_as_zero_user=True,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True,
        dtype=np.float64,
        init={"A": A0, "B": B0, "C": C0,
              "biasA": np.zeros(m), "biasB": np.zeros(n)})
    ref = ref_fit_explicit_als(
        rows, cols, vals, m, n, k=k, lam=lam, niter=3,
        A0=A0, B0=B0, C0=C0, U_sp=(ur, uc, uv, m, p),
        NA_as_zero_U=True,
        w_main=1.0, w_user=0.5, use_cg=False, finalize_chol=False,
        user_bias=True, item_bias=True, center=True, center_U=True)
    np.testing.assert_allclose(np.asarray(ours["A"]), ref["A"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["B"]), ref["B"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours["C"]), ref["C"], atol=1e-9)


# --------------------------------------------------------------------- #
# precompute caches vs the binary (precompute_collective_explicit /     #
# precompute_collective_implicit, collective.c:10209 / :10487)          #
# --------------------------------------------------------------------- #


def _triu_close(ref_buf, ours_full, atol=1e-9):
    """syrk(Upper)-filled binary buffers only define the upper triangle."""
    np.testing.assert_allclose(np.triu(ref_buf), np.triu(ours_full),
                               rtol=1e-7, atol=atol)


def _chol_reconstruct(raw):
    """LAPACK potrf('L') on a row-major buffer writes the factor into the
    row-major UPPER triangle (column-major lower); R^T R recovers the
    matrix."""
    R = np.triu(raw)
    return R.T @ R


def test_precompute_explicit_caches_vs_binary():
    """Our build_precomputed caches == the binary's
    precompute_collective_explicit outputs, computed from the SAME fitted
    model (B/C/biasB as inputs).  Pins B_plus_bias, BtB, TransBtBinvBt,
    TransCtCinvCt, CtCw and BeTBeChol semantics including the k_item
    column offset and the bias fold-in (collective.c:10296)."""
    from cmfrec_tpu import CMF
    from cmfrec_tpu.solvers.warm import build_precomputed
    from .ref_binary import ref_precompute_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=11)
    p, q = 6, 5
    U = rng.normal(size=(m, p))
    I = rng.normal(size=(n, q))
    k, ku, ki, km = 4, 2, 1, 1
    lam, w_u = 0.6, 0.7
    model = CMF(k=k, k_user=ku, k_item=ki, k_main=km, lambda_=lam,
                w_user=w_u, niter=3, use_cg=False, use_float=False,
                verbose=False).fit_triplets(rows, cols, vals, m, n,
                                            U=U, I=I)
    ours = build_precomputed(model)
    ref = ref_precompute_collective_explicit(
        B=np.asarray(model.B_, np.float64), n=n,
        C=np.asarray(model.C_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_),
        k=k, k_user=ku, k_item=ki, k_main=km,
        user_bias=True, lam=lam, w_user=w_u)

    wb = ku + k + km + 1          # extended width incl. bias
    kb = k + km + 1               # B-system width incl. bias
    # B_plus_bias: binary keeps k_item cols; ours drops them and places
    # the rest at the k_user offset
    np.testing.assert_allclose(ref["B_plus_bias"][:, ki:],
                               ours["extB"][:, ku:wb], atol=1e-12)
    _triu_close(ref["BtB"], ours["BtB"][ku:ku + kb, ku:ku + kb])
    # ours stores the regularized Gram; the realized rows are
    # w_main * G^-1 B_i (w_main = 1 here)
    sol = np.linalg.solve(ours["TransBtBinvBt_G"], ours["extB"].T).T
    np.testing.assert_allclose(ref["TransBtBinvBt"], sol[:, ku:ku + kb],
                               rtol=1e-7, atol=1e-9)
    _triu_close(ref["CtCw"], ours["CtCw"][:ku + k, :ku + k])
    np.testing.assert_allclose(ref["TransCtCinvCt"],
                               ours["TransCtCinvCt"].T, rtol=1e-7,
                               atol=1e-9)
    ours_L = ours["BeTBeChol"][:wb, :wb]
    np.testing.assert_allclose(_chol_reconstruct(ref["BeTBeChol"]),
                               ours_L @ ours_L.T, rtol=1e-7, atol=1e-8)


def test_precompute_explicit_implicit_features_vs_binary():
    """add_implicit_features: BiTBi (w_implicit-scaled Bi Gram) and its
    inclusion in BeTBeChol; TransBtBinvBt is skipped by BOTH sides
    (collective.c:10370 gate)."""
    from cmfrec_tpu import CMF
    from cmfrec_tpu.solvers.warm import build_precomputed
    from .ref_binary import ref_precompute_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=12)
    p = 5
    U = rng.normal(size=(m, p))
    k, km = 4, 1
    lam, w_imp = 0.8, 0.45
    model = CMF(k=k, k_main=km, lambda_=lam, niter=3, use_cg=False,
                add_implicit_features=True, w_implicit=w_imp,
                use_float=False).fit_triplets(rows, cols, vals, m, n, U=U)
    ours = build_precomputed(model)
    assert "TransBtBinvBt_G" not in ours
    ref = ref_precompute_collective_explicit(
        B=np.asarray(model.B_, np.float64), n=n,
        C=np.asarray(model.C_, np.float64),
        Bi=np.asarray(model.Bi_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_),
        k=k, k_main=km, user_bias=True, lam=lam, w_implicit=w_imp)
    assert ref["TransBtBinvBt"] is None

    kiw = np.asarray(model.Bi_).shape[1]
    _triu_close(ref["BiTBi"][:kiw, :kiw], ours["BiTBi"][:kiw, :kiw])
    wb = k + km + 1
    ours_L = ours["BeTBeChol"][:wb, :wb]
    np.testing.assert_allclose(_chol_reconstruct(ref["BeTBeChol"]),
                               ours_L @ ours_L.T, rtol=1e-7, atol=1e-8)


def test_precompute_na0_btxbias_ctubias_vs_binary():
    """NA_as_zero: BtXbias = B^T(-mu - biasB) (collective.c:10300);
    NA_as_zero_U: CtUbias = -w_user C^T U_colmeans (:10466)."""
    import scipy.sparse as sp

    from cmfrec_tpu import CMF
    from cmfrec_tpu.solvers.warm import build_precomputed
    from .ref_binary import ref_precompute_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=13)
    p = 5
    u_mask = rng.uniform(size=(m, p)) < 0.5
    ur, uc = np.nonzero(u_mask)
    uv = rng.normal(size=ur.size)
    k, ku = 4, 2
    lam, w_u = 0.7, 0.6
    model = CMF(k=k, k_user=ku, lambda_=lam, w_user=w_u, niter=3,
                use_cg=False, NA_as_zero=True, NA_as_zero_user=True,
                use_float=False).fit_triplets(
                    rows, cols, vals, m, n,
                    U=sp.coo_matrix((uv, (ur, uc)), shape=(m, p)))
    ours = build_precomputed(model)
    ref = ref_precompute_collective_explicit(
        B=np.asarray(model.B_, np.float64), n=n,
        C=np.asarray(model.C_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_),
        U_colmeans=np.asarray(model.U_colmeans_, np.float64),
        NA_as_zero_X=True, NA_as_zero_U=True,
        k=k, k_user=ku, user_bias=True, lam=lam, w_user=w_u)

    kb = k + 1
    np.testing.assert_allclose(ref["BtXbias"],
                               ours["BtXbias"][ku:ku + kb],
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ref["CtUbias"], ours["CtUbias"],
                               rtol=1e-7, atol=1e-9)


def test_precompute_wmain_scaling_vs_binary():
    """w_main != 1: the binary normalizes the whole system by w_main
    (lam/=w_main, w_user/=w_main, collective.c:10248); our caches keep the
    unnormalized form, so binary == ours/w_main everywhere."""
    from cmfrec_tpu import CMF
    from cmfrec_tpu.solvers.warm import build_precomputed
    from .ref_binary import ref_precompute_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=14)
    p = 5
    U = rng.normal(size=(m, p))
    k, ku = 3, 1
    lam, w_m, w_u = 0.9, 2.0, 0.7
    model = CMF(k=k, k_user=ku, lambda_=lam, w_main=w_m, w_user=w_u,
                niter=3, use_cg=False, use_float=False).fit_triplets(
                    rows, cols, vals, m, n, U=U)
    ours = build_precomputed(model)
    ref = ref_precompute_collective_explicit(
        B=np.asarray(model.B_, np.float64), n=n,
        C=np.asarray(model.C_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_),
        k=k, k_user=ku, user_bias=True, lam=lam,
        w_main=w_m, w_user=w_u)

    wb = ku + k + 1
    kb = k + 1
    # binary BtB is the raw Gram (computed before normalization)
    _triu_close(ref["BtB"], ours["BtB"][ku:ku + kb, ku:ku + kb])
    # binary solves (BtB + lam/w_m)^-1 B_i == w_m * (w_m BtB + lam)^-1 B_i
    sol = w_m * np.linalg.solve(ours["TransBtBinvBt_G"], ours["extB"].T).T
    np.testing.assert_allclose(ref["TransBtBinvBt"], sol[:, ku:ku + kb],
                               rtol=1e-7, atol=1e-9)
    _triu_close(ref["CtCw"], ours["CtCw"][:ku + k, :ku + k] / w_m)
    np.testing.assert_allclose(ref["TransCtCinvCt"],
                               ours["TransCtCinvCt"].T, rtol=1e-7,
                               atol=1e-9)
    ours_L = ours["BeTBeChol"][:wb, :wb]
    np.testing.assert_allclose(_chol_reconstruct(ref["BeTBeChol"]) * w_m,
                               ours_L @ ours_L.T, rtol=1e-7, atol=1e-8)


def test_precompute_implicit_caches_vs_binary():
    """precompute_collective_implicit (collective.c:10487): the binary
    stores lam-regularized, w-normalized Grams; ours keep the raw Gram +
    weights, related by BtB_bin = (w_eff*BtB + lam I)/w_eff with
    w_eff = w_main * w_main_multiplier."""
    from cmfrec_tpu import CMF_implicit
    from cmfrec_tpu.solvers.warm import build_precomputed
    from .ref_binary import ref_precompute_collective_implicit

    rng, rows, cols, vals, m, n = _data(seed=15)
    vals = np.abs(vals) + 0.5
    p = 5
    U = rng.normal(size=(m, p))
    k, ku, km = 4, 2, 1
    lam, w_u, alpha = 0.8, 0.7, 2.0
    model = CMF_implicit(k=k, k_user=ku, k_main=km, lambda_=lam,
                         w_user=w_u, alpha=alpha, niter=3, use_cg=False,
                         use_float=False).fit_triplets(
                             rows, cols, vals, m, n, U=U)
    ours = build_precomputed(model)
    w_eff = float(getattr(model, "w_main", 1.0)) * float(
        model.w_main_multiplier_)
    ref = ref_precompute_collective_implicit(
        B=np.asarray(model.B_, np.float64), n=n,
        C=np.asarray(model.C_, np.float64),
        k=k, k_user=ku, k_main=km, lam=lam, w_user=w_u,
        w_main_multiplier=float(model.w_main_multiplier_))

    kb = k + km
    ke = ku + k + km
    BtB_ours = ours["BtB"][ku:ku + kb, ku:ku + kb]
    _triu_close(ref["BtB"], BtB_ours + (lam / w_eff) * np.eye(kb))
    CtC = ours["CtC"][:ku + k, :ku + k]
    expected = np.zeros((ke, ke))
    expected[ku:, ku:] += w_eff * ours["BtB"][ku:ku + kb, ku:ku + kb]
    expected[:ku + k, :ku + k] += w_u * CtC
    expected += lam * np.eye(ke)
    expected /= w_eff
    _triu_close(ref["BeTBe"], expected)
    np.testing.assert_allclose(_chol_reconstruct(ref["BeTBeChol"]),
                               expected, rtol=1e-7, atol=1e-8)


# --------------------------------------------------------------------- #
# batch inference vs the binary (factors_*_multiple, predict_X_old)     #
# --------------------------------------------------------------------- #


def test_factors_explicit_multiple_vs_binary():
    """Batch warm factors for new users (X COO + dense side U + biases)
    == factors_collective_explicit_multiple (collective.c:10865) with no
    precomputed inputs."""
    import scipy.sparse as sp

    from cmfrec_tpu import CMF
    from .ref_binary import ref_factors_collective_explicit_multiple

    rng, rows, cols, vals, m, n = _data(seed=21)
    p = 5
    U = rng.normal(size=(m, p))
    k, ku, km = 4, 2, 1
    lam, w_u = 0.7, 0.6
    model = CMF(k=k, k_user=ku, k_main=km, lambda_=lam, w_user=w_u,
                niter=3, use_cg=False, use_float=False).fit_triplets(
                    rows, cols, vals, m, n, U=U)

    R = 7
    new_mask = rng.uniform(size=(R, n)) < 0.4
    nr, nc = np.nonzero(new_mask)
    nv = 3.0 + rng.normal(size=nr.size)
    U_new = rng.normal(size=(R, p))
    Xnew = sp.coo_matrix((nv, (nr, nc)), shape=(R, n))

    a_ours, bias_ours = model.factors_multiple(X=Xnew, U=U_new,
                                               return_bias=True)
    ref = ref_factors_collective_explicit_multiple(
        m_new=R, rows=nr, cols=nc, vals=nv, n=n,
        B=np.asarray(model.B_, np.float64), k=k, lam=lam,
        U=U_new, C=np.asarray(model.C_, np.float64),
        U_colmeans=np.asarray(model.U_colmeans_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_), user_bias=True,
        k_user=ku, k_main=km, w_user=w_u)
    np.testing.assert_allclose(np.asarray(a_ours), ref["A"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(bias_ours), ref["biasA"],
                               rtol=1e-6, atol=1e-8)


def test_factors_implicit_multiple_vs_binary():
    """Batch implicit factors (X COO + dense side U) ==
    factors_collective_implicit_multiple (collective.c:11176)."""
    import scipy.sparse as sp

    from cmfrec_tpu import CMF_implicit
    from .ref_binary import ref_factors_collective_implicit_multiple

    rng, rows, cols, vals, m, n = _data(seed=22)
    vals = np.abs(vals) + 0.5
    p = 5
    U = rng.normal(size=(m, p))
    k, ku = 4, 2
    lam, w_u, alpha = 0.9, 0.7, 2.0
    model = CMF_implicit(k=k, k_user=ku, lambda_=lam, w_user=w_u,
                         alpha=alpha, niter=3, use_cg=False,
                         use_float=False).fit_triplets(
                             rows, cols, vals, m, n, U=U)

    R = 6
    new_mask = rng.uniform(size=(R, n)) < 0.4
    nr, nc = np.nonzero(new_mask)
    nv = np.abs(rng.normal(size=nr.size)) + 0.5
    U_new = rng.normal(size=(R, p))
    Xnew = sp.coo_matrix((nv, (nr, nc)), shape=(R, n))

    a_ours = model.factors_multiple(X=Xnew, U=U_new)
    ref = ref_factors_collective_implicit_multiple(
        m_new=R, rows=nr, cols=nc, vals=nv, n=n,
        B=np.asarray(model.B_, np.float64), k=k, lam=lam, alpha=alpha,
        U=U_new, C=np.asarray(model.C_, np.float64),
        U_colmeans=np.asarray(model.U_colmeans_, np.float64),
        k_user=ku, w_user=w_u,
        w_main_multiplier=float(model.w_main_multiplier_))
    np.testing.assert_allclose(np.asarray(a_ours), ref,
                               rtol=1e-6, atol=1e-8)


def test_predict_pairs_vs_binary():
    """predict() on (user, item) id arrays — including OUT-OF-RANGE ids,
    which fall back to glob_mean + whichever bias IS valid — matches
    predict_X_old_collective_explicit (collective.c:11797) when
    k_main=0.  (For k_main>0 see the defect replica below.)"""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_predict_X_old_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=23)
    k, ku = 4, 1
    model = CMF(k=k, k_user=ku, lambda_=0.8, niter=3,
                use_cg=False, use_float=False).fit_triplets(
                    rows, cols, vals, m, n,
                    U=rng.normal(size=(m, 4)))
    uu = np.array([0, 3, 5, m + 4, 2, m + 9, 7])
    ii = np.array([1, 4, n + 2, 0, 6, n + 5, 3])
    ref = ref_predict_X_old_collective_explicit(
        row=uu, col=ii,
        A=np.asarray(model.A_, np.float64),
        B=np.asarray(model.B_, np.float64),
        biasA=np.asarray(model.user_bias_, np.float64),
        biasB=np.asarray(model.item_bias_, np.float64),
        glob_mean=float(model.glob_mean_),
        k=k, k_user=ku, m=m, n_max=n)
    ours = model.predict(uu, ii)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-7,
                               atol=1e-9)


def test_predict_kmain_defect_documented():
    """REFERENCE DEFECT 7 (replica-pinned, not copied): predict_multiple
    dots over k coords ONLY (common.c:5066 `cblas_tdot(k, ...)`), while
    topN scores with k_pred = k + k_main (common.c's topN) and the fit
    trains the k_main coords against X.  The shipped package's .predict()
    (cmfrec/__init__.py:1253 -> predict_X_old_collective_explicit)
    therefore DISAGREES with its own .topN() ranking whenever k_main > 0.
    Ours includes k_main in both, matching the model objective and the
    reference's own topN."""
    from cmfrec_tpu import CMF
    from .ref_binary import ref_predict_X_old_collective_explicit

    rng, rows, cols, vals, m, n = _data(seed=24)
    k, ku, km = 4, 1, 2
    model = CMF(k=k, k_user=ku, k_main=km, lambda_=0.8, niter=3,
                use_cg=False, use_float=False).fit_triplets(
                    rows, cols, vals, m, n,
                    U=rng.normal(size=(m, 4)))
    A = np.asarray(model.A_, np.float64)
    B = np.asarray(model.B_, np.float64)
    ua = np.asarray(model.user_bias_, np.float64)
    ib = np.asarray(model.item_bias_, np.float64)
    uu = np.array([0, 3, 5, 2, 7])
    ii = np.array([1, 4, 2, 6, 3])
    ref = ref_predict_X_old_collective_explicit(
        row=uu, col=ii, A=A, B=B, biasA=ua, biasB=ib,
        glob_mean=float(model.glob_mean_),
        k=k, k_user=ku, k_main=km, m=m, n_max=n)

    # replica of the binary semantics: dot over k coords only
    replica = (np.einsum("rk,rk->r", A[uu, ku:ku + k], B[ii, :k])
               + ua[uu] + ib[ii] + model.glob_mean_)
    np.testing.assert_allclose(ref, replica, rtol=1e-10, atol=1e-12)

    # ours = the intended semantics (all k+k_main shared coords), which
    # equals the score the binary's own topN ranks by
    intended = (np.einsum("rk,rk->r", A[uu, ku:], B[ii, :])
                + ua[uu] + ib[ii] + model.glob_mean_)
    ours = model.predict(uu, ii)
    np.testing.assert_allclose(np.asarray(ours), intended, rtol=1e-7,
                               atol=1e-9)
    assert np.max(np.abs(ref - intended)) > 1e-3  # the defect is material
