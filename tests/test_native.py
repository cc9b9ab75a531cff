"""Native C++ data layer vs the NumPy fallback — bitwise layout parity."""

import os

import numpy as np
import pytest

from cmfrec_tpu import native
from cmfrec_tpu.data.shards import build_bucketed_rows


def _random_coo(rng, m, n, nnz, weights=False):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    wgt = rng.uniform(0.5, 2.0, size=nnz) if weights else None
    return rows, cols, vals, wgt


def test_native_lib_compiles():
    lib = native.get_lib()
    assert lib is not None, "native layer failed to compile — g++ expected"
    assert lib.omp_max_threads() >= 1


@pytest.mark.parametrize("weights", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_csr_from_coo_matches_numpy(rng, weights, dtype):
    m, n, nnz = 300, 120, 5000
    rows, cols, vals, wgt = _random_coo(rng, m, n, nnz, weights)
    out = native.csr_from_coo(rows, cols, vals, wgt, m, dtype)
    assert out is not None
    counts, indptr, c_cols, c_vals, c_wgt = out
    np.testing.assert_array_equal(counts, np.bincount(rows, minlength=m))
    np.testing.assert_array_equal(indptr, np.concatenate(
        [[0], np.cumsum(counts)]))
    order = np.argsort(rows, kind="stable")
    np.testing.assert_array_equal(c_cols, cols[order].astype(np.int32))
    np.testing.assert_allclose(c_vals, vals[order].astype(dtype), rtol=0)
    if weights:
        np.testing.assert_allclose(c_wgt, wgt[order].astype(dtype), rtol=0)


@pytest.mark.parametrize("weights", [False, True])
def test_csr_wire_from_coo_matches_reference(rng, weights):
    """The fused wire-ready distribution (single pass emitting split ids
    + round-to-nearest-even bf16 values) must equal the compose-by-hand
    reference: stable row sort, lo16/hi8 split, numpy/ml_dtypes bf16."""
    import jax.numpy as jnp

    m, n, nnz = 300, 70000, 5000  # n > 2**16: exercises the hi byte
    rows, cols, vals, wgt = _random_coo(rng, m, n, nnz, weights)
    out = native.csr_wire_from_coo(rows, cols, vals, wgt, m, n)
    assert out is not None
    counts, indptr, lo, hi, vb, wb, col_counts = out
    np.testing.assert_array_equal(counts, np.bincount(rows, minlength=m))
    np.testing.assert_array_equal(col_counts,
                                  np.bincount(cols, minlength=n))
    np.testing.assert_array_equal(indptr, np.concatenate(
        [[0], np.cumsum(counts)]))
    order = np.argsort(rows, kind="stable")
    c32 = cols[order].astype(np.int32)
    np.testing.assert_array_equal(lo, (c32 & 0xFFFF).astype(np.uint16))
    np.testing.assert_array_equal(hi, (c32 >> 16).astype(np.uint8))
    # reassembled ids round-trip
    np.testing.assert_array_equal(
        lo.astype(np.int32) | (hi.astype(np.int32) << 16), c32)
    # bf16 rounding matches ml_dtypes (round-to-nearest-even)
    ref_v = vals[order].astype(np.float32).astype(jnp.bfloat16)
    np.testing.assert_array_equal(vb.view(jnp.bfloat16), ref_v)
    if weights:
        ref_w = wgt[order].astype(np.float32).astype(jnp.bfloat16)
        np.testing.assert_array_equal(wb.view(jnp.bfloat16), ref_w)


def test_degree_order_matches_numpy(rng):
    counts = rng.integers(0, 50, 1000).astype(np.int64)
    order = native.degree_order(counts)
    ref = np.argsort(-counts, kind="stable")
    np.testing.assert_array_equal(order, ref)


@pytest.mark.parametrize("weights", [False, True])
def test_bucketed_layout_native_vs_numpy(rng, weights, monkeypatch):
    """The full bucketed structure must be identical with and without the
    native layer (the engines consume it blindly)."""
    m, n, nnz = 500, 200, 8000
    rows, cols, vals, wgt = _random_coo(rng, m, n, nnz, weights)
    # add some empty + heavy rows
    rows[rows == 7] = 3
    nat = build_bucketed_rows(rows, cols, vals, m, n, wgt, dtype=np.float32)

    real_get_lib = native.get_lib
    monkeypatch.setattr(native, "get_lib", lambda: None)
    ref = build_bucketed_rows(rows, cols, vals, m, n, wgt, dtype=np.float32)
    monkeypatch.setattr(native, "get_lib", real_get_lib)

    assert nat.n_rows_pad == ref.n_rows_pad
    np.testing.assert_array_equal(nat.perm, ref.perm)
    np.testing.assert_array_equal(nat.row_of, ref.row_of)
    assert len(nat.buckets) == len(ref.buckets)
    for bn, br in zip(nat.buckets, ref.buckets):
        assert bn.shape_key == br.shape_key
        np.testing.assert_array_equal(np.asarray(bn.idx), np.asarray(br.idx))
        np.testing.assert_array_equal(np.asarray(bn.length),
                                      np.asarray(br.length))
        np.testing.assert_allclose(np.asarray(bn.val), np.asarray(br.val))
        if weights:
            np.testing.assert_allclose(np.asarray(bn.wgt), np.asarray(br.wgt))


@pytest.mark.parametrize("weights", [False, True])
@pytest.mark.parametrize("raw_upload", ["1", "0", "sorted"])
def test_device_fill_matches_host_layout(rng, weights, raw_upload,
                                         monkeypatch):
    """Device-built buckets hold the same per-row (idx, val) SETS as the
    host builder (within-row order may differ; systems are identical) —
    for the raw-COO device-sort path, the CSR-upload path, and the
    pre-sorted-input fast path (no row upload, no sort)."""
    monkeypatch.setenv("CMFREC_TPU_RAW_UPLOAD",
                       "1" if raw_upload == "sorted" else raw_upload)
    from cmfrec_tpu.data.device_fill import build_bucketed_pair_device

    m, n, nnz = 300, 150, 5000
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    if raw_upload == "sorted":  # CSR-ordered input hits the no-sort path
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
    wgt = rng.uniform(0.5, 2.0, size=nnz) if weights else None
    RB_d, CB_d = build_bucketed_pair_device(rows, cols, vals, m, n, wgt,
                                            dtype=np.float32)
    RB_h = build_bucketed_rows(rows, cols, vals, m, n, wgt, dtype=np.float32)
    CB_h = build_bucketed_rows(cols, rows, vals, n, m, wgt, dtype=np.float32)

    for Bd, Bh in ((RB_d, RB_h), (CB_d, CB_h)):
        assert Bd.n_rows_pad == Bh.n_rows_pad
        np.testing.assert_array_equal(Bd.perm, Bh.perm)
        np.testing.assert_array_equal(Bd.row_of, Bh.row_of)
        assert len(Bd.buckets) == len(Bh.buckets)
        for bd, bh in zip(Bd.buckets, Bh.buckets):
            assert bd.shape_key == bh.shape_key
            np.testing.assert_array_equal(np.asarray(bd.length),
                                          np.asarray(bh.length))
            id_d, id_h = np.asarray(bd.idx), np.asarray(bh.idx)
            v_d, v_h = np.asarray(bd.val), np.asarray(bh.val)
            # compare per-row multisets via sort by (idx, val)
            od = np.lexsort((v_d, id_d), axis=-1)
            oh = np.lexsort((v_h, id_h), axis=-1)
            np.testing.assert_array_equal(
                np.take_along_axis(id_d, od, 1),
                np.take_along_axis(id_h, oh, 1))
            # f32 values ship to device as bf16 (deliberate ~0.4% trade)
            np.testing.assert_allclose(
                np.take_along_axis(v_d, od, 1),
                np.take_along_axis(v_h, oh, 1), rtol=4.5e-3, atol=1e-6)
            if weights:
                w_d = np.take_along_axis(np.asarray(bd.wgt), od, 1)
                w_h = np.take_along_axis(np.asarray(bh.wgt), oh, 1)
                np.testing.assert_allclose(w_d, w_h, rtol=4.5e-3, atol=1e-6)


def test_optimal_boundaries_invariants(rng):
    """DP planner: invalid max_chunks raises (no infinite backtrack);
    valid plans tile [0, n) contiguously with lane-rounded widths that
    cover every row's degree, even on long-tailed degree profiles that
    trigger BOTH candidate subsamplings."""
    from cmfrec_tpu.data.shards import _optimal_boundaries

    with pytest.raises(ValueError, match="max_chunks"):
        _optimal_boundaries(np.array([5, 3, 1]), 8, 8, 0)
    with pytest.raises(ValueError, match="max_chunks"):
        _optimal_boundaries(np.array([5, 3, 1]), 8, 8, -2)

    # power-law degrees with a long distinct head (>400 candidates)
    deg = np.sort(rng.zipf(1.3, 20000).astype(np.int64))[::-1]
    deg = np.minimum(deg, 500000)
    for max_chunks in (1, 3, 12):
        plan = _optimal_boundaries(deg, 8, 8, max_chunks)
        assert 1 <= len(plan) <= max_chunks
        assert plan[0][0] == 0 and plan[-1][1] == deg.size
        for (s, e, w), nxt in zip(plan, plan[1:] + [None]):
            assert e > s
            if nxt is not None:
                assert nxt[0] == e
            assert w % 8 == 0 and w >= 8
            assert w >= deg[s:e].max()


@pytest.mark.parametrize("weights", [False, True])
def test_chunked_wire_build_matches_single_pass(rng, weights, monkeypatch):
    """The chunked overlapped wire build (coo_hist + per-row-range
    coo_fill_wire_range + device record decode) produces bitwise the same
    buckets as the single-pass csr_wire_from_coo path."""
    from cmfrec_tpu.data.device_fill import build_bucketed_pair_device

    m, n, nnz = 400, 170, 9000
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    # unsorted rows so neither run takes the pre-sorted fast path
    if rows[0] < rows[-1]:
        rows[0], rows[-1] = rows[-1], rows[0]
    vals = rng.normal(size=nnz)
    wgt = rng.uniform(0.5, 2.0, size=nnz) if weights else None

    monkeypatch.setenv("CMFREC_TPU_WIRE_OVERLAP", "0")
    R1, C1 = build_bucketed_pair_device(rows, cols, vals, m, n, wgt,
                                        dtype=np.float32)
    monkeypatch.setenv("CMFREC_TPU_WIRE_OVERLAP", "1")
    # rec bytes = 9000*5 = 45k -> chunk 0.01 MB gives ~4 chunks
    monkeypatch.setenv("CMFREC_TPU_WIRE_CHUNK_MB", "0.01")
    R2, C2 = build_bucketed_pair_device(rows, cols, vals, m, n, wgt,
                                        dtype=np.float32)
    for B1, B2 in ((R1, R2), (C1, C2)):
        np.testing.assert_array_equal(B1.perm, B2.perm)
        assert len(B1.buckets) == len(B2.buckets)
        for b1, b2 in zip(B1.buckets, B2.buckets):
            np.testing.assert_array_equal(np.asarray(b1.idx),
                                          np.asarray(b2.idx))
            np.testing.assert_array_equal(np.asarray(b1.val),
                                          np.asarray(b2.val))
            np.testing.assert_array_equal(np.asarray(b1.length),
                                          np.asarray(b2.length))
            if weights:
                np.testing.assert_array_equal(np.asarray(b1.wgt),
                                              np.asarray(b2.wgt))
