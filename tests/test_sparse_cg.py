"""Parity tests for the fused bucket-CG Pallas kernel (interpret mode)
against ops/rowsolve.solve_cg — the oracle the bucketed engine used before
the kernel existed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmfrec_tpu.ops.rowsolve import SparsePart, solve_cg
from cmfrec_tpu.ops.sparse_cg import bucket_cg, row_tile


def make_bucket(rng, R=64, L=16, S=96, K=8, implicit=False):
    mat = rng.normal(size=(S, K)).astype(np.float32)
    idx = rng.integers(0, S, size=(R, L)).astype(np.int32)
    length = rng.integers(0, L + 1, size=R).astype(np.int32)
    msk = (np.arange(L)[None, :] < length[:, None]).astype(np.float32)
    if implicit:
        x = rng.uniform(1, 10, size=(R, L)).astype(np.float32)
        cw = 0.7 * x * msk
        cv = (1.0 + 0.7 * x) * msk
    else:
        val = rng.normal(size=(R, L)).astype(np.float32)
        cw = msk
        cv = val * msk
    return mat, idx, cw, cv


def test_row_tile_divides():
    for R in (8, 64, 85232, 131072, 94744, 304, 16):
        for L in (8, 64, 512, 1024):
            tr = row_tile(R, L)
            assert R % tr == 0
            assert tr % 8 == 0 or tr == R


@pytest.mark.parametrize("implicit", [False, True])
@pytest.mark.parametrize("steps", [1, 3])
def test_bucket_cg_matches_solve_cg(rng, implicit, steps):
    mat, idx, cw, cv, = make_bucket(rng, implicit=implicit)
    K = mat.shape[1]
    R = idx.shape[0]
    lam_vec = jnp.full(K, 1.3, jnp.float32)
    a0 = jnp.asarray(0.1 * rng.normal(size=(R, K)).astype(np.float32))
    G0 = jnp.asarray(mat.T @ mat) if implicit else None
    part = SparsePart(jnp.asarray(mat), jnp.asarray(idx), jnp.asarray(cw),
                      jnp.asarray(cv))
    want = np.asarray(solve_cg([part], lam_vec, a0, n_steps=steps, G0=G0))

    import cmfrec_tpu.ops.sparse_cg as sc

    ms = jnp.take(jnp.asarray(mat), jnp.asarray(idx), axis=0)
    gfix = (G0 + jnp.diag(lam_vec)) if G0 is not None else jnp.diag(lam_vec)
    got = np.asarray(bucket_cg(ms, jnp.asarray(cw), jnp.asarray(cv), gfix,
                               None, None, a0, n_steps=steps,
                               interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bucket_cg_with_r0_and_lam_row(rng):
    """Per-row lambda (scale_lam) + rhs base (na0/dense-side) variant."""
    mat, idx, cw, cv = make_bucket(rng)
    K = mat.shape[1]
    R = idx.shape[0]
    lam_vec = jnp.full(K, 0.4, jnp.float32)
    lam_mult = jnp.asarray(
        np.maximum(rng.integers(1, 20, R), 1).astype(np.float32))
    r0 = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32))
    a0 = jnp.zeros((R, K), jnp.float32)
    part = SparsePart(jnp.asarray(mat), jnp.asarray(idx), jnp.asarray(cw),
                      jnp.asarray(cv))
    want = np.asarray(solve_cg([part], lam_vec, a0, n_steps=4,
                               lam_mult=lam_mult, r0=r0))
    ms = jnp.take(jnp.asarray(mat), jnp.asarray(idx), axis=0)
    lam_row = lam_vec[None, :] * lam_mult[:, None]
    gfix = jnp.zeros((K, K), jnp.float32)
    got = np.asarray(bucket_cg(ms, jnp.asarray(cw), jnp.asarray(cv), gfix,
                               lam_row, r0, a0, n_steps=4, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("implicit", [False, True])
def test_bucket_cg_packed_matches_solve_cg(rng, implicit):
    """Pack-2 layout (two entries per 128-lane row) must reproduce the
    plain CG solution."""
    from cmfrec_tpu.ops.sparse_cg import bucket_cg_packed

    mat, idx, cw, cv = make_bucket(rng, R=64, L=16, S=96, K=8,
                                   implicit=implicit)
    K = mat.shape[1]
    R, L = idx.shape
    lam_vec = jnp.full(K, 1.1, jnp.float32)
    a0 = jnp.asarray(0.05 * rng.normal(size=(R, K)).astype(np.float32))
    G0 = jnp.asarray(mat.T @ mat) if implicit else None
    part = SparsePart(jnp.asarray(mat), jnp.asarray(idx), jnp.asarray(cw),
                      jnp.asarray(cv))
    want = np.asarray(solve_cg([part], lam_vec, a0, n_steps=3, G0=G0))

    K2 = 64
    mat64 = np.zeros((mat.shape[0], K2), np.float32)
    mat64[:, :K] = mat
    ms = jnp.take(jnp.asarray(mat64), jnp.asarray(idx), axis=0)
    ms2 = jnp.concatenate([ms[:, 0::2, :], ms[:, 1::2, :]], axis=2)
    gfix = np.zeros((K2, K2), np.float32)
    gfix[:K, :K] = (np.asarray(G0) if G0 is not None else 0.0) + np.diag(
        np.full(K, 1.1, np.float32))
    a064 = jnp.pad(a0, ((0, 0), (0, K2 - K)))
    got = np.asarray(bucket_cg_packed(
        ms2, jnp.asarray(cw[:, 0::2]), jnp.asarray(cw[:, 1::2]),
        jnp.asarray(cv[:, 0::2]), jnp.asarray(cv[:, 1::2]),
        jnp.asarray(gfix), None, None, a064, n_steps=3,
        interpret=True))[:, :K]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bucket_cg_bf16_close_to_f32(rng):
    """bf16 slab matches the XLA mxu_bf16 path closely."""
    mat, idx, cw, cv = make_bucket(rng, R=32, L=8, S=48, K=8)
    K = mat.shape[1]
    R = idx.shape[0]
    lam_vec = jnp.full(K, 1.0, jnp.float32)
    a0 = jnp.zeros((R, K), jnp.float32)
    part = SparsePart(jnp.asarray(mat), jnp.asarray(idx), jnp.asarray(cw),
                      jnp.asarray(cv))
    want = np.asarray(solve_cg([part], lam_vec, a0, n_steps=3,
                               mxu_bf16=True))
    ms = jnp.take(jnp.asarray(mat).astype(jnp.bfloat16), jnp.asarray(idx),
                  axis=0)
    got = np.asarray(bucket_cg(ms, jnp.asarray(cw), jnp.asarray(cv),
                               jnp.diag(lam_vec), None, None, a0,
                               n_steps=3, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
