"""Mid-fit periodic checkpointing (utils/checkpoint.py): the saved state
maps onto init= so that resume(checkpoint, niter=remaining) reproduces the
uninterrupted fit exactly (the fits are deterministic functions of the
factor state — glob_mean/centering recompute identically from the data)."""

import numpy as np
import pytest

from cmfrec_tpu.utils.checkpoint import load_fit_checkpoint


def _data(seed=0, m=40, n=25, density=0.4):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(m, n)) < density
    rows, cols = np.nonzero(mask)
    vals = 3.0 + rng.normal(size=rows.size)
    return rng, rows, cols, vals, m, n


@pytest.mark.parametrize("engine", ["sparse", "dense"])
def test_explicit_checkpoint_resume(tmp_path, engine):
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    _, rows, cols, vals, m, n = _data(seed=1)
    path = str(tmp_path / "ck.npz")
    kw = dict(k=4, lambda_=0.5, use_cg=True, max_cg_steps=3,
              finalize_chol=True, user_bias=True, item_bias=True,
              center=True, engine=engine, dtype=np.float64, seed=3)

    full = fit_explicit_als(rows, cols, vals, m, n, niter=6, **kw)
    half = fit_explicit_als(rows, cols, vals, m, n, niter=6,
                            checkpoint_path=path, checkpoint_every=3, **kw)
    init, done = load_fit_checkpoint(path)
    assert done == 3
    assert set(init) >= {"A", "B", "biasA", "biasB"}
    resumed = fit_explicit_als(rows, cols, vals, m, n, niter=3,
                               init=init, **kw)
    for key in ("A", "B", "biasA", "biasB"):
        np.testing.assert_allclose(
            np.asarray(resumed[key]), np.asarray(full[key]),
            atol=1e-10, err_msg=key)
        np.testing.assert_allclose(
            np.asarray(half[key]), np.asarray(full[key]),
            atol=1e-10, err_msg=key + " (checkpointing changed the fit)")


def test_implicit_checkpoint_resume(tmp_path):
    from cmfrec_tpu.solvers.drivers import fit_implicit_als

    rng = np.random.default_rng(2)
    m, n, nnz = 40, 25, 300
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    key = rows * n + cols
    _, uix = np.unique(key, return_index=True)
    rows, cols = rows[uix], cols[uix]
    vals = rng.uniform(1, 10, rows.size)
    path = str(tmp_path / "ck.npz")
    kw = dict(k=4, lambda_=0.9, alpha=2.0, use_cg=True,
              finalize_chol=True, dtype=np.float64, seed=3)

    full = fit_implicit_als(rows, cols, vals, m, n, niter=6, **kw)
    fit_implicit_als(rows, cols, vals, m, n, niter=6,
                     checkpoint_path=path, checkpoint_every=2, **kw)
    init, done = load_fit_checkpoint(path)
    assert done == 4  # saved at 2 and 4; 6 is the fit's own return
    resumed = fit_implicit_als(rows, cols, vals, m, n, niter=2,
                               init=init, **kw)
    for key in ("A", "B"):
        np.testing.assert_allclose(
            np.asarray(resumed[key]), np.asarray(full[key]),
            atol=1e-10, err_msg=key)


def test_collective_checkpoint_resume(tmp_path):
    from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

    rng, rows, cols, vals, m, n = _data(seed=3)
    p = 5
    U = rng.normal(size=(m, p))
    path = str(tmp_path / "ck.npz")
    kw = dict(k=4, lambda_=0.5, w_user=0.6, use_cg=False,
              add_implicit_features=True, w_implicit=0.4,
              user_bias=True, item_bias=True, center=True,
              side_U=(None, None, None, m, p, True, U),
              dtype=np.float64, seed=3)

    full = fit_collective_explicit_als(rows, cols, vals, m, n, niter=6, **kw)
    fit_collective_explicit_als(rows, cols, vals, m, n, niter=6,
                                checkpoint_path=path, checkpoint_every=4,
                                **kw)
    init, done = load_fit_checkpoint(path)
    assert done == 4
    assert set(init) >= {"A", "B", "C", "Ai", "Bi", "biasA", "biasB"}
    resumed = fit_collective_explicit_als(rows, cols, vals, m, n, niter=2,
                                          init=init, **kw)
    for key in ("A", "B", "C", "Ai", "Bi", "biasA", "biasB"):
        np.testing.assert_allclose(
            np.asarray(resumed[key]), np.asarray(full[key]),
            atol=1e-10, err_msg=key)


def test_collective_implicit_checkpoint_resume(tmp_path):
    from cmfrec_tpu.solvers.collective import fit_collective_implicit_als

    rng = np.random.default_rng(4)
    m, n, p, nnz = 40, 25, 5, 300
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    key = rows * n + cols
    _, uix = np.unique(key, return_index=True)
    rows, cols = rows[uix], cols[uix]
    vals = rng.uniform(1, 10, rows.size)
    U = rng.normal(size=(m, p))
    path = str(tmp_path / "ck.npz")
    kw = dict(k=4, lambda_=0.9, alpha=2.0, w_user=0.6, use_cg=False,
              side_U=(None, None, None, m, p, True, U),
              dtype=np.float64, seed=3)

    full = fit_collective_implicit_als(rows, cols, vals, m, n, niter=6, **kw)
    fit_collective_implicit_als(rows, cols, vals, m, n, niter=6,
                                checkpoint_path=path, checkpoint_every=3,
                                **kw)
    init, done = load_fit_checkpoint(path)
    assert done == 3
    resumed = fit_collective_implicit_als(rows, cols, vals, m, n, niter=3,
                                          init=init, **kw)
    for key in ("A", "B", "C"):
        np.testing.assert_allclose(
            np.asarray(resumed[key]), np.asarray(full[key]),
            atol=1e-10, err_msg=key)


def test_model_level_checkpoint(tmp_path):
    """CMF/CMF_implicit expose checkpoint_path/checkpoint_every (extension
    over the reference surface) and resume through the drivers' init=."""
    from cmfrec_tpu import CMF, CMF_implicit

    rng, rows, cols, vals, m, n = _data(seed=6)
    U = rng.normal(size=(m, 5))
    path = str(tmp_path / "cmf.npz")
    model = CMF(k=4, lambda_=0.5, niter=6, use_cg=False, use_float=False,
                checkpoint_path=path, checkpoint_every=2,
                random_state=3).fit_triplets(rows, cols, vals, m, n, U=U)
    init, done = load_fit_checkpoint(path)
    assert done == 4 and "C" in init
    assert np.isfinite(np.asarray(model.A_)).all()

    path2 = str(tmp_path / "cmfi.npz")
    mask = rng.uniform(size=(m, n)) < 0.3
    ir, ic = np.nonzero(mask)
    iv = rng.uniform(1, 10, ir.size)
    CMF_implicit(k=4, lambda_=0.9, niter=5, use_cg=False, use_float=False,
                 checkpoint_path=path2, checkpoint_every=2,
                 random_state=3).fit_triplets(ir, ic, iv, m, n)
    init2, done2 = load_fit_checkpoint(path2)
    assert done2 == 4 and set(init2) >= {"A", "B"}


def test_checkpoint_atomic_and_overwritten(tmp_path):
    """Each save atomically replaces the file; no .tmp remnants."""
    import os

    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    _, rows, cols, vals, m, n = _data(seed=5)
    path = str(tmp_path / "ck.npz")
    fit_explicit_als(rows, cols, vals, m, n, niter=5, k=3, lambda_=0.5,
                     use_cg=False, user_bias=False, item_bias=False,
                     engine="sparse", dtype=np.float64,
                     checkpoint_path=path, checkpoint_every=1)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    _, done = load_fit_checkpoint(path)
    assert done == 4  # iterations 1..4 each overwrote; 5 is the return
