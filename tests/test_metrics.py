"""Metrics oracle tests (P@k / MAP@k definitions vs hand computation)."""

import numpy as np
import pytest

from cmfrec_tpu.utils.metrics import map_at_k, precision_at_k, rmse


class FakeModel:
    """topN returns a fixed ranking per user."""

    def __init__(self, rankings):
        self.rankings = rankings

    def topN(self, user, n=10, exclude=None):
        r = [i for i in self.rankings[user]
             if exclude is None or i not in set(np.asarray(exclude))]
        return np.asarray(r[:n])


def test_rmse_weighted():
    p = np.array([1.0, 2.0, 3.0])
    t = np.array([1.0, 1.0, 5.0])
    assert abs(rmse(p, t) - np.sqrt((0 + 1 + 4) / 3)) < 1e-12
    w = np.array([1.0, 0.0, 1.0])
    assert abs(rmse(p, t, w) - np.sqrt((0 + 4) / 2)) < 1e-12


def test_precision_and_map():
    m = FakeModel({0: list(range(20)), 1: list(range(20))})
    test = {0: [0, 2, 50], 1: [99]}
    # user 0: hits at ranks 1 and 3 -> P@10 = 2/10; user 1: 0
    assert abs(precision_at_k(m, test, k=10) - (0.2 + 0.0) / 2) < 1e-12
    # AP@10 user0: (1/1 + 2/3)/min(3,10) = (1 + 0.6667)/3
    ap0 = (1.0 + 2.0 / 3.0) / 3.0
    assert abs(map_at_k(m, test, k=10) - (ap0 + 0.0) / 2) < 1e-9


def test_exclusion_of_train_items():
    m = FakeModel({0: [5, 0, 1, 2, 3]})
    test = {0: [0]}
    train = {0: [5]}
    # item 5 excluded -> 0 ranks first -> P@1 would be 1; at k=2: 1/2
    assert abs(precision_at_k(m, test, k=2, train_user_items=train) - 0.5) < 1e-12


def test_profile_env_emits_trace(tmp_path, monkeypatch):
    """CMFREC_TPU_PROFILE=<dir> wraps any fit driver in a jax.profiler
    trace (SURVEY §5.1); unset = no files, no overhead."""
    import numpy as np

    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    rng = np.random.default_rng(0)
    rows = rng.integers(0, 20, 60)
    cols = rng.integers(0, 10, 60)
    vals = 3.0 + rng.normal(size=60)
    logdir = tmp_path / "prof"
    monkeypatch.setenv("CMFREC_TPU_PROFILE", str(logdir))
    fit_explicit_als(rows, cols, vals, 20, 10, k=3, niter=1,
                     use_cg=False, dtype=np.float64)
    files = list(logdir.rglob("*"))
    assert any(f.is_file() for f in files), "no trace emitted"
