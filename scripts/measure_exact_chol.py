"""One-shot TPU measurement: exact-mode (use_cg=False) fits on the fused
dense engine at the bench shape — als_chol and chol_implicit_feat rows."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cmfrec_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

m, n = 69878, 10677
rows, cols, vals = bench._cached(bench.make_ml10m_shaped,
                                 "/tmp/cmfrec_bench_ml10m.npz")
test = np.random.default_rng(1).uniform(size=rows.size) < 0.05
tr = ~test
print(f"data ready nnz={rows.size}", flush=True)


def heldout_rmse(res):
    pred = (
        res["glob_mean"]
        + res["biasA"][rows[test]]
        + res["biasB"][cols[test]]
        + np.einsum("nk,nk->n", res["A"][rows[test]], res["B"][cols[test]])
    )
    return float(np.sqrt(np.mean((pred - vals[test]) ** 2)))


def timed(fit, label, n_warm=2, n_best=2):
    best, bres = float("inf"), None
    for i in range(n_warm + n_best):
        t0 = time.time()
        r = fit()
        _ = float(jnp.sum(r["A"]) + jnp.sum(r["B"]))
        el = time.time() - t0
        print(f"[{label}] run {i}: {el:.2f}s", flush=True)
        if i >= n_warm and el < best:
            best, bres = el, r
    print(f"[{label}] best: {best:.2f}s RMSE: {heldout_rmse(bres):.4f}",
          flush=True)
    return best


from cmfrec_tpu.solvers.drivers import fit_explicit_als  # noqa: E402
from cmfrec_tpu.solvers.collective import fit_collective_explicit_als  # noqa: E402

kwargs = dict(
    k=50, lambda_=0.05, scale_lam=True, niter=15, use_cg=False,
    user_bias=True, item_bias=True, center=True, dtype=np.float32,
    verbose=False,
)
timed(lambda: fit_explicit_als(rows[tr], cols[tr], vals[tr], m, n, **kwargs),
      "als_chol_exact")

collective_kw = dict(
    k=50, lambda_=0.05, scale_lam=True, niter=15,
    add_implicit_features=True, w_implicit=0.5,
    user_bias=True, item_bias=True, center=True,
    dtype=np.float32, verbose=False, use_cg=False)
timed(lambda: fit_collective_explicit_als(
    rows[tr], cols[tr], vals[tr], m, n, **collective_kw),
    "chol_implicit_feat_exact")
