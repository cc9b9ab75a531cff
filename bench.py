"""Headline benchmark: explicit ALS-CG fit, ML10M-shaped synthetic data.

Mirrors the reference's flagship benchmark (BASELINE.md: MovieLens10M,
k=50, 15 ALS-CG iterations with biases -> 13.64 s on a Ryzen 2700 /
OpenBLAS, RMSE 0.788).  No datasets ship in this environment, so the data
is synthetic with ML10M's exact shape (69878 x 10677, 10**7 ratings) and a
power-law degree profile; timing is steady-state (post-compile), matching
how the C library's number excludes its own one-time costs (compilation at
package build time).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_S = 13.64  # benchmark/README.md:25 — ALS-CG k=50 biases, Python


def make_ml10m_shaped(seed=0, m=69878, n=10677, nnz=10_000_054):
    rng = np.random.default_rng(seed)
    # Power-law item popularity and user activity (ML10M-like profile).
    item_p = (1.0 / np.arange(1, n + 1) ** 0.8)
    item_p /= item_p.sum()
    user_p = (1.0 / np.arange(1, m + 1) ** 0.55)
    user_p /= user_p.sum()
    rows = rng.choice(m, size=int(nnz * 1.25), p=user_p)
    cols = rng.choice(n, size=int(nnz * 1.25), p=item_p)
    pairs = rows.astype(np.int64) * n + cols
    pairs = np.unique(pairs)
    rng.shuffle(pairs)
    pairs = pairs[:nnz]
    rows = (pairs // n).astype(np.int64)
    cols = (pairs % n).astype(np.int64)
    k_true = 12
    A = rng.normal(size=(m, k_true)).astype(np.float32) * 0.35
    B = rng.normal(size=(n, k_true)).astype(np.float32) * 0.35
    bA = (rng.normal(size=m) * 0.4).astype(np.float32)
    bB = (rng.normal(size=n) * 0.4).astype(np.float32)
    vals = (
        3.5
        + bA[rows]
        + bB[cols]
        + np.einsum("nk,nk->n", A[rows], B[cols])
        + 0.7 * rng.normal(size=rows.size).astype(np.float32)
    )
    vals = np.clip(np.round(vals * 2) / 2, 0.5, 5.0)
    return rows, cols, vals.astype(np.float64)


def _cached(maker, path):
    """Synthetic data is deterministic; cache it across bench runs (the
    single-core host needs ~30-60s to generate it)."""
    import os

    try:
        if os.path.exists(path):
            z = np.load(path)
            return z["rows"], z["cols"], z["vals"]
    except Exception:
        pass
    rows, cols, vals = maker()
    try:
        np.savez(path, rows=rows, cols=cols, vals=vals)
    except Exception:
        pass
    return rows, cols, vals


def main():
    t_setup = time.time()
    from cmfrec_tpu.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from cmfrec_tpu.solvers.drivers import fit_explicit_als

    m, n = 69878, 10677
    rows, cols, vals = _cached(make_ml10m_shaped,
                               "/tmp/cmfrec_bench_ml10m.npz")
    test = np.random.default_rng(1).uniform(size=rows.size) < 0.05
    tr = ~test
    print(f"data ready in {time.time() - t_setup:.1f}s nnz={rows.size}",
          file=sys.stderr)

    kwargs = dict(
        k=50, lambda_=0.05, scale_lam=True, niter=15, use_cg=True,
        max_cg_steps=3, finalize_chol=True, user_bias=True, item_bias=True,
        center=True, dtype=np.float32, verbose=False,
    )

    # Warm-up passes: pay all XLA/Mosaic compiles for this data's shapes.
    # First-run-per-executable costs on this platform amortize over several
    # calls, so warm adaptively until the time stabilizes, then report the
    # best of three timed runs.  A scalar readback inside the timer forces
    # all device work to finish (block_until_ready is unreliable over the
    # axon tunnel); the model arrays themselves stay on device, like the C
    # reference's arrays stay in RAM.
    import jax.numpy as jnp

    def one_fit():
        t0 = time.time()
        res = fit_explicit_als(rows[tr], cols[tr], vals[tr], m, n, **kwargs)
        _ = float(
            jnp.sum(res["A"]) + jnp.sum(res["biasA"])
            + jnp.sum(jnp.sum(res["B"], axis=0) + jnp.sum(res["biasB"]))
        )
        return time.time() - t0, res

    # --- cold-start attribution (r4 verdict item 6): fence the tunnel and
    # the bulk upload separately BEFORE the first fit, and log compiles
    # during it, so a stalled tunnel is distinguishable from a compile
    # regression after the fact ---
    import jax

    cold = {}
    t0 = time.time()
    _ = float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    cold["tiny_roundtrip_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    probe_bytes = 64 << 20  # ~ the fit's wire volume at this shape
    _ = float(jnp.sum(jnp.asarray(
        np.ones(probe_bytes // 4, np.float32)).astype(jnp.float32)[::4096]))
    dt_up = time.time() - t0
    cold["bulk_upload_s"] = round(dt_up, 2)
    cold["bulk_upload_mb_s"] = round(probe_bytes / dt_up / 2**20, 1)
    print(f"cold stages: tiny round-trip {cold['tiny_roundtrip_s']}s, "
          f"64 MB upload {cold['bulk_upload_s']}s "
          f"({cold['bulk_upload_mb_s']} MB/s)", file=sys.stderr)

    jax.config.update("jax_log_compiles", True)
    warm, prev = one_fit()[0], float("inf")
    jax.config.update("jax_log_compiles", False)
    cold["first_fit_s"] = round(warm, 2)
    print(f"warm-up fit (incl. compile): {warm:.2f}s", file=sys.stderr)
    for _ in range(4):
        prev = warm
        warm, _r = one_fit()
        print(f"warm-up fit: {warm:.2f}s", file=sys.stderr)
        if warm > 0.85 * prev:
            break

    # best of 5: the tunnel to the TPU has multi-second contention noise
    elapsed, res = one_fit()
    for _ in range(4):
        e2, r2 = one_fit()
        if e2 < elapsed:
            elapsed, res = e2, r2

    def heldout_rmse(res):
        pred = (
            res["glob_mean"]
            + res["biasA"][rows[test]]
            + res["biasB"][cols[test]]
            + np.einsum("nk,nk->n", res["A"][rows[test]],
                        res["B"][cols[test]])
        )
        return float(np.sqrt(np.mean((pred - vals[test]) ** 2)))

    rmse = heldout_rmse(res)
    print(f"fit: {elapsed:.2f}s  heldout RMSE: {rmse:.4f}", file=sys.stderr)

    # --- measured per-iteration time (r4 verdict item 7): difference two
    # fenced fits at 30 vs 15 iterations — the per-fit host build and
    # upload cancel exactly, leaving 15 pure iterations ---
    def fit_niter(ni):
        t0 = time.time()
        r = fit_explicit_als(rows[tr], cols[tr], vals[tr], m, n,
                             **{**kwargs, "niter": ni})
        _ = float(jnp.sum(r["A"]) + jnp.sum(r["biasA"]))
        return time.time() - t0

    t30 = min(fit_niter(30), fit_niter(30))
    iter_s_measured = max(t30 - elapsed, 0.0) / 15
    print(f"iter_s measured (t30-t15)/15: {iter_s_measured:.4f}s "
          f"(t30={t30:.2f}s)", file=sys.stderr)

    # --- the REST of the reference's explicit baseline table -------------
    # (benchmark/README.md:27-29: ALS-Chol 30.91 s / CG+implicit-features
    # 22.09 s / Chol+implicit-features 35.35 s on the same data+hyperparams)
    extras = {}
    if os.environ.get("CMFREC_TPU_BENCH_HEADLINE_ONLY", "0") != "1":
        from cmfrec_tpu.solvers.collective import fit_collective_explicit_als

        def timed(fit, label, baseline_s):
            def once():
                t0 = time.time()
                r = fit()
                _ = float(jnp.sum(r["A"]) + jnp.sum(jnp.sum(r["B"], axis=0)))
                return time.time() - t0, r

            w, prev = once()[0], float("inf")
            print(f"[{label}] warm-up (incl. compile): {w:.2f}s",
                  file=sys.stderr)
            for _ in range(2):
                prev = w
                w, _r = once()
                print(f"[{label}] warm-up: {w:.2f}s", file=sys.stderr)
                if w > 0.85 * prev:
                    break
            el, r = once()
            for _ in range(2):
                e2, r2 = once()
                if e2 < el:
                    el, r = e2, r2
            q = heldout_rmse(r)
            print(f"[{label}] fit: {el:.2f}s  RMSE: {q:.4f}", file=sys.stderr)
            extras[f"{label}_s"] = round(el, 3)
            extras[f"{label}_rmse"] = round(q, 5)
            extras[f"{label}_vs_baseline"] = round(baseline_s / el, 3)

        timed(lambda: fit_explicit_als(
            rows[tr], cols[tr], vals[tr], m, n,
            **{**kwargs, "use_cg": False}), "als_chol", 30.91)
        collective_kw = dict(
            k=50, lambda_=0.05, scale_lam=True, niter=15,
            add_implicit_features=True, w_implicit=0.5,
            user_bias=True, item_bias=True, center=True,
            dtype=np.float32, verbose=False)
        timed(lambda: fit_collective_explicit_als(
            rows[tr], cols[tr], vals[tr], m, n,
            use_cg=True, max_cg_steps=3, finalize_chol=True,
            **collective_kw), "cg_implicit_feat", 22.09)
        timed(lambda: fit_collective_explicit_als(
            rows[tr], cols[tr], vals[tr], m, n,
            use_cg=False, **collective_kw), "chol_implicit_feat", 35.35)

    # --- the serving path (r4 verdict item 5): batched topN / predict /
    # warm factors vs the reference binary's serving routines ---
    if os.environ.get("CMFREC_TPU_BENCH_NO_SERVING", "0") != "1":
        try:
            import bench_serving

            extras["serving"] = bench_serving.run(
                {**res, "lambda_": kwargs["lambda_"]},
                rows[tr], cols[tr], vals[tr], m, n, kwargs["k"])
            print(f"serving: {extras['serving']}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - keep headline numbers
            print(f"serving leg failed: {e!r}", file=sys.stderr)
            extras["serving"] = {"error": repr(e)[:300]}

    # --- the implicit (WRMF) benchmark, embedded so the driver records it
    # (benchmark/README.md:90: LastFM-360K ALS-CG 31.9 s on the Ryzen).
    # Guarded: a failure in this ~4-minute leg must not discard the
    # already-measured headline numbers ---
    if os.environ.get("CMFREC_TPU_BENCH_NO_IMPLICIT", "0") != "1":
        try:
            import bench_implicit

            extras["implicit"] = bench_implicit.run()
        except Exception as e:
            print(f"implicit leg failed: {e!r}", file=sys.stderr)
            extras["implicit"] = {"error": repr(e)[:300]}

    rows_per_s = (m + n) * kwargs["niter"] / elapsed
    print(json.dumps({
        "metric": "ml10m_shaped_explicit_als_cg_k50_15iter_fit_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / elapsed, 3),
        "extra": {"heldout_rmse": round(rmse, 5), "warmup_s": round(warm, 2),
                  "nnz": int(tr.sum()),
                  "rows_solved_per_s_per_chip": round(rows_per_s),
                  "iter_s_derived": round(elapsed / kwargs["niter"], 4),
                  "iter_s_measured": round(iter_s_measured, 4),
                  "cold_stages": cold,
                  **extras},
    }))


if __name__ == "__main__":
    main()
