"""W-stream bandwidth probes (r4): why does the int8 mask stream at
184 GB/s when HBM is 819 GB/s?

  xla_sum      jnp.sum over the whole W in plain XLA (platform reference)
  wsum_<geom>  pallas stream-and-reduce at various block geometries
  wsum_bf16    same stream with a 2 B mask (is it byte-bound or
               element-bound?)
  part         no-revisit variant: partial sums to [S/bs pages x R, K],
               reduced in XLA (is the out-block revisit the stall?)

Usage: python scripts/sweep_kernel_probe3.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, N, K = 69878, 10677, 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cmfrec_tpu.config import enable_persistent_compilation_cache
    from cmfrec_tpu.ops.masked_matmul import pad_dim

    enable_persistent_compilation_cache()
    R, bs0 = pad_dim(M)
    S = -(-N // bs0) * bs0

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    Q0 = jax.random.normal(k1, (R, K), jnp.bfloat16)
    Be = jax.random.normal(k2, (S, K), jnp.bfloat16)
    Wm = jax.jit(lambda k: jax.random.bernoulli(
        k, 0.013, (R, S)).astype(jnp.int8))(k3)
    _ = float(jnp.sum(Q0[0].astype(jnp.float32)))

    def timeit(name, fn, W):
        # W passed as a jit ARGUMENT — a closure constant bakes the whole
        # mask into the HLO and the axon remote-compile endpoint rejects
        # the ~860 MB request body (HTTP 413)
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(Q, W, n=8):
            def step(q, _):
                y = fn(q, W)
                return (y * 1e-3 + q * 0.5).astype(q.dtype), None

            q, _ = jax.lax.scan(step, Q, None, length=n)
            return q

        try:
            out = chain(Q0, W)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            best = float("inf")
            for _rep in range(3):
                t0 = time.time()
                out = chain(Q0, W)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                best = min(best, (time.time() - t0) / 8)
            print(json.dumps({"probe": name, "ms": round(best * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:160]}),
                  flush=True)

    # --- XLA whole-array reduce as the platform reference
    def xla_sum(q, W):
        s = jnp.sum(W, dtype=jnp.int32).astype(jnp.float32)
        return q + (s * 1e-9).astype(jnp.bfloat16)

    timeit("xla_sum_int8", xla_sum, Wm)

    # --- pallas stream+reduce at several geometries
    def make_wsum(br, bs):
        def body(q_ref, w_ref, out_ref):
            w = w_ref[...].astype(jnp.float32)
            contrib = (jnp.sum(w, axis=1, keepdims=True)
                       * jnp.ones((1, K), jnp.float32))

            @pl.when(pl.program_id(1) == 0)
            def _():
                out_ref[...] = contrib

            @pl.when(pl.program_id(1) != 0)
            def _():
                out_ref[...] = out_ref[...] + contrib

        return pl.pallas_call(
            body,
            grid=(R // br, S // bs),
            in_specs=[
                pl.BlockSpec((br, K), lambda i, j: (i, 0)),
                pl.BlockSpec((br, bs), lambda i, j: (i, j)),
            ],
            out_specs=pl.BlockSpec((br, K), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    def runner_for(call):
        def runner(q, W):
            y = call(q, W)  # [R, K] f32
            return q + (y * 1e-9).astype(jnp.bfloat16)

        return runner

    for br, bs in ((1024, bs0), (512, bs0), (2048, bs0),
                   (1024, 2048), (512, 4096), (256, 10752), (8832, 384)):
        if R % br == 0 and S % bs == 0:
            timeit(f"wsum_{br}x{bs}", runner_for(make_wsum(br, bs)), Wm)

    # --- bf16-stored mask (2 B/entry): byte-bound vs element-bound
    Wb = Wm.astype(jnp.bfloat16)
    timeit("wsum_bf16_1024", runner_for(make_wsum(1024, bs0)), Wb)


if __name__ == "__main__":
    main()
