"""Masked-matvec floor probes (r4): isolate WHERE the 5.4 ms goes.

  p_dots   the two MXU dots only, no mask multiply (MXU + stream floor)
  p_dot1   first dot only, result reduced to [block_r, K] via sum (MXU1)
  p_wsum   stream W tiles, reduce-sum only (HBM floor for the mask)
  p_full   the production body (baseline)
  p_part   full body but partial outputs to a [R, S/bs, K] scratch --
           no out-block revisit, grid fully parallel, reduce in XLA

Usage: python scripts/sweep_kernel_probe2.py
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
    BR = 1024
    R, bs = pad_dim(M)
    S = -(-N // bs) * bs

    def acc(out_ref, contrib):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[...] = contrib

        @pl.when(pl.program_id(1) != 0)
        def _():
            out_ref[...] = out_ref[...] + contrib

    def p_full(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.float32)
        t = (t * w_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
        acc(out_ref, jnp.dot(t, be_ref[...],
                             preferred_element_type=jnp.float32))

    def p_dots(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.float32)
        acc(out_ref, jnp.dot(t.astype(jnp.bfloat16), be_ref[...],
                             preferred_element_type=jnp.float32))

    def p_dot1(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.float32)
        acc(out_ref, jnp.sum(t, axis=1, keepdims=True)
            * jnp.ones((1, K), jnp.float32))

    def p_wsum(q_ref, be_ref, w_ref, out_ref):
        w = w_ref[...].astype(jnp.float32)
        acc(out_ref, jnp.sum(w, axis=1, keepdims=True)
            * jnp.ones((1, K), jnp.float32))

    def call3(body):
        return pl.pallas_call(
            body,
            grid=(R // BR, S // bs),
            in_specs=[
                pl.BlockSpec((BR, K), lambda i, j: (i, 0)),
                pl.BlockSpec((bs, K), lambda i, j: (j, 0)),
                pl.BlockSpec((BR, bs), lambda i, j: (i, j)),
            ],
            out_specs=pl.BlockSpec((BR, K), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    def p_part_body(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.float32)
        t = (t * w_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[...] = jnp.dot(t, be_ref[...],
                               preferred_element_type=jnp.float32)[:, None, :]

    part_call = pl.pallas_call(
        p_part_body,
        grid=(R // BR, S // bs),
        in_specs=[
            pl.BlockSpec((BR, K), lambda i, j: (i, 0)),
            pl.BlockSpec((bs, K), lambda i, j: (j, 0)),
            pl.BlockSpec((BR, bs), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((BR, 1, K), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((R, S // bs, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    Q0 = jax.random.normal(k1, (R, K), jnp.bfloat16)
    Be = jax.random.normal(k2, (S, K), jnp.bfloat16)
    Wm = jax.jit(lambda k: jax.random.bernoulli(
        k, 0.013, (R, S)).astype(jnp.int8))(k3)
    _ = float(jnp.sum(Q0[0].astype(jnp.float32)))

    def timeit(name, fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(Q, Be, W, n=8):
            def step(q, _):
                y = fn(q, Be, W)
                return (y * 1e-3).astype(jnp.bfloat16), None

            q, _ = jax.lax.scan(step, Q, None, length=n)
            return q

        try:
            out = chain(Q0, Be, Wm)
            _ = float(jnp.sum(out))
            best = float("inf")
            for _rep in range(3):
                t0 = time.time()
                out = chain(Q0, Be, Wm)
                _ = float(jnp.sum(out))
                best = min(best, (time.time() - t0) / 8)
            print(json.dumps({"probe": name,
                              "ms": round(best * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:160]}),
                  flush=True)

    timeit("p_full", lambda q, b, w: call3(p_full)(q, b, w))
    timeit("p_dots", lambda q, b, w: call3(p_dots)(q, b, w))
    timeit("p_dot1", lambda q, b, w: call3(p_dot1)(q, b, w))
    timeit("p_wsum", lambda q, b, w: call3(p_wsum)(q, b, w))
    timeit("p_part", lambda q, b, w: jnp.sum(part_call(q, b, w), axis=1))


if __name__ == "__main__":
    main()
