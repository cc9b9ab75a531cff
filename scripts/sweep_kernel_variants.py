"""Masked-matvec kernel VARIANT sweep on the real TPU (VERDICT r3 item 5).

The r3 sweep fixed the launch geometry (BLOCK_R=1024, bs=2816) but the
kernel still runs ~5x above the HBM/MXU floors.  The header analysis names
the causes: the [R, S] intermediate makes 3 VPU passes (f32 MXU output ->
bf16 cast, int8 mask convert, multiply) and K=64 fills half the MXU
contraction.  This sweep measures kernel BODY variants at the production
shape/dtype (Kp=64, int8 mask):

  v0    current body (f32 accum -> cast -> f32-convert mask multiply)
  vbf   first dot emits bf16 directly (preferred_element_type) + one
        bf16 multiply with the int8 mask converted on the VPU
  vsel  mask applied as a SELECT (predication) instead of multiply
  vw16  mask stored pre-cast to bf16 in HBM (2 B/entry instead of 1)
  vbig  vbf at BLOCK_R=2048 (row-block reuse of the streamed Be tile)

Timing chains each output into the next input (CLAUDE.md: independent
dispatches pipeline and lie).  Usage: python scripts/sweep_kernel_variants.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, N, K = 69878, 10677, 64  # ML10M shape at the engine's padded Kp


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cmfrec_tpu.config import enable_persistent_compilation_cache
    from cmfrec_tpu.ops.masked_matmul import pad_dim

    enable_persistent_compilation_cache()

    def body_v0(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.float32)
        w = w_ref[...]
        if w.dtype == jnp.bfloat16:
            t = t.astype(jnp.bfloat16) * w
        else:
            t = (t * w.astype(jnp.float32)).astype(be_ref.dtype)
        contrib = jnp.dot(t, be_ref[...], preferred_element_type=jnp.float32)
        _acc(out_ref, contrib)

    def body_vbf(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.bfloat16)
        t = t * w_ref[...].astype(jnp.bfloat16)
        contrib = jnp.dot(t, be_ref[...], preferred_element_type=jnp.float32)
        _acc(out_ref, contrib)

    def body_vsel(q_ref, be_ref, w_ref, out_ref):
        t = jnp.dot(q_ref[...], be_ref[...].T,
                    preferred_element_type=jnp.bfloat16)
        t = jnp.where(w_ref[...] != 0, t, jnp.bfloat16(0))
        contrib = jnp.dot(t, be_ref[...], preferred_element_type=jnp.float32)
        _acc(out_ref, contrib)

    def _acc(out_ref, contrib):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[...] = contrib

        @pl.when(pl.program_id(1) != 0)
        def _():
            out_ref[...] = out_ref[...] + contrib

    def make_call(body, block_r, bs, R, S):
        return pl.pallas_call(
            body,
            grid=(R // block_r, S // bs),
            in_specs=[
                pl.BlockSpec((block_r, K), lambda i, j: (i, 0)),
                pl.BlockSpec((bs, K), lambda i, j: (j, 0)),
                pl.BlockSpec((block_r, bs), lambda i, j: (i, j)),
            ],
            out_specs=pl.BlockSpec((block_r, K), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    R, bs = pad_dim(M)
    S = -(-N // bs) * bs
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    Q0 = jax.random.normal(k1, (R, K), jnp.bfloat16)
    Be = jax.random.normal(k2, (S, K), jnp.bfloat16)
    Wm = jax.jit(lambda k: jax.random.bernoulli(
        k, 0.013, (R, S)).astype(jnp.int8))(k3)
    Wbf = Wm.astype(jnp.bfloat16)
    _ = float(jnp.sum(Q0[0]) + jnp.sum(Be[0]) + jnp.sum(Wbf[0]))

    configs = [
        ("v0_int8", body_v0, 1024, Wm),
        ("vbf_int8", body_vbf, 1024, Wm),
        ("vsel_int8", body_vsel, 1024, Wm),
        ("vw16_bf16", body_v0, 1024, Wbf),
        ("vbf_bf16", body_vbf, 1024, Wbf),
        ("vbig_int8", body_vbf, 2048, Wm),
        ("vbig_bf16", body_vbf, 2048, Wbf),
    ]
    results = []
    for name, body, block_r, W in configs:
        call = make_call(body, block_r, bs, R, S)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(Q, Be, W, n=8):
            def step(q, _):
                y = call(q, Be, W)
                return (y * 1e-3).astype(jnp.bfloat16), None

            q, _ = jax.lax.scan(step, Q, None, length=n)
            return q

        try:
            out = chain(Q0, Be, W)
            _ = float(jnp.sum(out))  # compile + fence
            best = float("inf")
            for _rep in range(3):
                t0 = time.time()
                out = chain(Q0, Be, W)
                _ = float(jnp.sum(out))
                best = min(best, (time.time() - t0) / 8)
            tf = 2 * 2 * R * S * K / best / 1e12
            results.append({"variant": name, "ms": round(best * 1e3, 3),
                            "tf_s": round(tf, 1)})
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:  # Mosaic may reject a variant
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
