"""Sweep masked_gram_matvec variants on the real TPU (VERDICT r2 item 6).

Measures the CG-operator kernel at the ML10M bench shape across
  * mask dtype: int8 (1 B/entry, 3-pass VPU chain) vs bf16 (2 B, 2-pass)
  * BLOCK_R: 512 vs 1024 (subprocess re-exec — module constant)
  * stream block_s: the pad_dim candidates

Timing chains the output into the next input (CLAUDE.md: independent
dispatches pipeline and lie).  Usage:  python scripts/sweep_masked_kernel.py
"""

import json
import os
import subprocess
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, N, K = 69878, 10677, 52  # ML10M shape, k=50 + two bias columns


def run_one():
    import jax
    import jax.numpy as jnp

    from cmfrec_tpu.ops.masked_matmul import (
        BLOCK_R,
        masked_gram_matvec,
        pad_dim,
    )

    R, _ = pad_dim(M)
    results = []
    key = jax.random.key(0)
    for bs in (2048, 2816, 3072, 4096):
        S = -(-N // bs) * bs
        # inputs built ON DEVICE — host arrays of this size would spend
        # ~30 s/config on the ~25 MB/s tunnel and pollute the timings
        k1, k2, k3 = jax.random.split(key, 3)
        Q0 = jax.random.normal(k1, (R, K), jnp.bfloat16)
        Be = jax.random.normal(k2, (S, K), jnp.bfloat16)
        Wm = jax.jit(
            lambda k: jax.random.bernoulli(k, 0.013, (R, S)).astype(jnp.int8),
            static_argnums=(),
        )(k3)
        for wdt in ("int8", "bf16"):
            W = Wm.astype(jnp.bfloat16) if wdt == "bf16" else Wm

            # arrays passed as ARGS, not closed over: closure constants get
            # baked into the HLO and the axon remote-compile endpoint
            # rejects the ~860 MB request body (HTTP 413)
            @partial(jax.jit, static_argnames=("bs", "n"))
            def chain(Q, Be, W, bs, n=8):
                def body(q, _):
                    y = masked_gram_matvec(q, Be, W, block_s=bs)
                    return (y * 1e-3).astype(jnp.bfloat16), None

                q, _ = jax.lax.scan(body, Q, None, length=n)
                return q

            out = chain(Q0, Be, W, bs)
            float(jnp.sum(out.astype(jnp.float32)))  # warm + fence
            t0 = time.perf_counter()
            out = chain(Q0, Be, W, bs)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 8
            flops = 4 * R * S * K
            results.append(
                dict(block_r=BLOCK_R, bs=bs, wdt=wdt, ms=dt * 1e3,
                     tflops=flops / dt / 1e12)
            )
            print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_one()
    else:
        for br in ("512", "1024"):
            env = dict(os.environ, CMFREC_TPU_BLOCK_R=br)
            subprocess.run(
                [sys.executable, __file__, "--child"], env=env, check=False
            )
