"""TPU probe: stage breakdown of build_bucketed_pair_device at the
implicit-bench shape (17M entries).  Times, with queue fences:
  1. native wire pass (host)
  2. upload of the three wire arrays (+ device combine of lo/hi)
  3. device fill + transpose sort + attach
Run twice to separate first-executable costs from steady state.
Run: python scripts/probe_build_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cmfrec_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax.numpy as jnp

from bench import _cached
from bench_implicit import make_lastfm_shaped, split_heldout
from cmfrec_tpu import native
from cmfrec_tpu.data.device_fill import build_bucketed_pair_device

m, n = 359347, 160168
rows, cols, vals = _cached(make_lastfm_shaped, "/tmp/cmfrec_bench_lastfm_v2.npz")
tr_r, tr_c, tr_v, *_ = split_heldout(rows, cols, vals, m)
tr_r = np.ascontiguousarray(tr_r, np.int64)
tr_c = np.ascontiguousarray(tr_c, np.int64)
tr_v64 = np.ascontiguousarray(tr_v, np.float64)
nnz = tr_r.size
print(f"nnz={nnz}", flush=True)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


assert native.get_lib() is not None, (
    "native layer unavailable — csr_wire_from_coo would return None")

# tiny round-trip first so tunnel/compile setup doesn't pollute stage 2
_ = fence(jnp.ones((8, 8)))

for rep in range(3):
    t0 = time.time()
    wire = native.csr_wire_from_coo(tr_r, tr_c, tr_v64, None, m, n)
    counts_r, _ip, lo, hi, vb, _wb, counts_c = wire
    t1 = time.time()
    ids_dev = (jnp.asarray(lo).astype(jnp.int32)
               | (jnp.asarray(hi).astype(jnp.int32) << 16))
    vals_dev = jnp.asarray(vb.view(jnp.bfloat16))
    _ = fence(ids_dev) + fence(vals_dev)
    t2 = time.time()
    print(f"rep{rep}: host wire {t1 - t0:.2f}s  upload+combine "
          f"{t2 - t1:.2f}s ({(lo.nbytes + hi.nbytes + vb.nbytes) / 2**20:.0f}"
          f" MB -> {(lo.nbytes + hi.nbytes + vb.nbytes) / (t2 - t1) / 2**20:.1f}"
          " MB/s)", flush=True)

# full build, twice
for rep in range(2):
    t0 = time.time()
    RB, CB = build_bucketed_pair_device(
        tr_r, tr_c, tr_v.astype(np.float32), m, n, None, dtype=np.float32)
    _ = fence(RB.buckets[-1].val) + fence(CB.buckets[-1].val)
    print(f"full build rep{rep}: {time.time() - t0:.2f}s", flush=True)
