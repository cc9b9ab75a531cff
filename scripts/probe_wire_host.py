"""Host-only probe: where does the native wire pass spend its 3.6 s?

Times each stage of the bucketed pair build's host side on the implicit
bench data (17M entries, LastFM shape) WITHOUT touching the TPU:
histogram-only, the fused wire distribution, degree order, planning.
Run: python scripts/probe_wire_host.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from bench import _cached
from bench_implicit import make_lastfm_shaped, split_heldout
from cmfrec_tpu import native

m, n = 359347, 160168
rows, cols, vals = _cached(make_lastfm_shaped, "/tmp/cmfrec_bench_lastfm_v2.npz")
tr_r, tr_c, tr_v, *_ = split_heldout(rows, cols, vals, m)
tr_r = np.ascontiguousarray(tr_r, np.int64)
tr_c = np.ascontiguousarray(tr_c, np.int64)
tr_v = np.ascontiguousarray(tr_v, np.float64)
nnz = tr_r.size
print(f"nnz={nnz}")

lib = native.get_lib()
assert lib is not None

# full fused wire pass (current production path), 3 reps
for rep in range(3):
    t0 = time.time()
    out = native.csr_wire_from_coo(tr_r, tr_c, tr_v, None, m, n)
    t1 = time.time()
    print(f"csr_wire_from_coo rep{rep}: {t1 - t0:.3f}s")
counts = out[0]

# histogram alone (np.bincount as a proxy for pass 1 cost)
for rep in range(2):
    t0 = time.time()
    c = np.bincount(tr_r, minlength=m)
    print(f"np.bincount rows: {time.time() - t0:.3f}s")

t0 = time.time()
order = native.degree_order(counts)
print(f"degree_order: {time.time() - t0:.3f}s")

from cmfrec_tpu.data.shards import plan_layout
from cmfrec_tpu.config import DEFAULT_MAX_BLOCK_ELEMS, DEFAULT_ROW_BLOCK

t0 = time.time()
chunks, perm, row_of, npad = plan_layout(
    counts, order, m, DEFAULT_ROW_BLOCK, DEFAULT_MAX_BLOCK_ELEMS, 8)
print(f"plan_layout: {time.time() - t0:.3f}s  chunks={len(chunks)}")

# col-side planning too (second orientation)
counts_c = out[6]
t0 = time.time()
order_c = native.degree_order(counts_c)
chunks_c, *_rest = plan_layout(
    counts_c, order_c, n, DEFAULT_ROW_BLOCK, DEFAULT_MAX_BLOCK_ELEMS, 8)
print(f"col side order+plan: {time.time() - t0:.3f}s  chunks={len(chunks_c)}")
