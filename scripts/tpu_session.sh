#!/bin/bash
# One-shot TPU measurement session (run when the axon tunnel is up).
# Order matters: kernel sweep first (informs CMFREC_TPU_BLOCK_R and the
# bf16-mask decision), then the benches (which also seed the persistent
# compile cache for the driver's end-of-round run).
set -x
cd /root/repo
date -u
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

echo "=== 1. masked-kernel sweep (VERDICT item 6) ==="
timeout 2400 python scripts/sweep_masked_kernel.py 2>&1 | tee /tmp/sweep_masked.log

echo "=== 2. explicit bench (full baseline table) ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/bench_r3.log

echo "=== 3. implicit bench ==="
timeout 3600 python bench_implicit.py 2>&1 | tee /tmp/bench_implicit_r3.log

echo "=== 4. graft entry self-test ==="
timeout 1200 python __graft_entry__.py 2>&1 | tail -5
date -u
