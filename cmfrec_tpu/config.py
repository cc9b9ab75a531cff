"""Global configuration helpers for cmfrec-tpu.

The reference library selects float32/float64 at compile time (``USE_FLOAT``,
/root/reference/src/cmfrec.h:232-313) and exposes it per-model as
``use_float``.  Here dtype is a per-model runtime choice; float32 is the
TPU-native default, float64 requires ``jax.config.update("jax_enable_x64",
True)`` (done lazily when a model requests it).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import numpy as np

# Default matmul precision for solver einsums.  "highest" keeps f32 matmuls
# in true f32 on the MXU (rather than bf16x3 passes), which is required to
# match the reference's float64-ish RMSE trajectories.
SOLVER_PRECISION = jax.lax.Precision.HIGHEST

# Row-block granularity: padded bucket row counts are multiples of this so
# the number of distinct compiled shapes stays small and blocks shard evenly
# over a device mesh.
DEFAULT_ROW_BLOCK = 8

# Cap on R*L elements a single gathered [R, L, K] block may have before the
# data layer splits a bucket into several chunks (bounds peak HBM usage of
# the gathered opposing-factor slab: 2**23 * 56 coords * 2B bf16 ~ 0.9GB).
# Fewer, larger buckets measured mildly faster on v5e.
DEFAULT_MAX_BLOCK_ELEMS = 1 << 23


def resolve_dtype(use_float: bool | str | np.dtype) -> np.dtype:
    """Map the reference's ``use_float`` flag (or a dtype-ish) to a numpy dtype."""
    if isinstance(use_float, (bool, np.bool_)):
        dtype = np.float32 if use_float else np.float64
    else:
        dtype = np.dtype(use_float).type
    if dtype == np.float64 and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    return np.dtype(dtype)


@lru_cache(maxsize=None)
def default_mesh() -> jax.sharding.Mesh | None:
    """A 1-D mesh over all local devices, or None on a single device.

    The single data-parallel axis ``d`` shards factor-matrix rows and their
    aligned CSR buckets; the opposing factor matrix stays replicated (it is
    small: n x k).  This is the TPU equivalent of the reference's OpenMP
    row loop (/root/reference/src/common.c:2922-2930).
    """
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    return jax.sharding.Mesh(np.array(devices), ("d",))


def exact_dense_enabled() -> bool:
    """Whether use_cg=False ("Cholesky") fits may ride the fused masked
    engine in exact mode on TPU (CG run to the per-row 1e-8 freeze under
    the Krylov step cap — the same per-row systems solved to the f32
    fixed point at matvec cost instead of the bucketed engine's nnz*k^2
    Gram assembly).  CMFREC_TPU_NO_EXACT_DENSE=1 keeps exact fits on the
    per-row-Cholesky bucketed engine."""
    return os.environ.get("CMFREC_TPU_NO_EXACT_DENSE", "0") != "1"


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get(
        "CMFREC_TPU_CACHE", os.path.expanduser("~/.cache/cmfrec_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Persist EVERYTHING: over the axon tunnel even a jit(add) costs a
        # ~0.4-0.5s compile RPC, and a cold fit dispatches ~300 tiny
        # helper programs (measured r4: that storm, not the iteration
        # program, dominates first-run latency).  Disk is cheap.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


# ----------------------------------------------------------------------- #
# interrupt handling (the reference's handle_interrupt flag,               #
# /root/reference/src/helpers.c:1493 act_on_interrupt)                     #
# ----------------------------------------------------------------------- #

_HANDLE_INTERRUPT = True


def set_handle_interrupt(flag: bool) -> bool:
    """Set whether fit loops catch SIGINT and return the partial model
    (True, reference default) or re-raise (False).  Returns the old value."""
    global _HANDLE_INTERRUPT
    old = _HANDLE_INTERRUPT
    _HANDLE_INTERRUPT = bool(flag)
    return old


def should_handle_interrupt() -> bool:
    return _HANDLE_INTERRUPT
