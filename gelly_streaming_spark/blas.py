"""Pin BLAS/OpenMP pools to one thread inside numpy kernels.

Why this exists (BENCH_r08 forensics): every Arrow-batched numpy kernel
(embedding GEMM, LSH bucket matmul, triangle slice counter) runs as one
of up to 32 concurrent Spark tasks per host. A default multi-threaded
OpenBLAS pool underneath each task is multiplicative oversubscription —
32 tasks x N BLAS threads — which turned residual host load into 8-19x
wall-clock swings on exactly the numpy-kernel queries (q23b 1.17->20.33 s,
q17 0.89->7.51 s driver-to-driver with identical code) while pure-JVM
queries moved +/-30%. Spark already owns the core-level parallelism; the
per-task kernel must be single-threaded.

Two complementary mechanisms, both applied:

1. Environment variables (``OPENBLAS_NUM_THREADS=1`` et al.) set in the
   driver process BEFORE the JVM starts (session bootstrap) and exported
   to executors via ``spark.executorEnv.*``. Python workers inherit the
   JVM's environment, so numpy inside a fresh worker initializes its
   pool single-threaded from the first import. This is the path that
   matters on a real cluster.
2. A runtime ctypes call into the ALREADY-LOADED OpenBLAS
   (``openblas_set_num_threads``) for processes where numpy was imported
   before the env vars landed (driver-side kernels, reused workers,
   test processes). threadpoolctl would do this portably but is not in
   the container; /proc/self/maps + dlopen-of-loaded-lib is the same
   trick scoped to Linux, and is a no-op anywhere it can't apply.

``pin_blas_threads()`` is idempotent and costs ~0 after the first call;
every numpy kernel entry point calls it (grep anchor: pin_blas_threads).
"""

from __future__ import annotations

import ctypes
import os

# The union of knobs honored by OpenBLAS / OpenMP / MKL / BLIS / numexpr /
# Accelerate — set them all; unknown ones are ignored by the libs present.
PIN_VARS: tuple[str, ...] = (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "BLIS_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
)

_pinned = False


def blas_env(n: int = 1) -> dict[str, str]:
    """The env-var map that pins BLAS pools — exported to executors via
    ``spark.executorEnv.*`` (session.py) and set in os.environ before the
    local JVM starts so local-mode Python workers inherit it."""
    return {v: str(n) for v in PIN_VARS}


def _set_loaded_openblas_threads(n: int) -> None:
    """Call openblas_set_num_threads on every OpenBLAS image already
    mapped into this process (numpy wheels bundle their own). dlopen of
    an already-loaded path returns the existing handle — no new load."""
    try:
        with open("/proc/self/maps") as fh:
            paths = {
                line.rsplit(" ", 1)[-1].strip()
                for line in fh
                if "openblas" in line.lower() and "/" in line
            }
    except OSError:  # non-Linux or restricted /proc — env vars still apply
        return
    for path in paths:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        # ILP64 builds (numpy's openblas64) suffix the symbol.
        for sym in (
            "openblas_set_num_threads",
            "openblas_set_num_threads64_",
            "openblas_set_num_threads_",
        ):
            fn = getattr(lib, sym, None)
            if fn is not None:
                try:
                    fn(ctypes.c_int(n))
                except Exception:
                    pass
                break


def pin_blas_threads() -> None:
    """Pin every BLAS/OpenMP pool in this process to 1 thread.

    Idempotent; called at the entry of every numpy kernel so the pin
    holds regardless of how the worker process was started. Spark's
    task-level parallelism supplies the cores; a threaded BLAS under
    32 concurrent tasks only adds scheduler thrash.
    """
    global _pinned
    if _pinned:
        return
    _pinned = True
    os.environ.update(blas_env(1))
    try:
        from threadpoolctl import threadpool_limits  # not in container; used if present

        threadpool_limits(limits=1)
    except Exception:
        pass
    _set_loaded_openblas_threads(1)
