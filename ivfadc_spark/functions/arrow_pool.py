"""Arrow memory-pool selection for many-worker hosts.

Measured on this engine's combiner kernel (tokenize -> dictionary-encode ->
unique -> varint, 16 pinned processes, interleaved trials): pyarrow's
default jemalloc pool is BIMODAL under 16-way process concurrency — the
same workload lands at either ~8.5 or ~1.0 chunk-iters/s per 16 procs
(page-fault/purging contention), while mimalloc is stable at ~9.4 with
near-perfect 4->16 scaling (0.95 vs the 0.28 jemalloc mode). Every Arrow
kernel in the engine calls :func:`use_scalable_pool` on entry; the cost is
a no-op after the first call per process.

Purge behavior matters as much as the allocator: an allocator that returns
freed pages to the OS makes every worker re-fault them on the next chunk,
and concurrent page-fault/zeroing in the kernel is the single worst scaling
bottleneck measured on this host (the same 16-process kernel run scores
1.1 chunk-iters/proc with default purging vs 10.1 with purging disabled —
9x). ``MIMALLOC_PURGE_DELAY=-1`` keeps freed pages resident; peak RSS per
worker stays bounded by the largest chunk working set, which the encode
chunking already caps. The env must be set before mimalloc initializes, so
the session factory also injects it into executor environments.
"""

from __future__ import annotations

import os


def scalable_alloc_env() -> dict[str, str]:
    """Env vars that keep allocation churn out of the kernel: mimalloc Arrow
    pool, no page purging, and glibc (numpy's allocator) told to reuse its
    heap instead of mmap/munmap-ing every large buffer."""
    return {
        "ARROW_DEFAULT_MEMORY_POOL": "mimalloc",
        "MIMALLOC_PURGE_DELAY": "-1",
        "MALLOC_MMAP_THRESHOLD_": "1073741824",
        "MALLOC_TRIM_THRESHOLD_": "1073741824",
    }


def use_scalable_pool() -> None:
    # setdefault is best-effort: it only takes effect if mimalloc has not
    # allocated yet in this process (true for freshly forked workers)
    os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
    try:
        import pyarrow as pa

        if pa.default_memory_pool().backend_name != "mimalloc":
            pa.set_memory_pool(pa.mimalloc_memory_pool())
    except Exception:
        pass  # pool unavailable in this build: keep the default
