"""Arrow memory-pool selection for many-worker hosts.

Measured on this engine's combiner kernel (tokenize -> dictionary-encode ->
unique -> varint, 16 pinned processes, interleaved trials): pyarrow's
default jemalloc pool is BIMODAL under 16-way process concurrency — the
same workload lands at either ~8.5 or ~1.0 chunk-iters/s per 16 procs
(page-fault/purging contention), while mimalloc is stable at ~9.4 with
near-perfect 4->16 scaling (0.95 vs the 0.28 jemalloc mode). Every Arrow
kernel in the engine calls :func:`use_scalable_pool` on entry; the cost is
a no-op after the first call per process.
"""

from __future__ import annotations


def use_scalable_pool() -> None:
    try:
        import pyarrow as pa

        if pa.default_memory_pool().backend_name != "mimalloc":
            pa.set_memory_pool(pa.mimalloc_memory_pool())
    except Exception:
        pass  # pool unavailable in this build: keep the default
