"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload (the north-star pipeline):
  - index_build:      transcripts -> checkpointed compressed segment (turns/sec)
  - bm25_query_batch: 200-query top-10 batch via block-max WAND (QPS)
  - bm25_df_documents: flagship DataFrame BM25 over the documents table
  - lineitem_agg / revenue_per_nation / minhash_signatures: relational +
    dedup representatives

Extra keys (turns_per_sec, qps, n_turns, master) are informational; the
scaling-efficiency protocol (BASELINE.md) runs this same script at local[8]
and local[32] via tools/run_scaling.sh.

Each timed section runs TWICE and reports the per-metric best — the same
convention as the scaling protocol (BENCH/BASELINE.md): identical
back-to-back runs on this shared host vary ~25% with ambient load, and the
best is the estimate of quiet-host cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default 16, not 32: single-JVM local mode anti-scales past ~16 threads
    # on this class of host (page-fault/allocator contention inflates system
    # CPU ~7x at 32-way; measured, see BENCH/BASELINE.md) — 16 is the fastest
    # measured width for the one-JVM harness. Override via SPARK_GRAFT_CPUS.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import pandas as pd

    from ivfadc_spark.config import EngineConfig
    from ivfadc_spark.operators.wand import bm25_topk_indexed
    from ivfadc_spark.plans import driver_queries as DQ
    from ivfadc_spark.plans.build_index import build_index
    from ivfadc_spark.session import get_spark, wait_for_executors
    from ivfadc_spark.sources.transcripts import synth_transcripts_fast_pdf

    if cpus > 16 and not os.environ.get("SPARK_GRAFT_BENCH_ONEJVM"):
        # DEFAULT for wide grants: TWO executor JVMs (all granted cores
        # busy, per-JVM width in the sane regime — the shape a real cluster
        # gives this job), so the recorded master matches the grant and
        # round-over-round BENCH comparisons are same-master. One-JVM
        # local[16] (the prior default; caps width at the measured one-JVM
        # sweet spot) remains available via SPARK_GRAFT_BENCH_ONEJVM=1.
        master = f"local-cluster[2,{cpus // 2},24576]"
        conf = {
            "spark.executor.memory": "22g",
            # executor JVMs are separate processes: their python workers
            # need the engine on the path (plain local mode inherits it)
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.abspath(__file__)
            ),
        }
    else:
        # cap at 16 threads: past that ONE local JVM anti-scales
        # (page-fault/allocator contention inflates system CPU ~7x;
        # measured, BENCH/BASELINE.md).
        # The master actually used is recorded in the output JSON.
        cpus = min(cpus, 16)
        master = f"local[{cpus}]"
        conf = None
    spark = get_spark(
        "ivfadc-bench", master=master, shuffle_partitions=cpus, extra_conf=conf
    )
    wait_for_executors(spark)
    timings: dict[str, float] = {}
    extra: dict = {"master": master}

    # ---- corpus: deterministic synthetic transcripts scaled by sf
    n_conv = max(200, int(20_000 * sf / 0.1))
    pdf = synth_transcripts_fast_pdf(n_conversations=n_conv, seed=42)
    n_turns = len(pdf)
    extra["n_turns"] = n_turns
    tx = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    tx.write.mode("overwrite").parquet(os.path.join(tempfile.gettempdir(), "bench_tx.parquet"))
    tx = spark.read.parquet(os.path.join(tempfile.gettempdir(), "bench_tx.parquet"))

    # ---- index build (cold, checkpointed)
    out = tempfile.mkdtemp(prefix="ivfadc_bench_idx_")
    cfg = EngineConfig(block_size=256, salt_df_threshold=100_000, max_salts=16)
    # warm-up: tiny end-to-end build so python-worker pool spawn and JIT are
    # excluded from the measured window — per-process costs, not per-byte
    # costs; identical to the scaling protocol's warm-up (bench_scaling.py)
    warm_tx = spark.createDataFrame(
        synth_transcripts_fast_pdf(n_conversations=300, seed=1),
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(int(cpus))
    warm_dir = tempfile.mkdtemp(prefix="ivfadc_bench_warm_")
    build_index(spark, warm_tx, warm_dir, cfg=cfg).blocks.count()
    shutil.rmtree(warm_dir, ignore_errors=True)
    # two trials, per-metric best — the scaling protocol's convention
    # (BENCH/BASELINE.md): identical back-to-back builds on this shared
    # host vary ~25% with ambient load; the best estimates quiet-host cost
    best = None
    seg = None
    for trial in range(2):
        tdir = out if trial == 0 else tempfile.mkdtemp(prefix="ivfadc_bench_idx2_")
        t0 = time.time()
        s = build_index(spark, tx, tdir, cfg=cfg)
        s.blocks.count()  # materialize
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
        if trial == 0:
            seg = s  # queries run against the first (kept) segment
        else:
            shutil.rmtree(tdir, ignore_errors=True)
    timings["index_build"] = round(best, 3)
    extra["turns_per_sec"] = round(n_turns / timings["index_build"], 1)

    # ---- query batch: 200 seeded multi-term queries via WAND
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{i:05d}" for i in range(2000)]
    qtexts = [
        " ".join(rng.choice(vocab[: int(2000 * 0.8)], size=rng.integers(1, 5)))
        for _ in range(200)
    ]
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": range(200), "text": qtexts}),
        schema="query_id long, text string",
    )
    _ = bm25_topk_indexed(qdf.limit(8), seg, k=10).collect()  # warm-up
    qbest, res = None, []
    for _t in range(2):
        t0 = time.time()
        res = bm25_topk_indexed(qdf, seg, k=10).collect()
        wall = time.time() - t0
        qbest = wall if qbest is None else min(qbest, wall)
    timings["bm25_query_batch"] = round(qbest, 3)
    extra["qps"] = round(200 / timings["bm25_query_batch"], 1)
    extra["result_rows"] = len(res)

    # ---- representatives from the driver contract (best of two)
    for name in ("bm25_topk_dataframe", "lineitem_agg", "revenue_per_nation", "minhash_signatures"):
        fn = DQ.QUERIES[name]
        w = None
        for _t in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            w = time.time() - t0 if w is None else min(w, time.time() - t0)
        timings[name] = round(w, 3)

    shutil.rmtree(out, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
