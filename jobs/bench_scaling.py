"""spark-submit job: throughput at one parallelism level, for the N-vs-4N
scaling-efficiency protocol (BASELINE.md).

    spark-submit --master local[8]  --py-files dist/engine.zip \
        jobs/bench_scaling.py --corpus /tmp/scaling_tx.parquet --out BENCH/run_n8.json
    spark-submit --master local[32] --py-files dist/engine.zip \
        jobs/bench_scaling.py --corpus /tmp/scaling_tx.parquet --out BENCH/run_n32.json

Both runs MUST point at the same --corpus parquet (generated deterministically
on first use; seed fixed) so the scaling comparison holds input constant, the
sandbox substitute for "same job, N vs 4N executors" (north_rule). Measures:

  - index build wall seconds -> turns/sec  (tokenize -> postings -> segment,
    cold output dir each run)
  - top-10 BM25 batch over --queries seeded multi-term queries -> QPS
    (one warm-up batch first)

Writes ONE json file with both throughputs plus the per-stage manifest.
"""

import _bootstrap  # noqa: F401
import argparse
import json
import os
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="transcripts parquet; generated if absent")
    ap.add_argument("--n-conv", type=int, default=320_000, help="conversations if generating")
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from ivfadc_spark.config import EngineConfig
    from ivfadc_spark.operators.wand import bm25_topk_batch
    from ivfadc_spark.plans.build_index import build_index
    from ivfadc_spark.session import get_spark, wait_for_executors
    from ivfadc_spark.sources.transcripts import synth_transcripts_fast_pdf

    spark = get_spark("ivfadc-bench-scaling")
    master = spark.sparkContext.master
    # local-cluster[n,c,m]: executors are separate JVMs that register
    # asynchronously — wait so the measured window runs fully parallel
    cores = wait_for_executors(spark)

    if not os.path.exists(args.corpus):
        pdf = synth_transcripts_fast_pdf(
            n_conversations=args.n_conv, seed=42, vocab_size=args.vocab
        )
        spark.createDataFrame(
            pdf,
            schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        ).repartition(64).write.mode("overwrite").parquet(args.corpus)

    tx = spark.read.parquet(args.corpus)
    n_turns = tx.count()

    cfg = EngineConfig(block_size=256, doc_shards=32)

    # ---- warm-up: tiny end-to-end build+query so JIT compilation and the
    # Python-worker pool spawn are excluded from the measured window (they
    # are per-process costs, not per-byte costs; a real cluster amortizes
    # them over job lifetime)
    warm_pdf = synth_transcripts_fast_pdf(n_conversations=1500, seed=1)
    warm_tx = spark.createDataFrame(
        warm_pdf,
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(cores * 2)
    warm_dir = tempfile.mkdtemp(prefix="ivfadc_scaling_warm_")
    build_index(spark, warm_tx, warm_dir, cfg=cfg).blocks.count()
    shutil.rmtree(warm_dir, ignore_errors=True)

    # ---- index build (measured) ----
    out_idx = tempfile.mkdtemp(prefix="ivfadc_scaling_idx_")
    t0 = time.time()
    seg = build_index(spark, tx, out_idx, cfg=cfg)
    seg.blocks.count()
    build_s = time.time() - t0

    # ---- query batch (doc-sharded throughput path) ----
    # realistic mix: 3-8 informative terms per query, Zipf-weighted over the
    # mid band (ranks 200..vocab) — stopword-band head terms excluded, like
    # real search queries
    rng = np.random.default_rng(7)
    lo_r, hi_r = 200, args.vocab
    ranks = np.arange(lo_r, hi_r, dtype=np.float64)
    w = (1.0 / ranks) / (1.0 / ranks).sum()
    nq = args.queries
    n_terms = rng.integers(3, 9, size=nq)
    draws = rng.choice(np.arange(lo_r, hi_r), size=int(n_terms.sum()), p=w)
    terms_flat = np.array([f"w{i:05d}" for i in draws])
    qtexts = pd.Series(terms_flat).groupby(np.repeat(np.arange(nq), n_terms)).agg(" ".join)
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(nq, dtype=np.int64), "text": qtexts.to_numpy()}),
        schema="query_id long, text string",
    )
    qdf = qdf.repartition(cores).cache()
    qdf.count()
    bm25_topk_batch(qdf.limit(256), seg, k=args.k, cfg=cfg).collect()  # warm-up
    query_s = float("inf")
    for _trial in range(2):  # best-of-2: suppress run-to-run shuffle jitter
        t0 = time.time()
        rows = bm25_topk_batch(qdf, seg, k=args.k, cfg=cfg).collect()
        query_s = min(query_s, time.time() - t0)

    with open(os.path.join(out_idx, "_manifest.json")) as f:
        manifest = json.load(f)
    shutil.rmtree(out_idx, ignore_errors=True)

    result = {
        "master": master,
        "cores": cores,
        "n_turns": int(n_turns),
        "index_build_sec": round(build_s, 3),
        "turns_per_sec": round(n_turns / build_s, 1),
        "n_queries": args.queries,
        "query_batch_sec": round(query_s, 3),
        "qps": round(args.queries / query_s, 1),
        "result_rows": len(rows),
        "stages": {k: v.get("wall_s") for k, v in manifest["stages"].items()},
        "assign_s": manifest["stages"].get("00_doc_map", {}).get("assign_s"),
        "stage00": manifest["stages"].get("00_doc_map"),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
