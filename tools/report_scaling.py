"""Compute N-vs-4N scaling efficiency from two bench_scaling.py outputs and
write BENCH/BASELINE.md (the recorded evidence for the north_rule's
two-cluster-size criterion, per the sandbox protocol in BASELINE.md)."""

import json
import os
import sys


def main() -> None:
    p8, p32 = sys.argv[1], sys.argv[2]
    with open(p8) as f:
        r8 = json.load(f)
    with open(p32) as f:
        r32 = json.load(f)
    ratio = r32["cores"] / r8["cores"]
    eff_build = (r32["turns_per_sec"] / r8["turns_per_sec"]) / ratio
    eff_query = (r32["qps"] / r8["qps"]) / ratio

    lines = [
        "# BENCH/BASELINE — measured throughput & scaling efficiency",
        "",
        "Protocol: `tools/run_scaling.sh` — the same spark-submit job",
        "(`jobs/bench_scaling.py`) on the SAME input parquet at two local",
        "parallelism levels, the sandbox substitute for N vs 4N executors",
        "(BASELINE.md / north_rule). Deterministic corpus, seed=42.",
        "",
        f"- corpus: {r8['n_turns']:,} turns; query batch: {r8['n_queries']:,} "
        f"seeded multi-term queries, top-10, one warm-up batch",
        "",
        "| metric | local[8] | local[32] | ratio | efficiency (ratio/4) |",
        "|---|---|---|---|---|",
        f"| index build (turns/sec) | {r8['turns_per_sec']:,.1f} | "
        f"{r32['turns_per_sec']:,.1f} | "
        f"{r32['turns_per_sec'] / r8['turns_per_sec']:.2f}x | **{eff_build:.3f}** |",
        f"| query throughput (QPS) | {r8['qps']:,.1f} | {r32['qps']:,.1f} | "
        f"{r32['qps'] / r8['qps']:.2f}x | **{eff_query:.3f}** |",
        "",
        f"- index build wall: {r8['index_build_sec']}s @8 -> {r32['index_build_sec']}s @32",
        f"- query batch wall: {r8['query_batch_sec']}s @8 -> {r32['query_batch_sec']}s @32",
        f"- per-stage wall @32: {json.dumps(r32['stages'])}",
        f"- per-stage wall @8:  {json.dumps(r8['stages'])}",
        "",
        f"Target: efficiency >= 0.8 (north_rule). Build: "
        f"{'PASS' if eff_build >= 0.8 else 'MISS'} ({eff_build:.3f}); query: "
        f"{'PASS' if eff_query >= 0.8 else 'MISS'} ({eff_query:.3f}).",
        "",
        "Raw runs: `BENCH/run_n8.json`, `BENCH/run_n32.json`.",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(p8)), "BASELINE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
