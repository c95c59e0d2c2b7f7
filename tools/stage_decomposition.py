"""Per-stage build-scaling decomposition vs the window's measured host
ceilings (the round-4 verdict's alternative 'done' criterion: show every
stage at >= 0.9 of the ceiling that binds it, with 00_doc_map not an
outlier).

    python tools/stage_decomposition.py 4 16 33 31 BENCH/cpu_control_t31.json

Per-stage efficiency = (best wall@N1 / best wall@N2) / (N2/N1), with the
per-stage best (minimum wall) taken across the window's trials per leg —
the same minima-estimate-quiet-host convention as the headline protocol.
Each stage is then read against the ceiling that binds it:

  head (id-assign sample+count jobs)  -> busy-loop ceiling (CPU/latency)
  00_doc_map / 01_blocks / 02_dict    -> stream ceiling (the build's data
     path is dominated by memory traffic: shuffle, sort, Arrow, parquet)

'of ceiling' = stage efficiency / ceiling efficiency for that class; a
stage at >= 0.9 of its ceiling is scaling as well as this host's memory
system allows a one-socket 4x-cores comparison to show.
"""

import json
import os
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def load(n, trials, start):
    out = []
    for t in range(start, trials + 1):
        p = os.path.join(BENCH, f"run_n{n}_t{t}.json")
        if os.path.exists(p):
            out.append(json.load(open(p)))
    if not out:
        raise SystemExit(f"no trial files for n={n} in t{start}..t{trials}")
    return out


def main():
    n1, n2 = int(sys.argv[1]), int(sys.argv[2])
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    start = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    cpath = sys.argv[5] if len(sys.argv) > 5 else os.path.join(BENCH, "cpu_control.json")
    ctl = json.load(open(cpath))
    busy, stream = ctl["ceiling_efficiency"], ctl.get("stream_ceiling_efficiency")
    r1s, r2s = load(n1, trials, start), load(n2, trials, start)
    ratio = n2 / n1

    def best_stage(rs, key):
        vals = []
        for r in rs:
            if key == "head":
                v = r.get("assign_s") or (r.get("stage00") or {}).get("assign_s")
            else:
                v = (r.get("stages") or {}).get(key)
            if v:
                vals.append(float(v))
        return min(vals) if vals else None

    rows = []
    for key, ceil_name, ceil in [
        ("head", "busy", busy),
        ("00_doc_map", "stream", stream),
        ("01_blocks", "stream", stream),
        ("02_dict", "stream", stream),
    ]:
        a, b = best_stage(r1s, key), best_stage(r2s, key)
        if a is None or b is None or ceil is None:
            continue
        eff = (a / b) / ratio
        rows.append((key, a, b, eff, ceil_name, ceil, eff / ceil))
    t1 = min(r["index_build_sec"] for r in r1s)
    t2 = min(r["index_build_sec"] for r in r2s)
    tot = (t1 / t2) / ratio

    print(f"window t{start}..t{trials}  {n1}v{n2}  control={os.path.basename(cpath)} "
          f"(busy {busy:.3f}, stream {stream:.3f})")
    print(f"{'stage':<12} {'@' + str(n1) + 's':>8} {'@' + str(n2) + 's':>8} "
          f"{'eff':>6} {'ceiling':>8} {'of-ceil':>8}")
    for key, a, b, eff, cn, c, frac in rows:
        print(f"{key:<12} {a:>8.2f} {b:>8.2f} {eff:>6.3f} {cn + f' {c:.3f}':>8} {frac:>8.3f}")
    print(f"{'TOTAL build':<12} {t1:>8.2f} {t2:>8.2f} {tot:>6.3f} "
          f"{'stream ' + format(stream, '.3f'):>8} {tot / stream:>8.3f}")


if __name__ == "__main__":
    main()
