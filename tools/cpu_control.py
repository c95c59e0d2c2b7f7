"""Hardware-ceiling control for the scaling protocol: measure raw CPU
throughput (pure-python busy loops, no memory traffic) at the same two
pinned core counts the engine legs use. The resulting efficiency is the
*upper bound any code can reach on this host* — shared-host interference and
frequency/contention effects cap it below 1.0 regardless of workload.

    python tools/cpu_control.py --n1 4 --n2 16 --out BENCH/cpu_control.json
"""

import argparse
import json
import multiprocessing as mp
import os
import time


def _burn(seconds: float) -> int:
    t = time.monotonic()
    x = 0
    while time.monotonic() - t < seconds:
        x += 1
    return x


def _burn_star(args):
    return _burn(args)


def _stream(seconds: float) -> float:
    """Streaming read+write over a 256 MB resident buffer, zero allocation
    per iteration — the memory-bandwidth analog of the busy loop. Returns
    bytes/sec touched."""
    import numpy as np

    arr = np.ones(32 * 1024 * 1024, dtype=np.int64)  # 256 MB
    out = np.empty_like(arr)
    np.multiply(arr, 3, out=out)  # fault-in before timing
    t = time.monotonic()
    iters = 0
    while time.monotonic() - t < seconds:
        np.multiply(arr, 3, out=out)
        iters += 1
    return iters * arr.nbytes * 2 / (time.monotonic() - t)


def _stream_star(args):
    return _stream(args)


def measure(n: int, seconds: float = 5.0, fn=_burn_star) -> float:
    os.sched_setaffinity(0, range(n))  # children inherit
    try:
        with mp.Pool(n) as p:
            counts = p.map(fn, [seconds] * n)
    finally:
        os.sched_setaffinity(0, range(os.cpu_count()))
    return sum(counts) / seconds if fn is _burn_star else sum(counts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="BENCH/cpu_control.json")
    args = ap.parse_args()

    r1 = max(measure(args.n1) for _ in range(args.trials))
    r2 = max(measure(args.n2) for _ in range(args.trials))
    eff = (r2 / r1) / (args.n2 / args.n1)
    s1 = max(measure(args.n1, fn=_stream_star) for _ in range(args.trials))
    s2 = max(measure(args.n2, fn=_stream_star) for _ in range(args.trials))
    seff = (s2 / s1) / (args.n2 / args.n1)
    result = {
        "n1": args.n1,
        "n2": args.n2,
        "rate_n1": r1,
        "rate_n2": r2,
        "ceiling_efficiency": round(eff, 3),
        # single-socket DRAM-bandwidth ceiling: every real workload touches
        # memory, so this (not the busy loop) is the honest upper bound for
        # bandwidth-sensitive stages like encode/TAAT
        "stream_gbps_n1": round(s1 / 1e9, 1),
        "stream_gbps_n2": round(s2 / 1e9, 1),
        "stream_ceiling_efficiency": round(seff, 3),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
