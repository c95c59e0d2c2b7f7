"""1 Hz whole-host CPU sampler from /proc/stat — profiling aid for the
scaling legs. Prints one line per second: epoch, busy%, user%, sys%, iowait%.

    python tools/cpusample.py > /tmp/cpu.log &
    ... run the leg ...
    kill %1

A leg that shows long low-busy valleys is blocked on serial/driver work or
scheduling gaps, not on compute — that distinction decides which
optimization actually moves the scaling ratio (BENCH/NARRATIVE.md).
"""

import sys
import time


def read_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    user, nice, system, idle, iowait = vals[0], vals[1], vals[2], vals[3], vals[4]
    total = sum(vals)
    return user + nice, system, idle, iowait, total


def main():
    prev = read_stat()
    while True:
        time.sleep(1.0)
        cur = read_stat()
        du = cur[0] - prev[0]
        ds = cur[1] - prev[1]
        di = cur[2] - prev[2]
        dw = cur[3] - prev[3]
        dt = cur[4] - prev[4] or 1
        busy = 100.0 * (dt - di - dw) / dt
        print(
            f"{time.time():.1f} busy={busy:5.1f}% user={100.0 * du / dt:5.1f}% "
            f"sys={100.0 * ds / dt:5.1f}% iowait={100.0 * dw / dt:5.1f}%",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        sys.exit(0)
