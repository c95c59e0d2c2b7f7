"""spark-submit job: audit a segment's structural integrity.

    spark-submit --py-files dist/engine.zip jobs/fsck.py \
        --index /path/index [--deep] [--out findings.parquet]

Exit code 0 = healthy (no findings), 1 = findings (printed, and written to
--out if given). ``--deep`` adds the full dictionary-vs-blocks recompute
(one index scan). The ops counterpart of the reference's unchecked binary
loads (/root/reference/IO.h:236-271) — see operators/fsck.py for the
invariant list.
"""

import _bootstrap  # noqa: F401
import argparse
import os
import sys

from ivfadc_spark.operators.fsck import fsck_segment
from ivfadc_spark.operators.segments import Segment
from ivfadc_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index dir (contains segment/) or segment dir")
    ap.add_argument("--deep", action="store_true", help="also recompute dictionary df/cf from blocks")
    ap.add_argument("--out", help="optional parquet output for the findings")
    args = ap.parse_args()

    spark = get_spark("ivfadc-fsck")
    seg_path = args.index
    if os.path.isdir(os.path.join(seg_path, "segment")):
        seg_path = os.path.join(seg_path, "segment")
    seg = Segment(spark, seg_path)
    findings = fsck_segment(seg, deep=args.deep)
    if args.out:
        findings.write.mode("overwrite").parquet(args.out)
        findings = spark.read.parquet(args.out)
    rows = findings.limit(1000).collect()
    for r in rows:
        print(f"{r['check']}\t{r['key']}\t{r['detail']}")
    n = len(rows)
    print(f"fsck: {'HEALTHY' if n == 0 else f'{n}+ finding(s)'} at {seg_path}")
    return 0 if n == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
