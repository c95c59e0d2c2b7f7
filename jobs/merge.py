"""spark-submit job: log-structured merge of segments (U1 analog).

    spark-submit --py-files dist/engine.zip jobs/merge.py \
        --segments /idx/a/segment /idx/b/segment --out /idx/merged
"""

import _bootstrap  # noqa: F401
import argparse
import json

from ivfadc_spark.operators.segments import merge_segments
from ivfadc_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    spark = get_spark("ivfadc-merge")
    seg = merge_segments(spark, args.segments, args.out)
    print(json.dumps(seg.meta))


if __name__ == "__main__":
    main()
