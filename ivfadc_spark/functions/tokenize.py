"""Tokenization — the full-text graft of the reference's only text surface.

The reference's tokenizer is ``Util::strtok`` + L2 normalize
(/root/reference/util.h:106-113, /root/reference/util.h:164-172): trivial
whitespace splitting applied per row before quantization. Ours: lowercase,
split on runs of non-[a-z0-9], drop empties.

Two implementations with identical output:

- :func:`tokens_col` — pure Catalyst expression (JVM-side, whole-stage
  codegen; the default — faster than any UDF and oracle-parity with
  DuckDB's ``regexp_split_to_array``).
- :func:`tokenize_arrow` — Arrow-batched ``pandas_udf`` (the north-star's
  "vectorized Arrow UDF" form; kept for API parity and as the template for
  tokenizers Catalyst can't express, e.g. BPE).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ivfadc_spark.config import DEFAULT

TOKEN_PATTERN = DEFAULT.token_pattern


def tokens_col(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """array<string> of tokens, JVM-side (codegen'd, no Python)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(F.lower(c), pattern), "")


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_arrow(text: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer; output identical to :func:`tokens_col`."""
    import re

    pat = re.compile(TOKEN_PATTERN)
    return text.fillna("").map(
        lambda s: [t for t in pat.split(s.lower()) if t]
    )


def duckdb_tokens_sql(col: str = "text", pattern: str = TOKEN_PATTERN) -> str:
    """DuckDB expression producing the same token array (oracle parity)."""
    return f"list_filter(regexp_split_to_array(lower({col}), '{pattern}'), t -> t <> '')"
