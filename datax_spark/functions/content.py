"""Arrow-vectorized content transforms (pandas UDFs).

The north_star mandates that user content transforms run through
vectorized Arrow/pandas UDFs — never per-row Python. These are the
dx_groovy analogs (``GroovyTransformer.java:25-91`` compiles user code
per record; we batch via Arrow instead). Each UDF receives a
``pd.Series`` per Arrow batch (~10k rows), so Python overhead is
amortized per batch, not per row.

Where a JVM builtin exists (sha2, md5, length) prefer it — these UDFs
exist for transforms Spark cannot express (custom hashing, tokenizer
heuristics) and for the contractual "content transforms are Arrow
UDFs" path in the replay engine.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def sha256_hex(s: pd.Series) -> pd.Series:
    """sha256 hex digest of a string column (None-safe)."""
    return s.map(
        lambda v: hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
    )


@pandas_udf(T.StringType())
def normalize_trailing_ws(s: pd.Series) -> pd.Series:
    """Strip trailing whitespace per line — a typical code-content
    normalization pass before hashing/dedup."""
    pat = re.compile(r"[ \t]+(?=\n)|[ \t]+$")
    return s.map(lambda v: pat.sub("", v) if v is not None else None)


_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


@pandas_udf(T.IntegerType())
def token_count_bpeish(s: pd.Series) -> pd.Series:
    """BPE-ish token count: word pieces + punctuation marks."""
    return s.map(lambda v: len(_TOKEN_RE.findall(v)) if v is not None else None).astype(
        "Int32"
    )


@pandas_udf(T.LongType())
def rolling_fingerprint(s: pd.Series) -> pd.Series:
    """64-bit polynomial rolling-hash document fingerprint
    (deterministic, order-sensitive)."""

    def fp(v: str | None) -> int | None:
        if v is None:
            return None
        h = 1469598103934665603  # FNV-1a 64 offset
        for ch in v.encode("utf-8"):
            h = ((h ^ ch) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
        return h

    return s.map(fp).astype("Int64")


def with_content_sha(df: DataFrame, col: str = "content", out: str = "content_sha256") -> DataFrame:
    """Engine-internal: JVM-side sha2 for the correctness invariant
    (used in verification paths where no Python is needed at all)."""
    return df.withColumn(out, F.sha2(F.col(col), 256))
