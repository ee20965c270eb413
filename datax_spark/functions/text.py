"""Text-analysis operators for training-data pipelines.

All hot-path scoring is JVM-side Column expressions (whole-stage
codegen; no Python in the scan), designed to be SQL-expressible so the
driver's DuckDB oracle can validate them. The pandas-UDF variants for
non-SQL-expressible pieces live in functions/content.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic (public-knowledge common words)
EN_MARKERS = [" the ", " and ", " of ", " to ", " is "]


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of [a-zA-Z] characters."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(alpha / n)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def stopword_hits(col: Column | str, markers: list[str] | None = None) -> Column:
    """Total occurrences of language-marker words (n-gram heuristic)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    hits = None
    for m in markers or EN_MARKERS:
        # occurrences of m = (len - len(remove(m))) / len(m)
        h = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
        hits = h if hits is None else hits + h
    return hits.cast("long")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length band + alpha ratio +
    stopword density (the classic cheap pre-filter for web/corpus
    text; each term is SQL-expressible for oracle parity)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    dens = F.least(stopword_hits(c) / F.greatest(n_tok, F.lit(1)) * 10.0, F.lit(1.0))
    return F.round((len_ok + alpha_ratio(c) + dens) / 3.0, 6)


def lang_id_en(col: Column | str, min_hits: int = 2) -> Column:
    """Heuristic language ID: 'en' when enough English markers appear,
    else 'other'. (A real model is out of scope; the plumbing — cheap
    JVM-side classification feeding a partition column — is the point.)"""
    return F.when(stopword_hits(col) >= min_hits, F.lit("en")).otherwise(F.lit("other"))
