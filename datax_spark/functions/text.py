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


# --- PII scrubbing (training-data hygiene) ---------------------------------

# patterns restricted to the regex subset Java (Spark) and RE2/DuckDB
# agree on: no backrefs, no lookaround. Order matters: emails before
# the generic number patterns so 'a@b.com' never half-matches.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # CARD (13-19 digits — covers Maestro's 19) before PHONE so long
    # digit runs do not half-match as phones; PHONE requires a leading
    # '+' or word boundary so it can never bite the TAIL of a longer
    # digit run (RE2 has no lookbehind, so \b|\+ is the portable
    # anchor). Residual risk, by construction: a 20+-digit run matches
    # neither pattern and is left unredacted rather than half-redacted.
    (r"\b\d(?:[ -]?\d){12,18}\b", "<CARD>"),
    (r"(?:\+|\b)\d(?:[ ()-]?\d){6,11}\b", "<PHONE>"),
]


def scrub_pii(col: Column | str, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Replace common PII shapes (emails, IPs, phone/card numbers)
    with typed placeholder tokens — the standard pre-training
    redaction pass, chained ``regexp_replace`` so the whole scrub is
    one codegen'd projection (no Python in the scan). Patterns are
    deliberately in the Java∩RE2 regex subset so the same strings run
    in the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_hits(col: Column | str, patterns: list[tuple[str, str]] | None = None) -> Column:
    """How many substitutions :func:`scrub_pii` would make — the
    audit metric. Counts actual pattern MATCHES (``regexp_count`` on
    the progressively-scrubbed text, mirroring the sequential replace
    chain), so placeholder tokens already present in the source text
    are never miscounted as redactions (re-scrubbing already-scrubbed
    data reports 0)."""
    c = F.col(col) if isinstance(col, str) else col
    total = None
    for pat, repl in patterns or PII_PATTERNS:
        occ = F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, repl)
        total = occ if total is None else total + occ
    return total.cast("long")


# --- Repetition stats (Gopher-style quality signals) -----------------------


def dup_line_fraction(col: Column | str) -> Column:
    """Fraction of lines that are duplicates of an earlier line
    (0 for texts of <= 1 line) — the classic boilerplate/spam signal.
    Pure array expressions: split → array_distinct → size arithmetic,
    fully codegen'd and SQL-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    n = F.size(lines)
    uniq = F.size(F.array_distinct(lines))
    return F.when(n <= 1, F.lit(0.0)).otherwise((n - uniq) / n)


def dup_word_fraction(col: Column | str) -> Column:
    """Fraction of whitespace tokens that repeat an earlier token."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    return F.when(n <= 1, F.lit(0.0)).otherwise((n - uniq) / n)
