"""As-of (temporal) joins — the point-in-time enrichment operator
Spark's DataFrame API lacks natively: match each left row to the
LATEST right row at-or-before its timestamp per key (direction
"backward", the DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
semantics), or the EARLIEST at-or-after ("forward").

Reference relevance: DataX jobs routinely land a change-history table
and then re-extract "state as of each event" with hand-written
correlated SQL per run (the otsstreamreader multi-version output is
exactly such a history; otsstreamreader/doc explains reconstructing
state at a timestamp). This operator makes that a first-class,
scalable primitive over any (key, time)-ordered pair of DataFrames —
including the engine's own SCD2 history tables (``asof_enrich_scd2``).

Physical shape — why this scales where the naive plan doesn't:

* the naive expression (a range join ``l.k = r.k AND r.ts <= l.ts``
  + a per-row max) plans as a join with a non-equi residual whose
  skewed key groups blow up quadratically, then a second shuffle for
  the max. This implementation is the UNION + WINDOW formulation:
  tag both inputs, union them, and run ONE window
  ``last(right_payload, ignorenulls=true)`` ordered by
  ``(ts, side)`` per key — right rows sort before left rows at equal
  timestamps, so the running last-non-null IS the as-of match
  (inclusive, pandas ``allow_exact_matches=True``).
* cost: one Exchange on the key columns + one in-partition sort,
  whole-stage-codegen'd end to end — no Python, no range-join
  explosion, linear in |left| + |right| per key. At 10^10 rows the
  sort is the same per-bucket work the engine's merge already does.
* ``tolerance`` bounds match staleness (backward: reject matches
  older than ``left_ts - tolerance``) without changing the plan —
  the match's own timestamp rides the payload struct and the bound
  is a post-projection filter.

Determinism precondition: the right side must be unique per
(key, ts tuple) — the standard as-of contract (DuckDB raises on
ties; pandas picks arbitrarily). De-duplicate upstream (e.g.
``operators.lww_dedup``) if unsure; this operator does not guess a
winner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAY = "__asof_pay"
_MATCHED = "__asof_matched"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: list[str] | str,
    right_ts: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    right_prefix: str = "",
    how: str = "left",
    direction: str = "backward",
    tolerance: Column | None = None,
    inclusive: bool = True,
    _keep_matched: bool = False,
) -> DataFrame:
    """Enrich ``left`` with the as-of matching row of ``right``.

    ``on``: equality key columns (same names both sides).
    ``left_ts`` / ``right_ts``: timestamp column or lexicographic
    tuple of columns (e.g. ``["commit", "lsn"]``); ``right_ts``
    defaults to the same names as ``left_ts``. Multi-column tuples
    compare lexicographically, exactly like the engine's LWW order.
    ``right_cols``: right payload to carry (default: everything
    except ``on`` + ``right_ts``), emitted as ``right_prefix + name``.
    ``how``: ``"left"`` (unmatched rows null-filled) or ``"inner"``.
    ``direction``: ``"backward"`` (latest at-or-before), ``"forward"``
    (earliest at-or-after) or ``"nearest"`` (smaller |gap| of the two,
    ties to backward — pandas parity; single-column ts only); all
    inclusive by default.
    ``tolerance``: max allowed ``|left_ts - match_ts|`` on the FIRST
    ts column, as a Column/literal (e.g. ``F.expr("INTERVAL 1
    HOUR")`` or a number for numeric ts); matches outside it are
    treated as misses. Only single-column ts supports tolerance.
    ``inclusive``: whether an equal-timestamp right row matches
    (pandas ``allow_exact_matches``); False = strictly before/after.
    """
    lts = [left_ts] if isinstance(left_ts, str) else list(left_ts)
    rts_in = right_ts if right_ts is not None else lts
    rts = [rts_in] if isinstance(rts_in, str) else list(rts_in)
    if len(lts) != len(rts):
        raise ValueError(f"ts tuple arity differs: {lts} vs {rts}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if tolerance is not None and len(lts) > 1:
        raise ValueError("tolerance requires a single-column ts")
    if direction == "nearest" and len(lts) > 1:
        raise ValueError(
            "direction='nearest' requires a single-column ts (a gap "
            "between lexicographic tuples has no magnitude)"
        )
    for c in on:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key column {c!r} missing from a side")
    # ts columns must be comparable: the union + window sort silently
    # coerces mismatched types (int vs string sorts lexically!) into
    # wrong matches, so refuse upfront unless exact or safe-widening
    # (JoinView.create does the same for its join pair)
    from datax_spark.operators.schema_evolution import widened_type

    for lc, rc in zip(lts, rts):
        if lc not in left.columns:
            raise ValueError(f"left ts column {lc!r} missing")
        if rc not in right.columns:
            raise ValueError(f"right ts column {rc!r} missing")
        ldt, rdt = left.schema[lc].dataType, right.schema[rc].dataType
        if ldt != rdt and widened_type(ldt, rdt) is None:
            raise ValueError(
                f"as-of ts columns {lc!r}/{rc!r} are not comparable: "
                f"{ldt.simpleString()} vs {rdt.simpleString()} — cast "
                "one side explicitly"
            )
    if right_cols is None:
        drop = set(on) | set(rts)
        right_cols = [c for c in right.columns if c not in drop]
    out_names = [right_prefix + c for c in right_cols]
    collide = set(out_names) & set(left.columns)
    if collide:
        raise ValueError(
            f"output collision(s) {sorted(collide)} — set right_prefix"
        )

    # unify the ts column names onto the left's; carry the match's own
    # ts inside the payload struct (tolerance + introspection)
    pay = F.struct(
        *[F.col(c).alias(f"__ts_{i}") for i, c in enumerate(rts)],
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    )
    # side ordering at EQUAL ts decides exact-match semantics: the
    # running last-non-null sees only rows sorting at-or-before the
    # left row, so right rows sort before left (0 < 1) iff inclusive
    # a NULL timestamp never participates in an as-of match (DuckDB
    # ASOF / pandas merge_asof semantics): NULL-ts right rows are
    # dropped (under ASC NULLS FIRST they would otherwise match
    # "before everything" in the backward direction), and NULL-ts
    # left rows are forced to a miss below
    r_nonnull = right
    for c in rts:
        r_nonnull = r_nonnull.filter(F.col(c).isNotNull())
    r = r_nonnull.select(
        *on,
        *[F.col(rc).alias(lc) for lc, rc in zip(lts, rts)],
        pay.alias(_PAY),
        F.lit(0 if inclusive else 2).alias(_SIDE),
    )
    l_tag = left.select(
        "*", F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        F.lit(1).alias(_SIDE),
    ).select(*left.columns, _PAY, _SIDE)
    u = l_tag.unionByName(r.select(*on, *lts, _PAY, _SIDE), allowMissingColumns=True)

    def running_last(desc: bool):
        order = [F.col(c).desc() if desc else F.col(c).asc() for c in lts]
        w = (
            Window.partitionBy(*on)
            .orderBy(*order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_PAY, ignorenulls=True).over(w)

    if direction == "nearest":
        # both one-sided matches over the SAME exchange (two in-
        # partition sorts, no second shuffle); pick the smaller |gap|,
        # ties to backward (pandas merge_asof direction='nearest')
        mb, mf = running_last(False), running_last(True)
        gb = F.col(lts[0]) - mb.getField("__ts_0")
        gf = mf.getField("__ts_0") - F.col(lts[0])
        vb, vf = mb.isNotNull(), mf.isNotNull()
        if tolerance is not None:
            vb = vb & (gb <= tolerance)
            vf = vf & (gf <= tolerance)
        m = F.when(vb & (~vf | (gb <= gf)), mb).when(vf, mf)
    else:
        m = running_last(desc=direction == "forward")
        if tolerance is not None:
            gap = (
                (F.col(lts[0]) - m.getField("__ts_0"))
                if direction == "backward"
                else (m.getField("__ts_0") - F.col(lts[0]))
            )
            m = F.when(gap <= tolerance, m)
    matched = m.isNotNull()
    for c in lts:
        matched = matched & F.col(c).isNotNull()
    out = (
        u.withColumn(_MATCHED, matched)
        .withColumn(_PAY, F.when(F.col(_MATCHED), m))
        .filter(F.col(_SIDE) == 1)
        .select(
            *left.columns,
            *[F.col(_PAY).getField(n).alias(n) for n in out_names],
            F.col(_MATCHED),
        )
    )
    if how == "inner":
        out = out.filter(F.col(_MATCHED))
    return out if _keep_matched else out.drop(_MATCHED)


def asof_enrich_scd2(
    fact: DataFrame,
    history: DataFrame,
    on: list[str],
    fact_ts: list[str] | str,
    valid_from: list[str] | str,
    valid_to: list[str] | str,
    right_cols: list[str] | None = None,
    right_prefix: str = "",
    how: str = "left",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 history table
    (lake/scd2.py layout: one row per version with a
    ``[valid_from, valid_to)`` interval, open rows have NULL
    valid_to): each fact row gets the dim version whose interval
    contains its timestamp. A backward as-of on valid_from finds the
    LAST version opened at-or-before the fact ts; the interval check
    then rejects it when that version was already CLOSED before the
    fact ts (key deleted — SQL semantics: no match), which a plain
    as-of join cannot express."""
    fts = [fact_ts] if isinstance(fact_ts, str) else list(fact_ts)
    vf = [valid_from] if isinstance(valid_from, str) else list(valid_from)
    vt = [valid_to] if isinstance(valid_to, str) else list(valid_to)
    if not (len(fts) == len(vf) == len(vt)):
        raise ValueError("fact_ts / valid_from / valid_to arity differs")
    if right_cols is None:
        drop = set(on) | set(vf) | set(vt)
        right_cols = [c for c in history.columns if c not in drop]
    # carry valid_to through the join to evaluate interval containment
    carried = list(right_cols) + vt
    j = asof_join(
        fact,
        history,
        on=on,
        left_ts=fts,
        right_ts=vf,
        right_cols=carried,
        right_prefix=right_prefix,
        how="left",
        direction="backward",
        _keep_matched=True,
    )
    vt_out = [right_prefix + c for c in vt]
    # lexicographic "fact_ts < valid_to": open intervals (NULL
    # valid_to) always contain; closed ones need ts strictly below.
    # Matchedness comes from the join's own flag, never from payload
    # nullability — a matched version whose attribute IS NULL is still
    # a match, and an unmatched row's NULL valid_to is not "open".
    open_iv = F.col(vt_out[0]).isNull()
    lt = F.lit(False)
    for i in reversed(range(len(vt_out))):
        f_c, t_c = F.col(fts[i]), F.col(vt_out[i])
        lt = (f_c < t_c) | ((f_c == t_c) & lt)
    keep = F.col(_MATCHED) & (open_iv | lt)
    out_names = [right_prefix + c for c in right_cols]
    proj = [
        F.when(keep, F.col(n)).alias(n) if n in out_names else F.col(n)
        for n in list(fact.columns) + out_names
    ]
    if how == "inner":
        return j.filter(keep).select(*proj)
    return j.select(*proj)
