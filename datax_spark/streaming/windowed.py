"""Event-time windowed aggregation with watermarks — the late-data
half of the streaming surface (readStream -> watermark -> window agg
-> append sink).

The reference has no event-time semantics at all (its change stream
is replayed by storage order within [startTs, endTs),
``OTSStreamReaderMasterProxy.java:28-63``); watermarked windows are
what replaces that fixed-window batch contract in a continuous
pipeline: a window emits once the watermark (max event time seen
minus the allowed lateness) passes its end, and events older than the
watermark are dropped instead of reopening closed windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window_duration: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with a lateness watermark.

    Append-mode semantics: a (window, group) row is emitted exactly
    once, when the watermark passes window.end + lateness; later
    events for that window are dropped (counted by the state-store
    metrics). Works identically over a live stream and an
    availableNow backfill.
    """
    # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
    # cast is a reinterpretation, not a shift
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(group_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            F.round("sum_value", 4).alias("sum_value_r"),
        )
    )


def session_windowed_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows per key (native ``F.session_window``,
    Spark's dynamic-gap analog of the batch sessionization query):
    a session closes once ``gap`` passes with no event for the key,
    then emits exactly once after the watermark clears it. This is
    the streaming form of the contract's ``event_sessionization``
    query (lag + cumulative-start counter), expressed with the
    engine-native operator instead of a custom stateful UDF — state
    merging of overlapping sessions is handled by the state store.
    """
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "session_value",
        )
    )
