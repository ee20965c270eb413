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
