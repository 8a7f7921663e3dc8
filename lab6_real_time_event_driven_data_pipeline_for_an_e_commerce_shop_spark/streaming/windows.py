"""Event-time windowed streaming operators over an ``events``-shaped
stream — the streaming capabilities the reference *implies* but never
implements (SURVEY.md §2.6 "absent streaming features": watermarks,
tumbling/session windows, dedup-within-watermark).

All functions take a *streaming* DataFrame (readStream) and return the
transformed streaming DataFrame; callers attach sinks. Each also works
on a batch DataFrame (Spark's unified semantics), which is how the
oracle-checked batch twins in plans/queries.py (q17/q18) relate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time window with watermark: counts + value
    sums per (window, event_type). Late rows beyond the watermark are
    dropped; state is bounded by watermark horizon × group cardinality.

    Pass ``watermark=None`` when the input stream already carries a
    watermark (e.g. downstream of dedup_within_watermark) — Spark
    disallows redefining it across chained stateful operators."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of the
    batch lag/cumsum sessionization in q18 (plans/queries.py).
    ``session_window`` keeps per-key state until watermark closes the
    session. ``watermark=None`` → input already watermarked."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicatesWithinWatermark``): the streaming dedup the
    reference approximates with its seen-file state JSON."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping buckets — the moving-average shape tumbling windows
    can't express. State = windows-per-event x group cardinality,
    bounded by the watermark."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
