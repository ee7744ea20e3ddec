"""Windowed continuous aggregates — the layer behind
``FilteredWindowRangeQuery`` (Q5 in SURVEY.md §2.2).

The reference declares a window-store query
(``query/FilteredWindowRangeQuery.java:11-74``) but never wires a
window store — the query type is dead code falling through to
``forUnknownQueryType`` (``store/CustomQueryStore.java:60-64``).  We
implement what it intended: time-windowed per-key aggregates, queryable
by time range + predicate.

Spark-first: ``groupBy(window(event_time, ...), symbol)`` with the same
conditional-sum aggregate.  Tumbling, sliding (hopping), and session
windows come from the built-in ``window``/``session_window`` functions;
under Structured Streaming the identical expression plus
``withWatermark`` gives late-data handling the reference never had.

Scale: one shuffle on (window, symbol); windows are epoch-aligned so
the grouping key is computed map-side (no range-join blowup).  State
per window×key is bounded; with a watermark, streaming state is
GC'd — this is the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_aggregate(
    txns: DataFrame,
    duration: str = "1 hour",
    slide: str | None = None,
    time_col: str = "event_time",
    key_col: str = "symbol",
) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) windowed aggregate:
    (window_start, window_end, symbol, buys, sells, number_shares)."""
    win = F.window(F.col(time_col), duration, slide) if slide else F.window(F.col(time_col), duration)
    return (
        txns.groupBy(win.alias("window"), F.col(key_col))
        .agg(
            F.sum(F.when(F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("buys"),
            F.sum(F.when(~F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("sells"),
            F.sum("number_shares").cast("long").alias("number_shares"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "buys",
            "sells",
            "number_shares",
        )
    )


def session_aggregate(
    txns: DataFrame,
    gap: str = "30 minutes",
    time_col: str = "event_time",
    key_col: str = "symbol",
) -> DataFrame:
    """Session-windowed variant (gap-based), same output shape."""
    return (
        txns.groupBy(F.session_window(F.col(time_col), gap).alias("window"), F.col(key_col))
        .agg(
            F.sum(F.when(F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("buys"),
            F.sum(F.when(~F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("sells"),
            F.sum("number_shares").cast("long").alias("number_shares"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "buys",
            "sells",
            "number_shares",
        )
    )


def event_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sessionize an event stream: merge a key's events whose gaps are
    under ``gap``; session end = last event + gap (Spark
    ``session_window`` semantics: an event at exactly the current
    session end opens a NEW session — [start, end) windows).

    One shuffle on the key; under Structured Streaming the identical
    expression plus a watermark gives bounded state.  (The batch oracle
    equivalent is the gaps-and-islands LAG pattern.)"""
    return (
        events.groupBy(F.session_window(F.col(time_col), gap).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
