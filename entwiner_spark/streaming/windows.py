"""Structured Streaming window operators (SURVEY.md §2.12 superset).

The reference has no streaming; these are the standard event-time
patterns over a stream with schema (ts TIMESTAMP, ...): tumbling /
sliding windows with watermark late-data handling, and gap-based
session windows — all built-in Spark operators (window/session_window),
no custom state.

The batch twins live in catalog.py (e1/e2/e3) so the same semantics are
DuckDB-verified; these functions accept either a streaming or a batch
DataFrame (identical plans — that is the point of Structured
Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(F.window(ts_col, duration).alias("win"), key_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value")
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(F.window(ts_col, duration, slide).alias("win")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(F.session_window(ts_col, gap).alias("win"), key_col).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Built-in streaming dedup: drop repeat (keys) arrivals, keeping
    state only for rows younger than the watermark.

    The engine-native complement to stateful.seen_edge_filter (custom
    applyInPandasWithState): dropDuplicatesWithinWatermark expires its
    seen-set with the watermark, so state is O(rate x watermark)
    instead of O(distinct keys ever) — the only safe shape for an
    unbounded stream.  Batch inputs fall back to plain
    dropDuplicates, which has the same keep-one contract (streaming
    keeps the first ARRIVAL; use a row_number window when a specific
    deterministic winner is required, as ingest.merge_batch does).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
