"""Stream-stream joins (SURVEY.md §2.12 superset).

The reference has no streaming; this is the standard Structured
Streaming event-correlation pattern: join two event streams on a key
within an event-time interval (view -> purchase attribution, request ->
error correlation, ...).

Scale shape: with watermarks on BOTH sides and a closed time-range
predicate, Spark bounds the join state — each side buffers only rows
younger than (watermark + interval), so state is O(rate x window), not
O(stream).  Without the time bound a stream-stream inner join would
buffer forever; this operator refuses to build that plan.

The same function works on batch DataFrames (identical semantics, the
Structured Streaming invariant), which is what the DuckDB-oracle twin
`e6_interval_join` verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    max_delay: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Inner-join right-side events that occur within ``[left_ts,
    left_ts + max_delay]`` for the same key.

    For streaming inputs ``watermark`` is required (it bounds the join
    state); batch inputs ignore it.  Column names are prefixed l_/r_
    in the output to keep both timestamps addressable.
    """
    streaming = left.isStreaming or right.isStreaming
    if streaming:
        if watermark is None:
            raise ValueError(
                "stream-stream interval_join requires a watermark: "
                "without one the join state grows unboundedly"
            )
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)

    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner")
