"""As-of (temporal) join — the classic training-data-pipeline operator
Spark lacks as a built-in (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics).

Spark-first design: instead of a cogrouped ``applyInPandas`` (which
moves every row through Arrow and Python), the join is expressed as a
UNION + window ``last(..., ignorenulls=True)``:

1. tag right rows ``_side=0`` carrying their payload in one struct,
   left rows ``_side=1`` with a NULL payload;
2. one window partitioned by the key, ordered by ``(ts, _side)`` —
   right sorts before left at equal timestamps, giving the inclusive
   ``right.ts <= left.ts`` backward match;
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT ROW is exactly "most recent right row at or before me";
4. keep the left rows.

Cost: ONE hash shuffle on the key + a per-partition sort — identical
to the shuffle a sort-merge join would pay, with no Python in the loop
and full whole-stage codegen.  At 100 TB the window state is a single
struct per row (constant memory), and AQE handles skewed keys.

Ties: if the right side has several rows at the same (key, ts) the
winner is unspecified — pre-aggregate the right side to one row per
(key, ts) for deterministic output (the catalog query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row
    with ``right[on] <= left[on]`` and equal ``by`` keys.

    Returns the left rows plus the matched right ``value_cols`` and the
    matched right timestamp as ``_asof_ts`` (NULL when no right row
    precedes — left-join semantics).  ``tolerance_us`` drops matches
    older than the given microsecond gap (match becomes NULL, the left
    row survives).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    # unix_micros (tolerance path) rejects TIMESTAMP_NTZ; normalize both
    # sides up front so NTZ-typed parquet inputs join identically.
    def _norm(df: DataFrame) -> DataFrame:
        if dict(df.dtypes).get(on) == "timestamp_ntz":
            return df.withColumn(on, F.col(on).cast("timestamp"))
        return df

    left, right = _norm(left), _norm(right)
    payload = F.struct(
        F.col(on).alias("_asof_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
    )
    null_payload = F.lit(None).cast(
        r.schema["_rv"].dataType.simpleString()
    )
    left_cols = [c for c in left.columns if c != on and c not in by]
    l = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        null_payload.alias("_rv"),
        *left_cols,
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("_m._asof_ts"))
        ) <= F.lit(int(tolerance_us))
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")).otherwise(F.lit(None))
        )
    return matched.select(
        *by,
        F.col(on),
        *left_cols,
        F.col("_m._asof_ts").alias("_asof_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
