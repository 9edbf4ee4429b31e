"""Sequential time-series operators (SURVEY.md §2.13 UDF surface).

These are the operators whose recurrences genuinely cannot be
expressed with built-in window frames (each output depends on the
previous OUTPUT, not a fixed frame of inputs), so they use the
documented slow-path discipline: Arrow-batched ``applyInPandas`` per
key — one shuffle on the key, sequential work only WITHIN a key,
never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    round_dp: int = 6,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``y_1 = x_1; y_t = alpha*x_t + (1-alpha)*y_{t-1}`` over (ts, id)
    order — the standard smoothing/anomaly-baseline signal.

    The recurrence depends on the previous OUTPUT, so no window frame
    expresses it; this is the canonical legitimate ``applyInPandas``
    case (per-key Arrow batch, explicit loop in the exact literal
    expression order the DuckDB recursive-CTE oracle uses, so doubles
    are bit-identical; the final round happens JVM-side with F.round,
    whose half-handling matches the oracle engines' — Python round()
    half-evens and was observed to flip one row in 15k at a decimal
    half boundary).  Plan: one hash exchange on the key; within-key
    work is linear and local.  Returns ``(key, id, ewma)``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0,1], got {alpha}")
    beta = 1.0 - alpha
    # derive key/id types from the input so non-long keys (e.g. a
    # string lang column) survive the Arrow round-trip
    schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts_col, id_col])
        y = None
        out = []
        for x in pdf[value_col]:
            x = float(x)
            y = x if y is None else alpha * x + beta * y
            out.append(y)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].values,
                id_col: pdf[id_col].values,
                "ewma": out,
            }
        )

    from pyspark.sql import functions as F

    raw = df.select(key_col, ts_col, id_col, value_col).groupBy(
        key_col
    ).applyInPandas(fn, schema)
    return raw.select(
        key_col, id_col, F.round("ewma", round_dp).alias("ewma")
    )
