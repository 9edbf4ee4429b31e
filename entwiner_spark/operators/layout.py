"""Storage-layout operators (SURVEY.md §2.10 analogues beyond the
spatial cell grid): multi-dimensional clustering for data skipping.

Parquet prunes row groups with min/max stats, but stats only help if
the file layout CLUSTERS the filter columns.  A single sort key
clusters one dimension; Z-ordering (bit-interleaved Morton codes)
clusters TWO at once, so range filters on either column skip most
files — the lakehouse trick (Delta OPTIMIZE ZORDER BY) expressed as a
pure Catalyst expression + repartitionByRange, no engine support
needed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    x: Column,
    y: Column,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = 10,
) -> Column:
    """Morton code of two numeric columns: each is normalized to a
    ``bits``-bit integer over its [min, max] range (clamped), then the
    bits interleave (x even positions, y odd).  Pure integer/bitwise
    Catalyst expressions — deterministic, oracle-twinnable, and
    whole-stage codegen'd.
    """
    n = 1 << bits

    def norm(c: Column, lo: float, hi: float) -> Column:
        scaled = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(float(n))
        ).cast("long")
        return F.least(F.greatest(scaled, F.lit(0)), F.lit(n - 1))

    nx, ny = norm(x, x_min, x_max), norm(y, y_min, y_max)
    parts = []
    for b in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(nx, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        parts.append(
            F.shiftleft(F.shiftright(ny, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, c: a + c, parts)


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    partitions: int = 8,
    bits: int = 10,
) -> DataFrame:
    """Range-partition + sort the frame by its Morton code so each
    output file covers a compact rectangle of (x, y) — write the
    result and BOTH columns' parquet min/max stats become selective.
    The bounds are explicit (compute once with an agg) so the code is
    stable across incremental writes.
    """
    zv = zorder_value(
        F.col(x_col), F.col(y_col), x_min, x_max, y_min, y_max, bits
    ).alias("_zv")
    return (
        df.withColumn("_zv", zv)
        .repartitionByRange(partitions, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
    )
