"""Mergeable frequency sketches (the LLM-pipeline superset; no
reference analogue).  Count-Min complements the Bloom family
(operators/dedup.py): Bloom answers "seen at all?", CMS answers "seen
roughly how often?" with bounded one-sided error — token/domain/URL
frequency at 100 TB without a corpus-wide exact groupBy whose key
cardinality (billions of tokens/URLs) makes the exchange the
bottleneck.

Shape discipline (same as bloom_build): each input row emits ``depth``
narrow (row, col) cells, ONE groupBy aggregates them with map-side
partial counts — the exchange carries at most ``depth × width`` rows
per task regardless of input size, and two sketches MERGE by summing
cells (union + the same groupBy), so per-partition/per-day sketches
roll up without touching raw data.

Guarantees (Cormode-Muthukrishnan): estimate ≥ true count always
(one-sided); estimate ≤ true + εN with probability ≥ 1-δ where
ε = e/width, δ = e^-depth, N = total count.  Defaults (2048×5) give
ε ≈ 0.13% of N at δ ≈ 0.7%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entwiner_spark.functions.expr import long_array_lit


def _cms_pos(col, i: int, width: int) -> Column:
    """Cell column for depth-row ``i``: xxhash64 over (value, 1000+i) —
    a seed family disjoint from the bloom slots so composing both
    sketches over one column never correlates."""
    return F.pmod(F.xxhash64(col, F.lit(1000 + i)), F.lit(width))


def cms_build(
    df: DataFrame,
    col: str = "token",
    width: int = 2048,
    depth: int = 5,
    weight: str | None = None,
) -> DataFrame:
    """Aggregate a column into a Count-Min sketch: DataFrame
    ``(row int, col int, cnt long)`` — absent cells are zero.
    ``weight`` sums a count column instead of 1 per row (pre-aggregated
    inputs)."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive, got {width}x{depth}")
    c = F.col(col)
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    cells = [
        F.struct(
            F.lit(i).alias("row"),
            _cms_pos(c, i, width).cast("int").alias("col"),
            w.alias("w"),
        )
        for i in range(depth)
    ]
    return (
        df.filter(c.isNotNull())
        .select(F.explode(F.array(*cells)).alias("s"))
        .groupBy(F.col("s.row").alias("row"), F.col("s.col").alias("col"))
        .agg(F.sum("s.w").alias("cnt"))
    )


def cms_matrix(cms: DataFrame, width: int = 2048, depth: int = 5) -> list[list[int]]:
    """Collect a ``cms_build`` result into a dense depth×width matrix
    (the only driver materialization; 2048×5 longs = 80 KB, fixed by
    sizing, never by data volume)."""
    m = [[0] * width for _ in range(depth)]
    for r in cms.collect():
        m[r["row"]][r["col"]] = r["cnt"]
    return m


def cms_estimate(col, matrix: list[list[int]]) -> Column:
    """Frequency-estimate Column against a driver-held matrix: min over
    the depth rows of the hashed cell — ships as plan literals, pure
    scan-side expression (the bloom_contains pattern: estimating over
    a 100 TB stream of lookups is zero-shuffle)."""
    depth, width = len(matrix), len(matrix[0])
    ests = [
        F.element_at(long_array_lit(matrix[i]), _cms_pos(col, i, width).cast("int") + 1)
        for i in range(depth)
    ]
    return F.least(*ests) if len(ests) > 1 else ests[0]


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-sized sketches: cellwise sum — the mergeability
    that makes per-partition/per-day builds roll up."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
