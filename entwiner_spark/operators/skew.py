"""Skew-mitigation utilities for hot join keys (100 TB discipline).

AQE's skew-join handles sort-merge skew automatically (enabled in the
session factory), but two cases still need explicit salting:

- aggregations with a dominant key (partial aggregation helps, but a
  single reducer still owns the hot key's partials);
- joins where the build side must replicate to cover a hot probe key.

``salted_join`` implements the classic replicate-small/salt-big
pattern; ``salted_count`` a two-phase salted aggregation.  Both are
pure DataFrame transforms with deterministic results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys are spread over ``salt``
    sub-keys and ``small`` is replicated ``salt``-fold.

    Result equals ``big.join(small, key, how)`` for inner/left joins;
    each salted sub-key shuffles independently so no single task owns a
    hot key's full row set.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count per key: count within (key, salt) sub-groups,
    then combine — the hot key's traffic splits ``salt`` ways before
    the final tiny combine shuffle."""
    return (
        df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )
