"""Tabular edge-list sources: CSV / JSON-lines / parquet -> canonical
edges (SURVEY.md §2.1 "diverse sources" — the reference accepts any
fiona-readable file; tabular edge lists are the Spark-native analogue
for non-geometric graphs).

Any DataFrame with two endpoint columns becomes a graph; optional
reverse-edge emission and sign-flip mirror the GeoJSON path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edges_from_dataframe(
    df: DataFrame,
    u_col: str,
    v_col: str,
    add_reverse: bool = False,
    changes_sign: tuple[str, ...] = (),
    dedup: bool = True,
) -> DataFrame:
    """Normalize (u_col, v_col, props...) to the canonical edge schema."""
    props = [c for c in df.columns if c not in (u_col, v_col)]
    fwd = df.select(
        F.col(u_col).cast("string").alias("_u"),
        F.col(v_col).cast("string").alias("_v"),
        *props,
    )
    out = fwd
    if add_reverse:
        rev = fwd.select(
            F.col("_v").alias("_u"),
            F.col("_u").alias("_v"),
            *[(-F.col(c)).alias(c) if c in changes_sign else F.col(c) for c in props],
        )
        out = fwd.unionByName(rev)
    if dedup:
        out = out.dropDuplicates(["_u", "_v"])
    return out


def edges_from_csv(
    spark: SparkSession,
    path: str,
    u_col: str,
    v_col: str,
    header: bool = True,
    **kwargs,
) -> DataFrame:
    df = spark.read.option("header", str(header).lower()).option(
        "inferSchema", "true"
    ).csv(path)
    return edges_from_dataframe(df, u_col, v_col, **kwargs)


def edges_from_jsonl(
    spark: SparkSession, path: str, u_col: str, v_col: str, **kwargs
) -> DataFrame:
    return edges_from_dataframe(spark.read.json(path), u_col, v_col, **kwargs)


def nodes_from_edge_endpoints(edges: DataFrame) -> DataFrame:
    """Node table for non-geometric graphs: just the distinct ids."""
    return (
        edges.select(F.col("_u").alias("_n"))
        .unionByName(edges.select(F.col("_v").alias("_n")))
        .distinct()
    )
