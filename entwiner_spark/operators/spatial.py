"""Two-phase spatial queries (SURVEY.md §2.3 J3, §2.6 O1, §3.3).

Reference lifecycle: r-tree bbox candidates
(/root/reference/entwiner/geopackage/feature_table.py:120-196) then
exact shapely distance refine + optional sort (:198-235).  Here phase 1
is a plain conjunction of range predicates over the write-time bbox
columns — Parquet min/max stats and partition pruning make it an index
— and phase 2 is a Catalyst expression, so the whole thing is one
pushdown-friendly scan with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entwiner_spark.functions.geo import (
    bbox_columns,
    meter_bbox,
    point_linestring_distance_m,
)


def bbox_predicate(minx: float, maxx: float, miny: float, maxy: float) -> Column:
    """Candidate predicate: feature MBR intersects the query bbox."""
    return (
        (F.col("_maxx") >= F.lit(minx))
        & (F.col("_minx") <= F.lit(maxx))
        & (F.col("_maxy") >= F.lit(miny))
        & (F.col("_miny") <= F.lit(maxy))
    )


def intersects(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    geom_col: str = "geom",
) -> DataFrame:
    """All features whose MBR intersects ``(minx, maxx, miny, maxy)``.

    Parity: FeatureTable.intersects (feature_table.py:120-162) — the
    reference also returns MBR-level candidates, not exact hits.

    If the write-time bbox columns are absent (e.g. a table imported
    from GeoPackage), they are derived from the geometry inline — the
    predicate then costs a geometry scan instead of a stats-pruned one,
    which is correct but slower; re-write through the parquet store to
    restore pruning.
    """
    if "_minx" not in df.columns:
        df = df.withColumns(bbox_columns(F.col(f"{geom_col}.coordinates")))
    minx, maxx, miny, maxy = bbox
    return df.filter(bbox_predicate(minx, maxx, miny, maxy))


def dwithin(
    df: DataFrame,
    lon: float,
    lat: float,
    distance_m: float,
    sort: bool = False,
    geom_col: str = "geom",
) -> DataFrame:
    """Features within ``distance_m`` meters of a point, with ``_dist``.

    Parity: FeatureTable.dwithin (feature_table.py:198-235): meter
    radius -> bbox candidates -> exact point-to-LineString distance ->
    threshold filter -> optional ascending distance sort.
    """
    bbox = meter_bbox(lon, lat, distance_m)
    cand = intersects(df, bbox)
    refined = cand.withColumn(
        "_dist",
        point_linestring_distance_m(
            F.lit(float(lon)), F.lit(float(lat)), F.col(f"{geom_col}.coordinates")
        ),
    ).filter(F.col("_dist") < F.lit(float(distance_m)))
    if sort:
        # top-k callers should .limit(k) -> TakeOrderedAndProject (the
        # minheap the reference's TODO wished for, feature_table.py:216-220)
        refined = refined.orderBy("_dist")
    return refined
