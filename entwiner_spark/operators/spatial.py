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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entwiner_spark.functions.geo import (
    bbox_columns,
    meter_bbox,
    point_linestring_distance_m,
)


M_PER_DEG = 111320.0


def _cell_range(lo: Column, hi: Column, cell_deg: float) -> Column:
    """Integer grid-cell ids covering [lo, hi] (inclusive)."""
    return F.sequence(
        F.floor(lo / F.lit(cell_deg)).cast("int"),
        F.floor(hi / F.lit(cell_deg)).cast("int"),
    )


def with_cells(
    df: DataFrame,
    minx: Column,
    maxx: Column,
    miny: Column,
    maxy: Column,
    cell_deg: float,
) -> DataFrame:
    """Explode a bbox into one row per overlapped grid cell (cx, cy).

    The per-row fanout is ceil(w/cell)+1 × ceil(h/cell)+1 — pick
    ``cell_deg`` near the query radius so it stays ≤ 4 for points and
    small for typical street segments."""
    cells = F.flatten(
        F.transform(
            _cell_range(minx, maxx, cell_deg),
            lambda cx: F.transform(
                _cell_range(miny, maxy, cell_deg),
                lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
            ),
        )
    )
    return df.withColumn("_cell", F.explode(cells)).select(
        "*", F.col("_cell.cx").alias("cx"), F.col("_cell.cy").alias("cy")
    ).drop("_cell")


def spatial_join(
    points: DataFrame,
    lines: DataFrame,
    max_dist_m: float,
    point_key: str,
    line_key: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    coords_col: str = "coordinates",
    cell_deg: float | None = None,
) -> DataFrame:
    """Two-table distance join: every (point, linestring) pair within
    ``max_dist_m`` meters, with the exact distance as ``_dist``.

    The reference's roadmap names exactly this shape — joining POI /
    GTFS stop tables against the edge table
    (/root/reference/TODO.md:49-60) — and its engine would do it one
    r-tree probe per point.  Here it is ONE distributed equi-join:

    1. assign each point the grid cells overlapped by its
       radius-expanded bbox, and each linestring the cells overlapped
       by its bbox (cells are ``cell_deg``-sized squares; ids are
       floor(coord/cell), so both sides agree without coordination);
    2. equi-join on (cx, cy) — a hash-partitioned shuffle join, no
       cross product.  AQE broadcasts the small side / splits skewed
       cells (dense downtown cells are the documented skew risk —
       operators/skew.py has the salting ladder if AQE isn't enough);
    3. dedupe (a pair can meet in several cells) on the caller-named
       keys;
    4. refine with the exact point-to-LineString distance and filter.

    Cell coverage is conservative (bbox ⊇ disc, bbox ⊇ linestring), so
    no true pair is dropped; the refine step removes false positives.

    ``cell_deg`` defaults to the radius in degrees at the equator ×2;
    override with ~2·max_dist/111320/cos(lat) for high latitudes.
    """
    if cell_deg is None:
        cell_deg = 2.0 * max_dist_m / M_PER_DEG
    dlat = F.lit(max_dist_m / M_PER_DEG)
    dlon = F.lit(max_dist_m) / (F.lit(M_PER_DEG) * F.cos(F.radians(F.col(lat_col))))
    p = with_cells(
        points,
        F.col(lon_col) - dlon,
        F.col(lon_col) + dlon,
        F.col(lat_col) - dlat,
        F.col(lat_col) + dlat,
        cell_deg,
    )
    line_bb = {
        "_minx": F.array_min(F.transform(F.col(coords_col), lambda c: c[0])),
        "_maxx": F.array_max(F.transform(F.col(coords_col), lambda c: c[0])),
        "_miny": F.array_min(F.transform(F.col(coords_col), lambda c: c[1])),
        "_maxy": F.array_max(F.transform(F.col(coords_col), lambda c: c[1])),
    }
    use_stored = all(c in lines.columns for c in line_bb)
    ln = with_cells(
        lines,
        F.col("_minx") if use_stored else line_bb["_minx"],
        F.col("_maxx") if use_stored else line_bb["_maxx"],
        F.col("_miny") if use_stored else line_bb["_miny"],
        F.col("_maxy") if use_stored else line_bb["_maxy"],
        cell_deg,
    )
    cand = p.join(ln, ["cx", "cy"]).dropDuplicates([point_key, line_key])
    refined = cand.withColumn(
        "_dist",
        point_linestring_distance_m(
            F.col(lon_col), F.col(lat_col), F.col(coords_col)
        ),
    ).filter(F.col("_dist") < F.lit(float(max_dist_m)))
    return refined.drop("cx", "cy")


def nearest_edge_join(
    points: DataFrame,
    lines: DataFrame,
    max_dist_m: float,
    point_key: str,
    line_key: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    coords_col: str = "coordinates",
    cell_deg: float | None = None,
) -> DataFrame:
    """Map-matching primitive: each point's single nearest linestring
    within ``max_dist_m`` (snap-GPS-fix-to-edge, POI-to-sidewalk).

    spatial_join generates the grid-bucketed candidates (no cross
    product), then a per-point window keeps rank 1 by (distance,
    line key) — deterministic under ties.  Points with no edge in
    range are absent (filter semantics, like the reference's dwithin).
    The window partitions by the point key, so no global sort exists
    and skewed dense cells stay an AQE concern of the join, not the
    ranking.
    """
    cand = spatial_join(
        points,
        lines,
        max_dist_m,
        point_key,
        line_key,
        lon_col=lon_col,
        lat_col=lat_col,
        coords_col=coords_col,
        cell_deg=cell_deg,
    )
    w = Window.partitionBy(point_key).orderBy(F.col("_dist").asc(), F.col(line_key).asc())
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
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
