"""GTFS stop-snap adapter (reference TODO.md:49-60 — "Support for
POIs": GTFS stops are the feed the reference names explicitly; it never
built the adapter).  A thin feed-shaped wrapper over the oracle-green
general machinery: ``spatial.nearest_edge_join`` snaps each stop to its
nearest network edge, and the snap expands into station→network LINK
edges so transit stations become routable origins/destinations.

Scale shape: stops.txt is a plain splittable CSV (``spark.read.csv``);
the snap is the grid-bucketed candidate join (no cross product, J6
pattern); link-edge emission is map-only over the snapped rows.  A
city-scale feed (tens of thousands of stops) is the SMALL side — the
network is the big one — so nothing here ever shuffles the network
beyond the one bucketed candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entwiner_spark.functions.geo import haversine_m
from entwiner_spark.operators.spatial import nearest_edge_join

#: GTFS reference field names (stops.txt required fields).
_GTFS_FIELDS = ("stop_id", "stop_name", "stop_lat", "stop_lon")


def stops_from_gtfs(spark: SparkSession, path: str) -> DataFrame:
    """Read a GTFS ``stops.txt`` (header CSV; reference fields
    stop_id, stop_name, stop_lat, stop_lon) into ``(stop_id,
    stop_name, lon, lat)``.  Rows without coordinates (GTFS allows
    location_type=1 stations to omit them) are dropped — they cannot
    snap."""
    raw = spark.read.option("header", True).csv(path)
    missing = [c for c in ("stop_id", "stop_lat", "stop_lon") if c not in raw.columns]
    if missing:
        raise ValueError(f"{path}: not a GTFS stops.txt (missing {missing})")
    name = (
        F.col("stop_name")
        if "stop_name" in raw.columns
        else F.lit(None).cast("string")
    )
    return raw.select(
        F.col("stop_id"),
        name.alias("stop_name"),
        F.col("stop_lon").cast("double").alias("lon"),
        F.col("stop_lat").cast("double").alias("lat"),
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())


def stop_link_edges(
    stops: DataFrame,
    edges: DataFrame,
    max_dist_m: float = 100.0,
    stop_key: str = "stop_id",
    edge_key: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_deg: float | None = None,
    layer: str = "gtfs_link",
) -> DataFrame:
    """Snap each stop to its nearest network edge (``nearest_edge_join``
    — deterministic (distance, edge key) rank-1 within ``max_dist_m``;
    unsnappable stops drop out, the reference's dwithin filter
    semantics) and emit bidirectional station→endpoint LINK edges:

    ``(_u, _v, _length, _layer, stop_id, snapped_fid, snap_dist_m)``

    four rows per snapped stop — the stop node (``gtfs:{stop_id}``) to
    and from BOTH endpoints of the snapped edge.  The link cost is the
    straight-line haversine stop→endpoint (a conservative access walk;
    true projection-point splitting would mutate the network edge — the
    documented escalation if sub-edge precision ever matters).  Union
    the result onto the network's edge table (U3 ``unionByName(
    allowMissingColumns=True)``) to make stations routable; node ids
    are namespaced with ``gtfs:`` so they can never collide with
    rounded-coordinate junction ids (which always start with a digit
    or '-')."""
    geom = edges.select(
        F.col("_u").alias("_e_u"),
        F.col("_v").alias("_e_v"),
        F.col(edge_key),
        F.col("geom.coordinates").alias("coordinates"),
    )
    snapped = nearest_edge_join(
        stops,
        geom,
        max_dist_m,
        stop_key,
        edge_key,
        lon_col=lon_col,
        lat_col=lat_col,
        cell_deg=cell_deg,
    )
    stop_node = F.concat(F.lit("gtfs:"), F.col(stop_key).cast("string"))
    out = []
    for end in (1, -1):
        ep = F.element_at("coordinates", end)
        w = F.round(
            haversine_m(
                F.col(lon_col),
                F.col(lat_col),
                F.element_at(ep, 1),
                F.element_at(ep, 2),
            ),
            3,
        )
        node = F.col("_e_u") if end == 1 else F.col("_e_v")
        common = [
            w.alias("_length"),
            F.lit(layer).alias("_layer"),
            F.col(stop_key).alias("stop_id"),
            F.col(edge_key).alias("snapped_fid"),
            F.col("_dist").alias("snap_dist_m"),
        ]
        out.append(
            snapped.select(stop_node.alias("_u"), node.alias("_v"), *common)
        )
        out.append(
            snapped.select(node.alias("_u"), stop_node.alias("_v"), *common)
        )
    links = out[0]
    for part in out[1:]:
        links = links.unionByName(part)
    return links
