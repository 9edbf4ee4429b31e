"""OGR/fiona ingest gate (Shapefile, GPKG-via-OGR, GML, ...).

The reference streams features through fiona
(/root/reference/entwiner/io.py:33-53).  fiona/GDAL is NOT installed in
this build environment, so this module is an import-gated adapter: when
fiona is available it yields the same (driver-side read ->
createDataFrame -> canonical edges) shape as sources/gpkg.py; without
it, a clear UnrecognizedFileFormat explains the situation.  GeoJSON
(sources/geojson.py, fully distributed) and GeoPackage
(sources/gpkg.py, stdlib sqlite3) need no fiona.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession

from entwiner_spark.exceptions import UnrecognizedFileFormat


def edges_from_ogr(
    spark: SparkSession,
    path: str,
    precision: int = 7,
    changes_sign: tuple[str, ...] = (),
    add_reverse: bool = True,
) -> DataFrame:
    try:
        import fiona  # noqa: F401
    except ImportError as e:
        raise UnrecognizedFileFormat(
            f"reading {path} requires fiona/GDAL, which is not installed; "
            "use edges_from_geojson for GeoJSON or read_geopackage for .gpkg"
        ) from e

    import fiona

    rows = []
    with fiona.open(path) as handle:
        layer = getattr(handle, "name", "layer")
        for f in handle:
            geom = dict(f["geometry"])
            if geom["type"] != "LineString":
                continue
            # keep None-valued properties: every Row must carry the
            # same field set or createDataFrame misaligns columns
            # (NULL storage matches reference semantics anyway, P1)
            props = dict(sorted(dict(f["properties"]).items()))
            rows.append(
                Row(
                    _layer=layer,
                    geom=Row(type="LineString", coordinates=[list(c) for c in geom["coordinates"]]),
                    **props,
                )
            )
    if not rows:
        raise UnrecognizedFileFormat(
            f"{path}: no LineString features found (layer may contain "
            "only points/polygons)"
        )
    raw = spark.createDataFrame(rows)
    from pyspark.sql import functions as F

    from entwiner_spark.functions.ids import node_id_from_coord

    coords = F.col("geom.coordinates")
    fwd = raw.withColumns(
        {
            "_u": node_id_from_coord(F.element_at(coords, 1), precision),
            "_v": node_id_from_coord(F.element_at(coords, -1), precision),
        }
    )
    out = fwd
    if add_reverse:
        props = [c for c in fwd.columns if c not in ("_u", "_v", "geom")]
        rev = fwd.select(
            F.col("_v").alias("_u"),
            F.col("_u").alias("_v"),
            F.struct(
                F.lit("LineString").alias("type"),
                F.reverse(coords).alias("coordinates"),
            ).alias("geom"),
            *[(-F.col(c)).alias(c) if c in changes_sign else F.col(c) for c in props],
        )
        out = fwd.select("_u", "_v", "geom", *props).unionByName(rev)
    return out.dropDuplicates(["_u", "_v"])
