"""OGR ingest gate (Shapefile, GeoPackage, GML, ...).

The reference streams features through fiona
(/root/reference/entwiner/io.py:33-53).  fiona/GDAL may not be
installed; this module is an import-gated adapter with a REAL fallback:
GeoPackage files are read through stdlib sqlite3 + the repo's own WKB
codec (functions/wkb.py) when fiona is absent, so the most common OGR
format round-trips end-to-end with no GDAL at all.  Other OGR formats
(.shp, .gml) genuinely need fiona and raise a clear message without it.

Two read paths:

* ``edges_from_ogr`` — convenience driver-side read for SMALL files
  (schema inferred from the features).  Guarded by ``max_features``:
  materializing a large OGR file on the driver is the one ingest shape
  that would not survive a big input, so the guard raises and points at
  the distributed path instead of silently OOM-ing the driver.
* ``edges_from_ogr_distributed`` — the 100 TB shape: a DataFrame of
  file paths, one partition per file, ``mapInPandas`` opening each file
  with fiona INSIDE the executor task and emitting Arrow batches.  Needs
  an explicit property schema (distributed readers cannot infer schemas
  from data they have not read yet — same contract as
  ``spark.read.schema(...).format(...)``).

GeoJSON (sources/geojson.py, fully distributed) and GeoPackage
(sources/gpkg.py, stdlib sqlite3) need no fiona.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entwiner_spark.exceptions import UnrecognizedFileFormat

#: Driver-side materialization ceiling for the convenience path.
MAX_DRIVER_FEATURES = 100_000

_GEOM_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def _try_fiona():
    try:
        import fiona

        return fiona
    except ImportError:
        return None


def _require_readable(paths: list[str]) -> None:
    """Driver-side fail-fast: every path must be readable by SOME
    backend — fiona when importable, else the sqlite GPKG fallback."""
    if _try_fiona() is not None:
        return
    bad = [p for p in paths if not str(p).lower().endswith(".gpkg")]
    if bad:
        raise UnrecognizedFileFormat(
            f"{bad[0]}: reading non-GeoPackage OGR formats requires "
            "fiona/GDAL, which is not installed; use edges_from_geojson "
            "for GeoJSON — .gpkg files work without fiona via the "
            "sqlite backend"
        )


def _iter_gpkg_features(path: str) -> Iterator[tuple[str, dict]]:
    """GeoPackage backend with NO GDAL: stdlib sqlite3 + the repo's WKB
    codec.  Yields (layer_name, geojson-style feature) for every
    feature table registered in gpkg_geometry_columns — the same stream
    fiona.open() would produce for the same file."""
    import sqlite3  # noqa: PLC0415

    from entwiner_spark.functions.wkb import gpkg_blob_to_geometry

    con = sqlite3.connect(path)
    con.row_factory = sqlite3.Row
    try:
        layers = con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns"
        ).fetchall()
        for lay in layers:
            table, gcol = lay["table_name"], lay["column_name"]
            for r in con.execute(f'SELECT * FROM "{table}"'):
                d = dict(r)
                geom = gpkg_blob_to_geometry(d.pop(gcol, None))
                if geom is None:
                    continue
                d.pop("fid", None)  # PK is the feature id, not a property
                yield table, {"geometry": geom, "properties": d}
    finally:
        con.close()


def _iter_ogr_features(path: str) -> Iterator[tuple[str, dict]]:
    """Yield (layer, feature) from the right backend: .gpkg always goes
    through the native sqlite reader (deterministic, zero deps); every
    other format needs fiona.  Runs INSIDE executor tasks on the
    distributed path."""
    if str(path).lower().endswith(".gpkg"):
        yield from _iter_gpkg_features(path)
        return
    fiona = _try_fiona()
    if fiona is not None:
        with fiona.open(path) as handle:
            layer = getattr(handle, "name", "layer")
            for f in handle:
                yield layer, {
                    "geometry": dict(f["geometry"]),
                    "properties": dict(f["properties"]),
                }
        return
    raise UnrecognizedFileFormat(
        f"{path}: reading this OGR format requires fiona/GDAL, which is "
        "not installed; use edges_from_geojson for GeoJSON or a .gpkg "
        "artifact for the sqlite backend"
    )


def _canonicalize(
    raw: DataFrame,
    precision: int,
    changes_sign: tuple[str, ...],
    add_reverse: bool,
) -> DataFrame:
    """Shared tail: node-ID derivation + fwd/rev union + (u,v) dedup —
    identical semantics to sources/geojson.py (reference io.py:42-50)."""
    from entwiner_spark.functions.ids import node_id_from_coord

    coords = F.col("geom.coordinates")
    fwd = raw.withColumns(
        {
            "_u": node_id_from_coord(F.element_at(coords, 1), precision),
            "_v": node_id_from_coord(F.element_at(coords, -1), precision),
        }
    )
    props = [c for c in fwd.columns if c not in ("_u", "_v", "geom")]
    out = fwd.select("_u", "_v", "geom", *props)
    if add_reverse:
        rev = fwd.select(
            F.col("_v").alias("_u"),
            F.col("_u").alias("_v"),
            F.struct(
                F.lit("LineString").alias("type"),
                F.reverse(coords).alias("coordinates"),
            ).alias("geom"),
            *[(-F.col(c)).alias(c) if c in changes_sign else F.col(c) for c in props],
        )
        out = out.unionByName(rev)
    return out.dropDuplicates(["_u", "_v"])


def edges_from_ogr(
    spark: SparkSession,
    path: str,
    precision: int = 7,
    changes_sign: tuple[str, ...] = (),
    add_reverse: bool = True,
    max_features: int = MAX_DRIVER_FEATURES,
) -> DataFrame:
    """Driver-side convenience reader for SMALL OGR files.

    Raises when the file exceeds ``max_features`` — use
    :func:`edges_from_ogr_distributed` (with an explicit property
    schema) for anything large.
    """
    _require_readable([path])

    rows = []
    for layer, f in _iter_ogr_features(path):
        geom = f["geometry"]
        if geom["type"] != "LineString":
            continue
        if len(rows) >= max_features:
            raise ValueError(
                f"{path}: more than {max_features} LineString features; "
                "driver-side materialization would not survive this "
                "input — use edges_from_ogr_distributed(paths, "
                "prop_schema=...) which parses per-file inside "
                "executor tasks"
            )
        # keep None-valued properties: every Row must carry the
        # same field set or createDataFrame misaligns columns
        # (NULL storage matches reference semantics anyway, P1)
        props = dict(sorted(f["properties"].items()))
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
    return _canonicalize(spark.createDataFrame(rows), precision, changes_sign, add_reverse)


def edges_from_ogr_distributed(
    spark: SparkSession,
    paths: list[str],
    prop_schema: T.StructType,
    precision: int = 7,
    changes_sign: tuple[str, ...] = (),
    add_reverse: bool = True,
) -> DataFrame:
    """Distributed OGR ingest: one executor task per file, fiona opened
    inside the task, Arrow-batched output — no driver materialization.

    ``prop_schema`` declares the property columns (name -> type), the
    same contract as ``spark.read.schema(...)``: a distributed reader
    must know its output schema before reading.  Properties missing
    from a feature come out NULL; extra properties are dropped.
    """
    _require_readable(paths)  # fail fast on the driver with a clear message

    out_schema = T.StructType(
        [
            T.StructField("_layer", T.StringType()),
            T.StructField("geom", _GEOM_TYPE),
            *prop_schema.fields,
        ]
    )
    prop_names = [f.name for f in prop_schema.fields]

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        from entwiner_spark.sources.ogr import _iter_ogr_features

        for pdf in batches:
            for p in pdf["path"]:
                recs = []
                for layer, f in _iter_ogr_features(p):
                    geom = f["geometry"]
                    if geom["type"] != "LineString":
                        continue
                    fp = f["properties"]
                    recs.append(
                        {
                            "_layer": layer,
                            "geom": {
                                "type": "LineString",
                                "coordinates": [list(c) for c in geom["coordinates"]],
                            },
                            **{k: fp.get(k) for k in prop_names},
                        }
                    )
                if recs:
                    yield pd.DataFrame(recs, columns=["_layer", "geom", *prop_names])

    files = spark.createDataFrame(
        [(p,) for p in paths], T.StructType([T.StructField("path", T.StringType())])
    ).repartition(max(len(paths), 1))
    raw = files.mapInPandas(parse, schema=out_schema)
    return _canonicalize(raw, precision, changes_sign, add_reverse)
