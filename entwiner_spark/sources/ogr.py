"""OGR/fiona ingest gate (Shapefile, GPKG-via-OGR, GML, ...).

The reference streams features through fiona
(/root/reference/entwiner/io.py:33-53).  fiona/GDAL is NOT installed in
this build environment, so this module is an import-gated adapter with
TWO paths:

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


def _require_fiona():
    try:
        import fiona

        return fiona
    except ImportError as e:
        raise UnrecognizedFileFormat(
            "reading OGR formats requires fiona/GDAL, which is not "
            "installed; use edges_from_geojson for GeoJSON or "
            "read_geopackage for .gpkg"
        ) from e


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
    fiona = _require_fiona()

    rows = []
    with fiona.open(path) as handle:
        layer = getattr(handle, "name", "layer")
        for f in handle:
            geom = dict(f["geometry"])
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
    _require_fiona()  # fail fast on the driver with the clear message

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

        import fiona

        for pdf in batches:
            for p in pdf["path"]:
                with fiona.open(p) as handle:
                    layer = getattr(handle, "name", "layer")
                    recs = []
                    for f in handle:
                        geom = dict(f["geometry"])
                        if geom["type"] != "LineString":
                            continue
                        fp = dict(f["properties"])
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
