"""Canonical schemas for the graph package (SURVEY.md §1.4).

The reference stores geometry as GeoPackage blobs (WKB + header,
/root/reference/entwiner/geopackage/feature_table.py:505-599); we keep
geometry as first-class nested Spark types — no blob codec in the hot
path, WKB only at import/export boundaries.
"""

from __future__ import annotations

from pyspark.sql import types as T

# GeoJSON-shaped geometry structs.  A LineString's coordinates are an
# array of [lon, lat] pairs; a Point's a single pair.
GEOM_LINESTRING = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField(
            "coordinates", T.ArrayType(T.ArrayType(T.DoubleType(), False), False), False
        ),
    ]
)

GEOM_POINT = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("coordinates", T.ArrayType(T.DoubleType(), False), False),
    ]
)

# Core graph tables (reference tables created at
# /root/reference/entwiner/geopackagenetwork/__init__.py:28-85).
# Dynamic property columns are appended by ingest (schema union, not
# ALTER TABLE).  bbox columns are the write-time spatial index analogue
# (replaces the reference's r-tree, feature_table.py:265-414).
EDGES_BASE_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType(), False),
        T.StructField("_u", T.StringType(), False),
        T.StructField("_v", T.StringType(), False),
        T.StructField("_layer", T.StringType(), True),
        T.StructField("geom", GEOM_LINESTRING, True),
        T.StructField("_minx", T.DoubleType(), True),
        T.StructField("_maxx", T.DoubleType(), True),
        T.StructField("_miny", T.DoubleType(), True),
        T.StructField("_maxy", T.DoubleType(), True),
        T.StructField("_length", T.DoubleType(), True),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("_n", T.StringType(), False),
        T.StructField("geom", GEOM_POINT, True),
    ]
)

# Default SRID matches the reference (EPSG:4326,
# /root/reference/entwiner/geopackagenetwork/__init__.py:10).
DEFAULT_SRID = 4326

# Node-ID rounding precision (reference default 7,
# /root/reference/entwiner/io.py:21-29).
DEFAULT_PRECISION = 7
