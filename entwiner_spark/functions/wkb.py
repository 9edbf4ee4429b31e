"""WKB / GeoPackage-blob codec (SURVEY.md §2.1 S9, §2.8 F10/F11).

The reference stores geometry as GeoPackage blobs: an 8-byte header
(b"GP", version, flags, little-endian SRID) followed by WKB
(/root/reference/entwiner/geopackage/feature_table.py:505-599, via
geomet).  Internally this engine keeps geometry as nested structs —
this codec exists ONLY at the import/export boundary, so it is plain
Python wrapped in Arrow-batched pandas UDFs (never in a hot path).

Minimal WKB subset implemented: Point (1) and LineString (2), little
endian — exactly what the reference reads/writes for its graphs.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from entwiner_spark.schemas import DEFAULT_SRID

_WKB_POINT = 1
_WKB_LINESTRING = 2


def geometry_to_wkb(geom: dict | None) -> bytes | None:
    """GeoJSON-shaped dict -> little-endian WKB."""
    if geom is None:
        return None
    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Point":
        if not coords:
            # POINT EMPTY: NaN coordinates per the WKB convention
            nan = float("nan")
            return struct.pack("<BI2d", 1, _WKB_POINT, nan, nan)
        return struct.pack("<BI2d", 1, _WKB_POINT, coords[0], coords[1])
    if gtype == "LineString":
        out = struct.pack("<BII", 1, _WKB_LINESTRING, len(coords))
        for c in coords:
            out += struct.pack("<2d", c[0], c[1])
        return out
    raise ValueError(f"unsupported geometry type: {gtype}")


def wkb_to_geometry(buf: bytes | None) -> dict | None:
    """Little- or big-endian WKB -> GeoJSON-shaped dict."""
    if buf is None:
        return None
    endian = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(f"{endian}I", buf, 1)
    if gtype == _WKB_POINT:
        import math

        x, y = struct.unpack_from(f"{endian}2d", buf, 5)
        if math.isnan(x) and math.isnan(y):
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": [x, y]}
    if gtype == _WKB_LINESTRING:
        (n,) = struct.unpack_from(f"{endian}I", buf, 5)
        coords = [
            list(struct.unpack_from(f"{endian}2d", buf, 9 + 16 * i)) for i in range(n)
        ]
        return {"type": "LineString", "coordinates": coords}
    raise ValueError(f"unsupported WKB geometry type: {gtype}")


def gpkg_header(srid: int = DEFAULT_SRID, empty: bool = False) -> bytes:
    """GeoPackage blob header (F10): magic, version, flags, SRID.

    Parity: feature_table.py:505-510 — version 0, little-endian flag
    bit set, empty-geometry bit when flagged."""
    flags = 0b00000001 | (0b00010000 if empty else 0)
    return b"GP" + bytes([0, flags]) + struct.pack("<i", srid)


def gpkg_blob_to_geometry(blob: bytes | None) -> dict | None:
    """GeoPackage blob -> GeoJSON dict (skips header + envelope).

    Validates the 'GP' magic and minimum header length up front so a
    truncated or non-GeoPackage blob fails with a clear error at the
    import boundary instead of an IndexError mid-decode."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError(
            f"not a GeoPackage geometry blob (len={len(blob)}, "
            f"magic={blob[:2]!r}); expected 'GP' header"
        )
    flags = blob[3]
    envelope_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[envelope_code]
    return wkb_to_geometry(blob[8 + env_len:])


def geometry_to_gpkg_blob(geom: dict | None, srid: int = DEFAULT_SRID) -> bytes | None:
    if geom is None:
        return None
    return gpkg_header(srid, empty=not geom.get("coordinates")) + geometry_to_wkb(geom)


# ---- Spark boundary UDFs (Arrow-batched; import/export only) ---------

_LS_STRUCT = "geom struct<type:string, coordinates:array<array<double>>>"


@pandas_udf(T.BinaryType())
def linestring_to_gpkg_udf(geoms: pd.DataFrame) -> pd.Series:
    # Arrow hands a struct column to a pandas UDF as a DataFrame with
    # one column per field
    return pd.Series(
        [
            None
            if t is None
            else geometry_to_gpkg_blob(
                {"type": t, "coordinates": [list(c) for c in coords]}
            )
            for t, coords in zip(geoms["type"], geoms["coordinates"])
        ]
    )


@pandas_udf(
    T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
        ]
    )
)
def gpkg_to_linestring_udf(blobs: pd.Series) -> pd.DataFrame:
    decoded = blobs.map(gpkg_blob_to_geometry)
    return pd.DataFrame(
        {
            "type": decoded.map(lambda g: None if g is None else g["type"]),
            "coordinates": decoded.map(
                lambda g: None if g is None else g["coordinates"]
            ),
        }
    )
