"""GeoPackage import/export — boundary-format exchange with the
reference's on-disk artifacts (SURVEY.md §2.1 S5/S7, §3.1).

A user of the reference owns ``.gpkg`` files (SQLite DBs with
``edges``/``nodes`` feature tables and gpkg_* metadata,
/root/reference/entwiner/geopackage/__init__.py:114-192).  These
functions convert between that format and this engine's DataFrames.

Scale note: GeoPackage is a single-file SQLite artifact — inherently a
small-data boundary format (the reference itself is single-node).  The
conversion therefore runs driver-side via stdlib sqlite3 and is NOT a
100 TB path; the 100 TB path is the parquet graph store
(sources/parquet_store.py).  Import parallelizes immediately after
createDataFrame; export collects (guarded by ``max_rows``).
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, Row, SparkSession

from entwiner_spark.functions.wkb import (
    geometry_to_gpkg_blob,
    gpkg_blob_to_geometry,
)
from entwiner_spark.schemas import DEFAULT_SRID

_WGS84_DEF = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


def read_geopackage(
    spark: SparkSession, path: str, table: str, geom_col: str = "geom"
) -> DataFrame:
    """Load a GeoPackage feature table as a DataFrame with the geometry
    decoded to the canonical struct."""
    con = sqlite3.connect(path)
    con.row_factory = sqlite3.Row
    try:
        rows = con.execute(f'SELECT * FROM "{table}"').fetchall()
        if not rows:
            # empty table: build the schema from sqlite column decls
            # (geometry defaults to the LineString struct)
            from pyspark.sql import types as T

            from entwiner_spark.schemas import GEOM_LINESTRING

            decls = con.execute(f'PRAGMA table_info("{table}")').fetchall()
            type_map = {"INTEGER": T.LongType(), "DOUBLE": T.DoubleType()}
            fields = []
            for c in decls:
                name, decl = c["name"], (c["type"] or "TEXT").upper()
                if name == geom_col:
                    fields.append(T.StructField(name, GEOM_LINESTRING, True))
                else:
                    fields.append(
                        T.StructField(name, type_map.get(decl, T.StringType()), True)
                    )
            return spark.createDataFrame([], T.StructType(fields))
    finally:
        con.close()
    records = []
    for r in rows:
        d = dict(r)
        if geom_col in d:
            g = gpkg_blob_to_geometry(d[geom_col])
            # Row (not dict) so createDataFrame infers a struct, not a map
            d[geom_col] = (
                None
                if g is None
                else Row(type=g["type"], coordinates=g["coordinates"])
            )
        records.append(Row(**d))
    return spark.createDataFrame(records)


def _create_gpkg_skeleton(con: sqlite3.Connection, srid: int) -> None:
    """Minimal valid GeoPackage metadata (gpkg_spatial_ref_sys,
    gpkg_contents, gpkg_geometry_columns) — the subset the reference
    creates at geopackage/__init__.py:120-192."""
    con.executescript(
        """
        PRAGMA application_id = 0x47504B47;
        PRAGMA user_version = 10200;
        CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
          definition TEXT NOT NULL, description TEXT);
        CREATE TABLE IF NOT EXISTS gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
          srs_id INTEGER);
        CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL,
          CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
        """
    )
    con.execute(
        "INSERT OR REPLACE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        ("WGS 84", srid, "EPSG", srid, _WGS84_DEF, None),
    )
    for srs_id, name in ((-1, "Undefined cartesian"), (0, "Undefined geographic")):
        con.execute(
            "INSERT OR REPLACE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            (name, srs_id, "NONE", srs_id, "undefined", None),
        )


_SQLITE_TYPES = {
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "boolean": "INTEGER",
    "double": "DOUBLE",
    "float": "DOUBLE",
}


def _sqlite_type(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "DOUBLE"
    return _SQLITE_TYPES.get(dtype, "TEXT")


def register_gpkg_functions(con: sqlite3.Connection) -> None:
    """Register the ST_MinX/ST_MaxX/ST_MinY/ST_MaxY/ST_IsEmpty SQL
    functions the GeoPackage r-tree triggers call, implemented over the
    GPKG blob codec.

    The spec defines the triggers in terms of these functions; GDAL/
    Spatialite/QGIS provide them natively, so artifacts we export stay
    live-indexed under those writers.  Plain sqlite3 connections (like
    this module's own writer) must call this before inserting into a
    triggered table, or sqlite raises "no such function: ST_MinX".
    """

    def _bounds(blob):
        g = gpkg_blob_to_geometry(blob)
        if g is None or not g["coordinates"]:
            return None
        coords = g["coordinates"] if g["type"] != "Point" else [g["coordinates"]]
        return coords

    def _mk(idx, fn):
        def f(blob):
            coords = _bounds(blob)
            if coords is None:
                return None
            return fn(c[idx] for c in coords)

        return f

    con.create_function("ST_MinX", 1, _mk(0, min), deterministic=True)
    con.create_function("ST_MaxX", 1, _mk(0, max), deterministic=True)
    con.create_function("ST_MinY", 1, _mk(1, min), deterministic=True)
    con.create_function("ST_MaxY", 1, _mk(1, max), deterministic=True)
    con.create_function(
        "ST_IsEmpty", 1, lambda b: 1 if _bounds(b) is None else 0, deterministic=True
    )


def write_geopackage(
    df: DataFrame,
    path: str,
    table: str,
    geometry_type: str = "LINESTRING",
    geom_col: str = "geom",
    srid: int = DEFAULT_SRID,
    max_rows: int = 5_000_000,
    append: bool = False,
) -> None:
    """Export a DataFrame to a GeoPackage feature table.

    Collects to the driver (boundary format — see module docstring);
    refuses above ``max_rows`` to prevent accidental 100 TB collects.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{n} rows exceeds max_rows={max_rows}: GeoPackage is a "
            "small-data exchange format; use the parquet store at scale"
        )
    # fid is always the PK column; a DataFrame fid feeds it values
    cols = [c for c, _ in df.dtypes if c not in (geom_col, "fid")]
    types = dict(df.dtypes)
    has_geom = geom_col in types
    has_fid = "fid" in types

    if not append and os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        # appends into a table whose r-tree triggers are installed need
        # the ST_* functions on THIS connection (triggers fire per-row)
        register_gpkg_functions(con)
        _create_gpkg_skeleton(con, srid)
        col_defs = ", ".join(f'"{c}" {_sqlite_type(types[c])}' for c in cols)
        geom_def = f', "{geom_col}" BLOB' if has_geom else ""
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" '
            f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, {col_defs}{geom_def})"
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, srs_id) VALUES (?,?,?,?)",
            (table, "features", table, srid),
        )
        if has_geom:
            con.execute(
                "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (table, geom_col, geometry_type, srid),
            )
        out_cols = (["fid"] if has_fid else []) + cols + (
            [geom_col] if has_geom else []
        )
        placeholders = ", ".join("?" for _ in out_cols)
        quoted = ", ".join(f'"{c}"' for c in out_cols)
        insert = f'INSERT INTO "{table}" ({quoted}) VALUES ({placeholders})'
        import json as _json

        def _bindable(v):
            # sqlite3 cannot bind lists/dicts (array/struct property
            # columns) — store them as JSON text in the TEXT column
            return _json.dumps(v) if isinstance(v, (list, dict)) else v

        batch = []
        for row in df.toLocalIterator():
            d = row.asDict(recursive=True)
            vals = [
                geometry_to_gpkg_blob(d[c], srid) if c == geom_col
                else _bindable(d[c])
                for c in out_cols
            ]
            batch.append(vals)
            if len(batch) >= 10_000:  # reference batch size, feature_table.py:461
                con.executemany(insert, batch)
                batch = []
        if batch:
            con.executemany(insert, batch)
        con.commit()
    finally:
        con.close()


def add_rtree_index(
    path: str, table: str, geom_col: str = "geom"
) -> int:
    """Build the GeoPackage r-tree for an exported feature table (X1).

    Parity with FeatureTable.add_rtree
    (/root/reference/entwiner/geopackage/feature_table.py:265-414):
    registers the gpkg_rtree_index extension, creates the
    ``rtree_<table>_<geom>`` virtual table, bulk-seeds it from the
    geometry blobs, and installs the spec's six maintenance triggers
    (insert / 4×update / delete) so the index stays live under any
    writer that provides the ST_* functions (GDAL/Spatialite natively;
    plain sqlite3 via ``register_gpkg_functions``).  Returns the number
    of indexed rows.

    Runs driver-side on the exported artifact (the engine itself never
    uses this index — parquet bbox columns are its spatial index).
    """
    con = sqlite3.connect(path)
    try:
        con.execute(
            """
            CREATE TABLE IF NOT EXISTS gpkg_extensions (
              table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL,
              definition TEXT NOT NULL, scope TEXT NOT NULL,
              CONSTRAINT ge_tce UNIQUE (table_name, column_name, extension_name))
            """
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_extensions VALUES (?,?,?,?,?)",
            (
                table,
                geom_col,
                "gpkg_rtree_index",
                "http://www.geopackage.org/spec120/#extension_rtree",
                "write-only",
            ),
        )
        rt = f"rtree_{table}_{geom_col}"
        con.execute(
            f'CREATE VIRTUAL TABLE IF NOT EXISTS "{rt}" USING rtree(id, minx, maxx, miny, maxy)'
        )
        rows = con.execute(f'SELECT fid, "{geom_col}" FROM "{table}"').fetchall()
        seed = []
        for fid, blob in rows:
            g = gpkg_blob_to_geometry(blob)
            if g is None or not g["coordinates"]:
                continue
            coords = g["coordinates"] if g["type"] != "Point" else [g["coordinates"]]
            xs = [c[0] for c in coords]
            ys = [c[1] for c in coords]
            seed.append((fid, min(xs), max(xs), min(ys), max(ys)))
        con.executemany(f'INSERT OR REPLACE INTO "{rt}" VALUES (?,?,?,?,?)', seed)

        # full spec trigger set — live r-tree maintenance, parity with
        # the reference's six triggers (feature_table.py:313-414).  The
        # triggers call ST_MinX..ST_IsEmpty: GDAL/Spatialite/QGIS
        # writers provide those natively; plain-sqlite3 writers (incl.
        # write_geopackage itself) get them from
        # register_gpkg_functions(con).
        gc = f'"{geom_col}"'
        not_empty = f"(new.{gc} NOT NULL AND NOT ST_IsEmpty(new.{gc}))"
        is_empty = f"(new.{gc} ISNULL OR ST_IsEmpty(new.{gc}))"
        upsert = (
            f'INSERT OR REPLACE INTO "{rt}" VALUES (new.fid, '
            f"ST_MinX(new.{gc}), ST_MaxX(new.{gc}), "
            f"ST_MinY(new.{gc}), ST_MaxY(new.{gc}));"
        )
        con.executescript(
            f"""
            CREATE TRIGGER IF NOT EXISTS "{rt}_insert" AFTER INSERT ON "{table}"
              WHEN {not_empty}
              BEGIN {upsert} END;
            CREATE TRIGGER IF NOT EXISTS "{rt}_update1" AFTER UPDATE OF "{geom_col}" ON "{table}"
              WHEN old.fid = new.fid AND {not_empty}
              BEGIN {upsert} END;
            CREATE TRIGGER IF NOT EXISTS "{rt}_update2" AFTER UPDATE OF "{geom_col}" ON "{table}"
              WHEN old.fid = new.fid AND {is_empty}
              BEGIN DELETE FROM "{rt}" WHERE id = old.fid; END;
            CREATE TRIGGER IF NOT EXISTS "{rt}_update3" AFTER UPDATE ON "{table}"
              WHEN old.fid != new.fid AND {not_empty}
              BEGIN
                DELETE FROM "{rt}" WHERE id = old.fid;
                {upsert}
              END;
            CREATE TRIGGER IF NOT EXISTS "{rt}_update4" AFTER UPDATE ON "{table}"
              WHEN old.fid != new.fid AND {is_empty}
              BEGIN DELETE FROM "{rt}" WHERE id IN (old.fid, new.fid); END;
            CREATE TRIGGER IF NOT EXISTS "{rt}_delete" AFTER DELETE ON "{table}"
              BEGIN DELETE FROM "{rt}" WHERE id = old.fid; END;
            """
        )
        con.commit()
        return len(seed)
    finally:
        con.close()
