"""WKB codec + GeoPackage round-trip (S9/F10/F11 boundary format)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F


def test_wkb_roundtrip_pure_python():
    from entwiner_spark.functions.wkb import (
        geometry_to_gpkg_blob,
        geometry_to_wkb,
        gpkg_blob_to_geometry,
        gpkg_header,
        wkb_to_geometry,
    )

    ls = {"type": "LineString", "coordinates": [[-122.31, 47.65], [-122.30, 47.66]]}
    pt = {"type": "Point", "coordinates": [-122.31, 47.65]}
    assert wkb_to_geometry(geometry_to_wkb(ls)) == ls
    assert wkb_to_geometry(geometry_to_wkb(pt)) == pt
    hdr = gpkg_header(4326)
    assert hdr[:2] == b"GP" and len(hdr) == 8
    blob = geometry_to_gpkg_blob(ls)
    assert blob[:2] == b"GP"
    assert gpkg_blob_to_geometry(blob) == ls


def test_wkb_spark_udf_roundtrip(spark, tiny_edges):
    from entwiner_spark.functions.wkb import (
        gpkg_to_linestring_udf,
        linestring_to_gpkg_udf,
    )

    blobs = tiny_edges.select("fid", linestring_to_gpkg_udf("geom").alias("blob"))
    back = blobs.select("fid", gpkg_to_linestring_udf("blob").alias("geom"))
    orig = {r["fid"]: r["geom"]["coordinates"] for r in tiny_edges.collect()}
    rt = {r["fid"]: [list(c) for c in r["geom"]["coordinates"]] for r in back.collect()}
    assert {k: [list(c) for c in v] for k, v in orig.items()} == rt


def test_geopackage_roundtrip(spark, tiny_edges, tiny_nodes, tmp_path):
    from entwiner_spark.sources.gpkg import read_geopackage, write_geopackage

    path = str(tmp_path / "graph.gpkg")
    write_geopackage(
        tiny_edges.select("_u", "_v", "_layer", "geom"), path, "edges"
    )
    write_geopackage(
        tiny_nodes, path, "nodes", geometry_type="POINT", append=True
    )

    # the file is a structurally valid GeoPackage
    con = sqlite3.connect(path)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == 0x47504B47  # 'GPKG'
        tables = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        assert {"edges", "nodes", "gpkg_contents", "gpkg_geometry_columns"} <= tables
        assert con.execute("SELECT count(*) FROM edges").fetchone()[0] == 8
        blob = con.execute("SELECT geom FROM edges LIMIT 1").fetchone()[0]
        assert blob[:2] == b"GP"
    finally:
        con.close()

    # round-trips back through Spark with geometry intact
    edges = read_geopackage(spark, path, "edges")
    assert edges.count() == 8
    assert set(edges.columns) >= {"fid", "_u", "_v", "geom"}
    row = edges.filter(F.col("geom").isNotNull()).limit(1).collect()[0]
    assert row["geom"]["type"] == "LineString"
    nodes = read_geopackage(spark, path, "nodes")
    assert nodes.count() == 5


def test_rtree_index_on_export(spark, tiny_edges, tmp_path):
    from entwiner_spark.sources.gpkg import add_rtree_index, write_geopackage

    path = str(tmp_path / "indexed.gpkg")
    write_geopackage(tiny_edges.select("fid", "_u", "_v", "geom"), path, "edges")
    n = add_rtree_index(path, "edges")
    assert n == 8
    con = sqlite3.connect(path)
    try:
        # extension registered and r-tree queryable
        ext = con.execute(
            "SELECT extension_name FROM gpkg_extensions WHERE table_name='edges'"
        ).fetchone()
        assert ext[0] == "gpkg_rtree_index"
        assert con.execute("SELECT count(*) FROM rtree_edges_geom").fetchone()[0] == 8
        # bbox query through the r-tree finds the 2 edges at node N1
        hits = con.execute(
            "SELECT id FROM rtree_edges_geom WHERE maxx >= -122.3133 AND minx <= -122.3132"
            " AND maxy >= 47.6598 AND miny <= 47.6599"
        ).fetchall()
        assert len(hits) == 2
    finally:
        con.close()
