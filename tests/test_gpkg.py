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


def test_rtree_triggers_keep_index_live(spark, tiny_edges, tmp_path):
    """The six spec triggers (reference feature_table.py:313-414)
    maintain the r-tree through insert/update/delete on any connection
    that registers the ST_* functions."""
    from entwiner_spark.functions.wkb import geometry_to_gpkg_blob
    from entwiner_spark.sources.gpkg import (
        add_rtree_index,
        register_gpkg_functions,
        write_geopackage,
    )

    path = str(tmp_path / "live.gpkg")
    write_geopackage(tiny_edges.select("fid", "_u", "_v", "geom"), path, "edges")
    add_rtree_index(path, "edges")
    con = sqlite3.connect(path)
    try:
        register_gpkg_functions(con)
        blob = geometry_to_gpkg_blob(
            {"type": "LineString", "coordinates": [[10.0, 20.0], [11.0, 21.0]]}
        )
        # insert trigger adds the new row's bbox
        con.execute(
            'INSERT INTO "edges" (fid, _u, _v, geom) VALUES (99, "a", "b", ?)',
            (blob,),
        )
        row = con.execute(
            "SELECT minx, maxx, miny, maxy FROM rtree_edges_geom WHERE id = 99"
        ).fetchone()
        assert row == (10.0, 11.0, 20.0, 21.0)
        # update trigger rewrites the bbox in place
        blob2 = geometry_to_gpkg_blob(
            {"type": "LineString", "coordinates": [[-5.0, -6.0], [-4.0, -5.5]]}
        )
        con.execute('UPDATE "edges" SET geom = ? WHERE fid = 99', (blob2,))
        row = con.execute(
            "SELECT minx, maxx, miny, maxy FROM rtree_edges_geom WHERE id = 99"
        ).fetchone()
        assert row == (-5.0, -4.0, -6.0, -5.5)
        # NULLing the geometry removes the entry (update2)
        con.execute('UPDATE "edges" SET geom = NULL WHERE fid = 99')
        assert (
            con.execute(
                "SELECT count(*) FROM rtree_edges_geom WHERE id = 99"
            ).fetchone()[0]
            == 0
        )
        # delete trigger removes an original row's entry
        con.execute('DELETE FROM "edges" WHERE fid = 1')
        assert (
            con.execute("SELECT count(*) FROM rtree_edges_geom").fetchone()[0] == 7
        )
    finally:
        con.close()


def test_rtree_live_through_append_export(spark, tiny_edges, tmp_path):
    """write_geopackage(append=True) into a triggered table keeps the
    r-tree current without re-running add_rtree_index."""
    from pyspark.sql import functions as F

    from entwiner_spark.sources.gpkg import add_rtree_index, write_geopackage

    path = str(tmp_path / "append.gpkg")
    first = tiny_edges.select("fid", "_u", "_v", "geom").limit(4)
    write_geopackage(first, path, "edges")
    add_rtree_index(path, "edges")
    rest = (
        tiny_edges.select("fid", "_u", "_v", "geom")
        .join(first.select("fid"), "fid", "left_anti")
        .withColumn("fid", F.col("fid") + 100)
    )
    write_geopackage(rest, path, "edges", append=True)
    con = sqlite3.connect(path)
    try:
        assert con.execute('SELECT count(*) FROM "edges"').fetchone()[0] == 8
        assert (
            con.execute("SELECT count(*) FROM rtree_edges_geom").fetchone()[0] == 8
        )
    finally:
        con.close()
