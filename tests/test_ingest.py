"""Ingest parity with the reference fixture graph (FIXTURES.md §1).

Reference invariants from /root/reference/tests/test_digraphdbview.py:
G.size() == 8; specific node IDs exist with trailing zeros dropped;
edge ("-122.313294, 47.6598762" -> "-122.3141965, 47.659887") has
fid == 2 and a geom attribute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N1 = "-122.313294, 47.6598762"
N2 = "-122.3141965, 47.659887"


def test_eight_edges(tiny_edges):
    assert tiny_edges.count() == 8


def test_five_nodes(tiny_nodes):
    assert tiny_nodes.count() == 5


def test_node_id_formatting(tiny_nodes):
    ids = {r["_n"] for r in tiny_nodes.collect()}
    assert N1 in ids  # trailing zero of -122.3132940 dropped
    assert N2 in ids  # trailing zero of 47.6598870 dropped


def test_reverse_edge_fid(tiny_edges):
    row = tiny_edges.filter((F.col("_u") == N1) & (F.col("_v") == N2)).collect()
    assert len(row) == 1
    assert row[0]["fid"] == 2
    assert row[0]["geom"] is not None
    # reverse edge geometry is the forward geometry reversed
    fwd = tiny_edges.filter((F.col("_u") == N2) & (F.col("_v") == N1)).collect()[0]
    assert row[0]["geom"]["coordinates"] == fwd["geom"]["coordinates"][::-1]


def test_layer_from_filename(tiny_edges):
    layers = {r["_layer"] for r in tiny_edges.select("_layer").distinct().collect()}
    assert layers == {"tiny"}


def test_bbox_columns(tiny_edges):
    row = tiny_edges.filter(F.col("fid") == 1).collect()[0]
    lons = [c[0] for c in row["geom"]["coordinates"]]
    lats = [c[1] for c in row["geom"]["coordinates"]]
    assert row["_minx"] == min(lons) and row["_maxx"] == max(lons)
    assert row["_miny"] == min(lats) and row["_maxy"] == max(lats)


def test_last_write_wins_dedup(spark, tiny_geojson, tmp_path):
    """Re-ingesting a copy of the same data keeps (u,v) unique (U2)."""
    import shutil

    from entwiner_spark.sources.geojson import edges_from_geojson

    copy = tmp_path / "tiny2.geojson"
    shutil.copy(tiny_geojson, copy)
    edges = edges_from_geojson(spark, [tiny_geojson, str(copy)])
    assert edges.count() == 8
    # surviving fids come from the later file (offset 8, fids 9..16)
    assert edges.agg(F.min("fid")).collect()[0][0] > 8
