"""changes_sign ingest path, exceptions parity, session windows,
hypothesis property tests for the WKB codec and haversine."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SIGNED_FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[-122.0, 47.0], [-122.001, 47.001]],
            },
            "properties": {"incline": 0.12, "surface": "asphalt"},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[-122.001, 47.001], [-122.002, 47.0]],
            },
            "properties": {"incline": -0.05, "surface": "gravel"},
        },
    ],
}


def test_changes_sign_on_reverse_edges(spark, tmp_path):
    """--changes-sign semantics (io.py:47-49): reverse edges negate the
    configured columns, others untouched."""
    from entwiner_spark.sources.geojson import edges_from_geojson

    path = tmp_path / "signed.geojson"
    path.write_text(json.dumps(SIGNED_FC))
    edges = edges_from_geojson(spark, str(path), changes_sign=("incline",))
    rows = {(r["_u"], r["_v"]): r for r in edges.collect()}
    assert len(rows) == 4
    fwd1 = rows[("-122.0, 47.0", "-122.001, 47.001")]
    rev1 = rows[("-122.001, 47.001", "-122.0, 47.0")]
    assert fwd1["incline"] == pytest.approx(0.12)
    assert rev1["incline"] == pytest.approx(-0.12)
    assert fwd1["surface"] == rev1["surface"] == "asphalt"
    fwd2 = rows[("-122.001, 47.001", "-122.002, 47.0")]
    rev2 = rows[("-122.002, 47.0", "-122.001, 47.001")]
    assert rev2["incline"] == pytest.approx(0.05) and fwd2["incline"] == pytest.approx(-0.05)


def test_strict_lookups_raise(spark, tiny_edges, tiny_nodes):
    from entwiner_spark.exceptions import EdgeNotFound, NodeNotFound
    from entwiner_spark.operators.graph import SparkGraph

    G = SparkGraph(tiny_nodes, tiny_edges)
    N1 = "-122.313294, 47.6598762"
    N2 = "-122.3141965, 47.659887"
    attrs = G.edge_attrs(N1, N2)
    assert attrs["fid"] == 2 and "geom" in attrs
    assert "geom" in G.node_attrs(N1)
    with pytest.raises(NodeNotFound):
        G.node_attrs("nowhere")
    with pytest.raises(EdgeNotFound):
        G.edge_attrs(N1, "nowhere")


def test_session_window_stream_counts(spark, tmp_path):
    from pyspark.sql import types as T

    from entwiner_spark.streaming.windows import session_counts

    data_dir = tmp_path / "sess"
    data_dir.mkdir()
    rows = [
        {"ts": "2024-01-01T10:00:00", "user_id": 1, "value": 1.0},
        {"ts": "2024-01-01T10:10:00", "user_id": 1, "value": 1.0},
        {"ts": "2024-01-01T11:30:00", "user_id": 1, "value": 1.0},  # new session
        {"ts": "2024-01-01T10:05:00", "user_id": 2, "value": 1.0},
    ]
    (data_dir / "d.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(data_dir))
    q = (
        session_counts(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, n_events FROM sess_test ORDER BY user_id, n_events"
        ).collect()
    finally:
        q.stop()
    assert [tuple(r) for r in got] == [(1, 1), (1, 2), (2, 1)]


coord = st.floats(
    min_value=-180, max_value=180, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=8))
def test_wkb_roundtrip_property(coords):
    """WKB encode/decode is lossless for any coordinate list."""
    from entwiner_spark.functions.wkb import (
        geometry_to_gpkg_blob,
        gpkg_blob_to_geometry,
        geometry_to_wkb,
        wkb_to_geometry,
    )

    geom = {"type": "LineString", "coordinates": [list(c) for c in coords]}
    assert wkb_to_geometry(geometry_to_wkb(geom)) == geom
    assert gpkg_blob_to_geometry(geometry_to_gpkg_blob(geom)) == geom


def test_haversine_properties(spark):
    """Symmetry, identity, and a known distance (driver-side spot
    values through the Catalyst expression)."""
    from entwiner_spark.functions.geo import haversine_m

    df = spark.createDataFrame(
        [
            (-122.3, 47.6, -122.3, 47.6),     # identity
            (-122.3, 47.6, -122.4, 47.7),
            (-122.4, 47.7, -122.3, 47.6),     # symmetric pair
            (0.0, 0.0, 0.0, 1.0),             # 1 degree latitude
        ],
        "lon1 double, lat1 double, lon2 double, lat2 double",
    )
    d = [
        r["d"]
        for r in df.select(
            haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
        ).collect()
    ]
    assert d[0] == 0.0
    assert d[1] == pytest.approx(d[2], rel=1e-12)      # symmetry
    assert d[3] == pytest.approx(111194.9, abs=10)     # R=6371km meridian degree


def test_edges_from_csv(spark, tmp_path):
    from entwiner_spark.sources.edgelist import (
        edges_from_csv,
        nodes_from_edge_endpoints,
    )

    p = tmp_path / "edges.csv"
    p.write_text("src,dst,cost\na,b,1.5\nb,c,2.0\na,b,9.9\n")
    edges = edges_from_csv(spark, str(p), "src", "dst", add_reverse=True,
                           changes_sign=("cost",))
    rows = {(r["_u"], r["_v"]): r["cost"] for r in edges.collect()}
    assert len(rows) == 4  # 2 unique fwd + 2 rev (dup a->b dropped)
    assert rows[("b", "a")] == pytest.approx(-rows[("a", "b")])
    assert nodes_from_edge_endpoints(edges).count() == 3
    # routing works on a non-geometric graph
    from entwiner_spark.operators.graph import SparkGraph

    G = SparkGraph(nodes_from_edge_endpoints(edges), edges)
    path, dist = G.shortest_path("a", "c", weight=F.abs(F.col("cost")))
    assert path == ["a", "b", "c"]


def test_ogr_gate_raises_without_fiona(spark):
    from entwiner_spark.exceptions import UnrecognizedFileFormat
    from entwiner_spark.sources.ogr import edges_from_ogr

    try:
        import fiona  # noqa: F401

        pytest.skip("fiona installed; gate inactive")
    except ImportError:
        pass
    with pytest.raises(UnrecognizedFileFormat):
        edges_from_ogr(spark, "/tmp/whatever.shp")


def test_geojsonseq_lines_ingest(spark, tmp_path):
    """Newline-delimited GeoJSON (the splittable at-scale format)
    produces the same graph as the FeatureCollection form."""
    from tests.conftest import TINY_FC
    from entwiner_spark.sources.geojson import edges_from_geojson

    p = tmp_path / "tiny.ndjson"
    p.write_text("\n".join(json.dumps(f) for f in TINY_FC["features"]))
    edges = edges_from_geojson(spark, str(p), lines=True)
    assert edges.count() == 8
    rows = {(r["_u"], r["_v"]): r["fid"] for r in edges.collect()}
    assert rows[("-122.313294, 47.6598762", "-122.3141965, 47.659887")] == 2


def test_update_columns_null_semantics(spark):
    from entwiner_spark.operators.mutations import update_columns

    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, status string"
    )
    updates = spark.createDataFrame([(1, None)], "k int, status string")
    # default: NULL update keeps the old value (sparse update)
    kept = update_columns(target, updates, ["k"])
    assert {r["k"]: r["status"] for r in kept.collect()} == {1: "a", 2: "b"}
    # strict MERGE semantics: NULL clears the column on matched rows
    cleared = update_columns(target, updates, ["k"], null_overwrites=True)
    assert {r["k"]: r["status"] for r in cleared.collect()} == {1: None, 2: "b"}
    # duplicate update keys must not multiply target rows
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "k int, status string")
    assert update_columns(target, dup, ["k"]).count() == 2


def test_empty_point_wkb_roundtrip():
    from entwiner_spark.functions.wkb import (
        geometry_to_gpkg_blob,
        gpkg_blob_to_geometry,
    )

    empty = {"type": "Point", "coordinates": []}
    blob = geometry_to_gpkg_blob(empty)
    assert blob[:2] == b"GP" and blob[3] & 0b10000  # empty flag set
    assert gpkg_blob_to_geometry(blob) == empty


def test_to_in_memory_keeps_partitioning(spark, tiny_edges, tiny_nodes):
    from entwiner_spark.operators.graph import SparkGraph

    g = SparkGraph(tiny_nodes, tiny_edges, partitions=3)
    g2 = g.to_in_memory()
    assert g2.edges.rdd.getNumPartitions() == 3  # no re-shuffle on top
    assert g2.size() == 8


def test_gpkg_float_bool_types_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from entwiner_spark.sources.gpkg import read_geopackage, write_geopackage

    df = spark.createDataFrame(
        [(1, 0.5, True), (2, 1.5, False)], "id bigint, grade float, open boolean"
    )
    path = str(tmp_path / "typed.gpkg")
    write_geopackage(df, path, "t")
    back = read_geopackage(spark, path, "t")
    rows = {r["id"]: (r["grade"], r["open"]) for r in back.collect()}
    assert rows[1][0] == 0.5 and rows[2][0] == 1.5  # numeric, not '0.5'
    assert rows[1][1] in (1, True) and rows[2][1] in (0, False)
