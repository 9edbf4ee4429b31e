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


def test_multilinestring_split_ingest(spark, tmp_path):
    """split_multilinestrings=True: each MultiLineString component
    becomes its own edge (the reference's unimplemented TODO at
    io.py:36-37); degenerate parts are dropped; fids stay unique; the
    default path still ignores MultiLineStrings entirely."""
    import json as _json

    from entwiner_spark.sources.geojson import edges_from_geojson

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[0.0, 0.0], [1.0, 0.0]],
                },
                "properties": {"kind": "plain", "cost": 2.0},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "MultiLineString",
                    "coordinates": [
                        [[2.0, 0.0], [3.0, 0.0], [3.0, 1.0]],
                        [[4.0, 0.0]],              # degenerate: dropped
                        [[5.0, 0.0], [6.0, 0.0]],
                    ],
                },
                "properties": {"kind": "multi", "cost": 7.0},
            },
        ],
    }
    p = tmp_path / "mixed.geojson"
    p.write_text(_json.dumps(fc))

    # default path: MultiLineString ignored (reference behavior)
    plain = edges_from_geojson(spark, str(p), add_reverse=False)
    assert plain.count() == 1

    split = edges_from_geojson(
        spark, str(p), add_reverse=False, split_multilinestrings=True
    )
    rows = {(r["_u"], r["_v"]): r for r in split.collect()}
    assert len(rows) == 3  # 1 plain + 2 valid MLS parts
    assert ("2.0, 0.0", "3.0, 1.0") in rows and ("5.0, 0.0", "6.0, 0.0") in rows
    part = rows[("2.0, 0.0", "3.0, 1.0")]
    assert part["kind"] == "multi" and part["cost"] == 7.0
    assert part["geom"]["coordinates"] == [[2.0, 0.0], [3.0, 0.0], [3.0, 1.0]]
    fids = [r["fid"] for r in rows.values()]
    assert len(set(fids)) == 3  # unique after sub-feature renumbering

    # fwd+rev over the split parts: 6 edges, reverse coords reversed
    both = edges_from_geojson(
        spark, str(p), add_reverse=True, split_multilinestrings=True
    )
    assert both.count() == 6
    rev = {
        (r["_u"], r["_v"]): r for r in both.collect()
    }[("3.0, 1.0", "2.0, 0.0")]
    assert rev["geom"]["coordinates"] == [[3.0, 1.0], [3.0, 0.0], [2.0, 0.0]]


def test_node_attrs_from_points_mixed_file(spark, tmp_path):
    """r11-verdict task #3 (reference TODO.md "Node attributes"): a
    mixed GeoJSON file — sidewalk LineStrings plus kerb/crossing
    Points — ingests edges via raw_coords=True (naive inference would
    degrade mixed coordinate nesting to array<string> and NULL every
    node id), routes Point properties onto the endpoint nodes they
    coincide with via the rounded node-id join, last-write-wins on
    duplicate points, drops off-network points, and get_node /
    node_attrs then return the enriched row."""
    import json

    from entwiner_spark import (
        SparkGraph,
        edges_from_geojson,
        node_attrs_from_points,
        nodes_from_edges,
    )

    def feat(geom_type, coords, **props):
        return {
            "type": "Feature",
            "geometry": {"type": geom_type, "coordinates": coords},
            "properties": props,
        }

    fc = {
        "type": "FeatureCollection",
        "features": [
            feat("LineString", [[0.0, 0.0], [1.0, 0.0]], cost=1.0),
            feat("LineString", [[1.0, 0.0], [1.0, 1.0]], cost=2.0),
            # kerb at the shared junction (1, 0) — enriches that node
            feat("Point", [1.0, 0.0], kerb="rolled", tactile=False),
            # duplicate at the same junction, later in file: wins
            feat("Point", [1.0000000001, 0.0], kerb="raised", tactile=True),
            # off-network point: silently dropped by the left join
            feat("Point", [9.0, 9.0], kerb="flush", tactile=False),
        ],
    }
    p = tmp_path / "mixed.geojson"
    p.write_text(json.dumps(fc))

    edges = edges_from_geojson(spark, str(p), add_reverse=True, raw_coords=True)
    assert edges.count() == 4  # 2 fwd + 2 rev; points dropped (P10)
    attrs = node_attrs_from_points(spark, str(p))
    got = {r["_n"]: (r["kerb"], r["tactile"]) for r in attrs.collect()}
    assert got == {
        "1.0, 0.0": ("raised", True),  # LWW: the later point wins
        "9.0, 9.0": ("flush", False),
    }
    nodes = nodes_from_edges(edges, point_attrs=attrs)
    assert {r["_n"] for r in nodes.collect()} == {
        "0.0, 0.0", "1.0, 0.0", "1.0, 1.0",
    }  # the off-network point never becomes a node
    g = SparkGraph(nodes, edges)
    row = g.get_node("1.0, 0.0").collect()[0]
    assert row["kerb"] == "raised" and row["tactile"] is True
    assert g.node_attrs("1.0, 0.0")["kerb"] == "raised"
    bare = g.node_attrs("0.0, 0.0")  # un-enriched node: NULL attrs
    assert bare["kerb"] is None
