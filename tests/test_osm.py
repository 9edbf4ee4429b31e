"""OSM XML ingest (sources/osm.py — reference TODO.md:29's named input
format): parse, junction split, oneway, node attrs, and routing over
the ingested graph."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from entwiner_spark.operators.graph import SparkGraph
from entwiner_spark.sources.osm import (
    edges_from_osm,
    graph_from_osm,
    node_attrs_from_osm,
    osm_nodes,
    osm_way_members,
    read_osm_elements,
)

# A 5-node street "plus": way 10 runs W(1)->C(2)->E(3) (residential,
# two-way), way 20 runs S(4)->C(2)->N(5) (oneway=yes), so node 2 is a
# mid-way junction on BOTH ways and each must split there.  Way 30 is a
# riverbank (no highway tag -> filtered).  Way 40 references a node
# absent from the extract (dangling ref -> dropped member).  Node 2
# carries a highway=traffic_signals tag; node 3 a kerb tag.
_OSM_XML = textwrap.dedent(
    """\
    <?xml version="1.0" encoding="UTF-8"?>
    <osm version="0.6" generator="test">
      <bounds minlat="45.0" minlon="-122.4" maxlat="45.1" maxlon="-122.2"/>
      <node id="1" lon="-122.31" lat="45.05"/>
      <node id="2" lon="-122.30" lat="45.05">
        <tag k="highway" v="traffic_signals"/>
      </node>
      <node id="3" lon="-122.29" lat="45.05">
        <tag k="kerb" v="raised"/>
      </node>
      <node id="4" lon="-122.30" lat="45.04"/>
      <node id="5" lon="-122.30" lat="45.06"/>
      <way id="10">
        <nd ref="1"/><nd ref="2"/><nd ref="3"/>
        <tag k="highway" v="residential"/>
        <tag k="name" v="Main St"/>
      </way>
      <way id="20">
        <nd ref="4"/><nd ref="2"/><nd ref="5"/>
        <tag k="highway" v="primary"/>
        <tag k="oneway" v="yes"/>
      </way>
      <way id="30">
        <nd ref="1"/><nd ref="4"/>
        <tag k="waterway" v="riverbank"/>
      </way>
      <way id="40">
        <nd ref="5"/><nd ref="999"/>
        <tag k="highway" v="service"/>
      </way>
    </osm>
    """
)


@pytest.fixture(scope="module")
def osm_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "plus.osm"
    p.write_text(_OSM_XML)
    return str(p)


def test_read_osm_elements(spark, osm_file):
    elems = read_osm_elements(spark, osm_file)
    nodes = osm_nodes(elems).collect()
    assert {r["osm_id"] for r in nodes} == {1, 2, 3, 4, 5}
    byid = {r["osm_id"]: r for r in nodes}
    assert byid[1]["lon"] == -122.31 and byid[1]["lat"] == 45.05
    assert byid[2]["tags"] == {"highway": "traffic_signals"}
    members = osm_way_members(elems).collect()
    assert {r["way_id"] for r in members} == {10, 20, 30, 40}
    w10 = sorted(
        ((r["seq"], r["ref"]) for r in members if r["way_id"] == 10)
    )
    assert w10 == [(0, 1), (1, 2), (2, 3)]
    assert all(
        r["tags"].get("oneway") == "yes"
        for r in members
        if r["way_id"] == 20
    )


def test_edges_from_osm_junction_split_and_oneway(spark, osm_file):
    e = edges_from_osm(spark, osm_file).collect()
    # way 10 splits at junction 2 -> 2 segments x 2 directions = 4;
    # way 20 splits too but is oneway -> 2 forward rows only;
    # way 30 has no highway tag, way 40's second ref dangles -> 0
    keys = {(r["_way_id"], r["_seg"], r["_dir"]) for r in e}
    assert keys == {
        (10, 0, 0),
        (10, 0, 1),
        (10, 1, 0),
        (10, 1, 1),
        (20, 0, 0),
        (20, 1, 0),
    }
    by = {(r["_way_id"], r["_seg"], r["_dir"]): r for r in e}
    # refs pin segment endpoints and orientation
    assert (by[(10, 0, 0)]["_u_ref"], by[(10, 0, 0)]["_v_ref"]) == (1, 2)
    assert (by[(10, 0, 1)]["_u_ref"], by[(10, 0, 1)]["_v_ref"]) == (2, 1)
    assert (by[(20, 0, 0)]["_u_ref"], by[(20, 0, 0)]["_v_ref"]) == (4, 2)
    assert (by[(20, 1, 0)]["_u_ref"], by[(20, 1, 0)]["_v_ref"]) == (2, 5)
    # canonical rounded "lon, lat" node ids (F1/F2)
    assert by[(10, 0, 0)]["_u"] == "-122.31, 45.05"
    assert by[(10, 0, 0)]["_v"] == "-122.3, 45.05"
    # geometry: 2-point LineStrings in travel order, reversed on rev
    assert by[(10, 0, 0)]["geom"]["coordinates"] == [
        [-122.31, 45.05],
        [-122.3, 45.05],
    ]
    assert by[(10, 0, 1)]["geom"]["coordinates"] == [
        [-122.3, 45.05],
        [-122.31, 45.05],
    ]
    # tag columns + layer + bbox + length present
    assert by[(10, 0, 0)]["highway"] == "residential"
    assert by[(10, 0, 0)]["name"] == "Main St"
    assert by[(20, 0, 0)]["highway"] == "primary"
    assert all(r["_layer"] == "osm" for r in e)
    assert all(r["_length"] > 0 for r in e)
    assert by[(10, 0, 0)]["_minx"] == -122.31
    assert by[(10, 0, 0)]["_maxx"] == -122.3


def test_oneway_reverse_value(spark, tmp_path):
    xml = _OSM_XML.replace('v="yes"', 'v="-1"')
    p = tmp_path / "rev.osm"
    p.write_text(xml)
    e = edges_from_osm(spark, str(p)).collect()
    w20 = {
        (r["_u_ref"], r["_v_ref"]) for r in e if r["_way_id"] == 20
    }
    # oneway=-1: travel direction is AGAINST member order
    assert w20 == {(2, 4), (5, 2)}


def test_interior_nonjunction_nodes_stay_in_geometry(spark, tmp_path):
    """A 4-node way with no crossing keeps ONE segment whose geometry
    carries all 4 points (no junction -> no split)."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.002" lat="0.0"/>
          <node id="4" lon="0.003" lat="0.0"/>
          <way id="7">
            <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/>
            <tag k="highway" v="path"/>
          </way>
        </osm>
        """
    )
    p = tmp_path / "chain.osm"
    p.write_text(xml)
    e = edges_from_osm(spark, str(p)).collect()
    assert {(r["_way_id"], r["_seg"], r["_dir"]) for r in e} == {
        (7, 0, 0),
        (7, 0, 1),
    }
    fwd = next(r for r in e if r["_dir"] == 0)
    assert [c[0] for c in fwd["geom"]["coordinates"]] == [
        0.0,
        0.001,
        0.002,
        0.003,
    ]


def test_loop_way_splits_at_closure(spark, tmp_path):
    """A closed loop (first ref == last ref) has its closure node
    referenced twice -> it is a junction; the loop must not collapse
    into a zero-length self-edge with hidden geometry."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.001" lat="0.001"/>
          <way id="9">
            <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="1"/>
            <tag k="highway" v="residential"/>
          </way>
        </osm>
        """
    )
    p = tmp_path / "loop.osm"
    p.write_text(xml)
    e = edges_from_osm(spark, str(p)).collect()
    fwd = [r for r in e if r["_dir"] == 0]
    assert len(fwd) == 1  # endpoints are the only cuts: one loop edge
    assert fwd[0]["_u_ref"] == 1 and fwd[0]["_v_ref"] == 1
    assert len(fwd[0]["geom"]["coordinates"]) == 4


def test_node_attrs_and_graph_composition(spark, osm_file):
    elems = read_osm_elements(spark, osm_file)
    attrs = {
        r["_n"]: (r["highway"], r["kerb"])
        for r in node_attrs_from_osm(
            elems, keys=("highway", "kerb")
        ).collect()
    }
    assert attrs["-122.3, 45.05"] == ("traffic_signals", None)
    assert attrs["-122.29, 45.05"] == (None, "raised")

    nodes, edges = graph_from_osm(
        spark, osm_file, node_attr_keys=("highway", "kerb")
    )
    nd = {r["_n"]: r for r in nodes.collect()}
    assert nd["-122.3, 45.05"]["highway"] == "traffic_signals"
    assert nd["-122.29, 45.05"]["kerb"] == "raised"
    assert nd["-122.31, 45.05"]["kerb"] is None

    # routing over the ingested graph: W -> N must pass the junction;
    # N -> S is unreachable (way 20 is oneway S->C->N)
    g = SparkGraph(nodes, edges)
    path, cost = g.shortest_path(
        "-122.31, 45.05", "-122.3, 45.06", weight="_length"
    )
    assert path == ["-122.31, 45.05", "-122.3, 45.05", "-122.3, 45.06"]
    assert cost > 0
    assert g.shortest_path("-122.3, 45.06", "-122.3, 45.04") is None


def test_multi_file_extract_shares_boundary_nodes(spark, tmp_path):
    """Ways and the nodes they reference may live in DIFFERENT files
    (region extracts share boundary nodes) — the refs->nodes join is
    global across the file set."""
    nodes_xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
        </osm>
        """
    )
    ways_xml = textwrap.dedent(
        """\
        <osm>
          <way id="5">
            <nd ref="1"/><nd ref="2"/>
            <tag k="highway" v="tertiary"/>
          </way>
        </osm>
        """
    )
    pa, pb = tmp_path / "a.osm", tmp_path / "b.osm"
    pa.write_text(nodes_xml)
    pb.write_text(ways_xml)
    e = edges_from_osm(spark, [str(pa), str(pb)])
    assert e.count() == 2  # fwd + rev
    assert e.filter(F.col("_dir") == 0).collect()[0]["_u"] == "0.0, 0.0"


def test_duplicate_node_definitions_dedupe(spark, tmp_path):
    """Overlapping region extracts repeat boundary nodes (r13 ADVICE):
    a duplicated <node> must NOT multiply member rows — which would
    inflate _use into phantom junction splits and duplicate geometry
    points.  A 3-node way whose middle node is defined in BOTH files
    must still come out as ONE unsplit 3-point segment."""
    file_a = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <way id="7">
            <nd ref="1"/><nd ref="2"/><nd ref="3"/>
            <tag k="highway" v="residential"/>
          </way>
        </osm>
        """
    )
    file_b = textwrap.dedent(
        """\
        <osm>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.002" lat="0.0"/>
        </osm>
        """
    )
    pa, pb = tmp_path / "a.osm", tmp_path / "b.osm"
    pa.write_text(file_a)
    pb.write_text(file_b)
    e = edges_from_osm(spark, [str(pa), str(pb)])
    rows = e.filter(F.col("_dir") == 0).collect()
    # one segment (no phantom split at node 2), 3 distinct points
    assert len(rows) == 1
    geom = rows[0]["geom"]
    assert len(geom["coordinates"]) == 3
    assert e.count() == 2  # fwd + rev only


def test_access_restrictions_drop_ways(spark, tmp_path):
    """access=no|private and highway=construction ways are not
    routable (router default); respect_access=False keeps them."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.002" lat="0.0"/>
          <node id="4" lon="0.003" lat="0.0"/>
          <way id="1"><nd ref="1"/><nd ref="2"/>
            <tag k="highway" v="residential"/></way>
          <way id="2"><nd ref="2"/><nd ref="3"/>
            <tag k="highway" v="service"/><tag k="access" v="private"/></way>
          <way id="3"><nd ref="3"/><nd ref="4"/>
            <tag k="highway" v="construction"/></way>
        </osm>
        """
    )
    p = tmp_path / "acc.osm"
    p.write_text(xml)
    open_ways = {
        r["_way_id"] for r in edges_from_osm(spark, str(p)).collect()
    }
    assert open_ways == {1}
    all_ways = {
        r["_way_id"]
        for r in edges_from_osm(
            spark, str(p), respect_access=False
        ).collect()
    }
    assert all_ways == {1, 2, 3}


def test_traversal_seconds_speed_resolution(spark, tmp_path):
    """Cost profile precedence: explicit maxspeed (km/h number or
    'NN mph') wins over the class table; unparseable values ('none',
    'walk') fall through to the class; unknown classes take the
    default."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.002" lat="0.0"/>
          <node id="4" lon="0.003" lat="0.0"/>
          <node id="5" lon="0.004" lat="0.0"/>
          <node id="6" lon="0.005" lat="0.0"/>
          <way id="1"><nd ref="1"/><nd ref="2"/>
            <tag k="highway" v="primary"/></way>
          <way id="2"><nd ref="2"/><nd ref="3"/>
            <tag k="highway" v="primary"/><tag k="maxspeed" v="80"/></way>
          <way id="3"><nd ref="3"/><nd ref="4"/>
            <tag k="highway" v="primary"/><tag k="maxspeed" v="50 mph"/></way>
          <way id="4"><nd ref="4"/><nd ref="5"/>
            <tag k="highway" v="primary"/><tag k="maxspeed" v="none"/></way>
          <way id="5"><nd ref="5"/><nd ref="6"/>
            <tag k="highway" v="busway"/></way>
        </osm>
        """
    )
    p = tmp_path / "speeds.osm"
    p.write_text(xml)
    from entwiner_spark.sources.osm import edges_from_osm, traversal_seconds

    e = traversal_seconds(
        edges_from_osm(spark, str(p), tag_cols=("highway", "maxspeed")),
        default_kmh=20.0,
    )
    rows = {
        r["_way_id"]: (r["_length"], r["_traversal_sec"])
        for r in e.filter(F.col("_dir") == 0).collect()
    }
    import pytest as _pt

    def kmh(way):
        ln, sec = rows[way]
        return ln / sec * 3.6

    assert kmh(1) == _pt.approx(65.0)  # class table
    assert kmh(2) == _pt.approx(80.0)  # plain-number maxspeed
    assert kmh(3) == _pt.approx(50.0 * 1.609344)  # mph parse
    assert kmh(4) == _pt.approx(65.0)  # 'none' falls to class
    assert kmh(5) == _pt.approx(20.0)  # unknown class -> default


def test_traversal_seconds_requires_length(spark):
    from entwiner_spark.sources.osm import traversal_seconds

    df = spark.createDataFrame([("a",)], "highway string")
    with pytest.raises(ValueError, match="_length"):
        traversal_seconds(df)


def test_split_osm_xml_roundtrip(spark, tmp_path):
    """split_osm_xml shards a single big .osm at element boundaries;
    ingesting the shards must produce EXACTLY the rows of the unsplit
    file (the refs->nodes join is global, so shards need not be
    self-contained), including restriction relations."""
    import random

    rnd = random.Random(7)
    parts = []
    for k in range(40):
        lon = 10.0 + k * 0.01
        parts.append(
            f'<node id="{2 * k}" lon="{lon!r}" lat="1.0"/>'
            f'<node id="{2 * k + 1}" lon="{lon + 0.003!r}" lat="1.0"/>'
        )
        hw = rnd.choice(["residential", "primary", "service"])
        parts.append(
            f'<way id="{k}"><nd ref="{2 * k}"/><nd ref="{2 * k + 1}"/>'
            f'<tag k="highway" v="{hw}"/></way>'
        )
    parts.append(
        '<relation id="900"><tag k="type" v="restriction"/>'
        '<tag k="restriction" v="no_left_turn"/>'
        '<member type="way" role="from" ref="0"/>'
        '<member type="node" role="via" ref="1"/>'
        '<member type="way" role="to" ref="1"/></relation>'
    )
    big = tmp_path / "big.osm"
    big.write_text("<osm>\n" + "\n".join(parts) + "\n</osm>\n")
    from entwiner_spark.sources.osm import (
        osm_turn_restrictions,
        split_osm_xml,
    )

    shards = split_osm_xml(str(big), str(tmp_path / "shards"), target_bytes=600)
    assert len(shards) > 3  # actually split
    whole = edges_from_osm(spark, str(big))
    split = edges_from_osm(spark, [str(s) for s in shards])
    key = lambda r: (r["_way_id"], r["_seg"], r["_dir"])  # noqa: E731
    wrows = {key(r): (r["_u"], r["_v"], r["highway"]) for r in whole.collect()}
    srows = {key(r): (r["_u"], r["_v"], r["highway"]) for r in split.collect()}
    assert wrows == srows and len(wrows) == 80  # 40 two-way ways
    rr = osm_turn_restrictions(
        read_osm_elements(spark, [str(s) for s in shards])
    ).collect()
    assert [(r["rel_id"], r["rtype"]) for r in rr] == [(900, "no_left_turn")]
