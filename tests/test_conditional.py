"""Time-dependent metrics: OSM ``*:conditional`` tag parsing
(sources/osm.py conditional_value_at / speed_kmh_at /
traversal_seconds_at / restrictions_at / time_profiles) — the
r15-verdict task #1 surface.  Reference TODO.md:62-76 scopes cost
functions over the maneuver model; time-of-day metrics are the
standard production extension (rush-hour maxspeed clamps, time-window
turn bans)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from entwiner_spark.sources.osm import (
    banned_turn_pairs,
    conditional_value_at,
    edges_from_osm,
    osm_turn_restrictions,
    read_osm_elements,
    restrictions_at,
    speed_kmh_at,
    time_profiles,
    traversal_seconds,
    traversal_seconds_at,
)

TUE_8 = (1, 480)
SUN_8 = (6, 480)


def _vals(spark, conds, dow, minute):
    df = spark.createDataFrame([(c,) for c in conds], ["c"])
    return [
        r["v"]
        for r in df.select(
            conditional_value_at(F.col("c"), dow, minute).alias("v")
        ).collect()
    ]


def test_conditional_clause_evaluation(spark):
    conds = [
        "30 @ (Mo-Fr 07:00-09:00)",          # day+time window
        "100 @ (22:00-06:00); 80 @ (Mo-Fr 06:00-22:00)",  # multi-clause
        "none @ (Sa-Su)",                     # day-only, lift value
        "50 @ (Fr-Mo)",                       # week-wrapping day range
        "40 @ (Mo-Fr 07:00-09:00,16:00-18:00)",  # time-span list
        None,                                 # NULL passthrough
        "garbage",                            # no @-clause: no value
    ]
    assert _vals(spark, conds, *TUE_8) == [
        "30", "80", None, None, "40", None, None,
    ]
    assert _vals(spark, conds, *SUN_8) == [
        None, None, "none", "50", None, None, None,
    ]
    # midnight-wrapping span: Wed 23:30 hits 22:00-06:00
    assert _vals(spark, conds[:2], 2, 1410) == [None, "100"]
    # span end is exclusive: 09:00 is OUTSIDE 07:00-09:00
    assert _vals(spark, conds[:1], 1, 540) == [None]
    # rightmost applicable clause wins
    assert _vals(
        spark,
        ["30 @ (Mo-Fr 07:00-09:00); 20 @ (Tu 08:00-08:30)"],
        1,
        485,
    ) == ["20"]


def test_conditional_arg_validation(spark):
    with pytest.raises(ValueError, match="dow"):
        conditional_value_at(F.col("c"), 7, 0)
    with pytest.raises(ValueError, match="minute"):
        conditional_value_at(F.col("c"), 0, 1440)


def test_speed_kmh_at_precedence(spark):
    """Applicable conditional > plain maxspeed > class table; an
    INAPPLICABLE conditional falls through to maxspeed (mph parsed
    in both)."""
    df = spark.createDataFrame(
        [
            ("residential", "60", "10 @ (Mo-Fr 07:00-09:00)"),
            ("residential", "40", None),
            ("primary", None, "20 mph @ (Mo-Fr 07:00-09:00)"),
            ("primary", None, None),
        ],
        ["highway", "maxspeed", "maxspeed:conditional"],
    )
    def at(dow, minute):
        return [
            r["v"]
            for r in df.select(
                speed_kmh_at(dow, minute).alias("v")
            ).collect()
        ]

    rush = at(*TUE_8)
    assert rush[0] == pytest.approx(10.0)
    assert rush[1] == pytest.approx(40.0)
    assert rush[2] == pytest.approx(20.0 * 1.609344)
    assert rush[3] == pytest.approx(65.0)  # primary class speed
    off = at(*SUN_8)
    assert off[0] == pytest.approx(60.0)
    assert off[2] == pytest.approx(65.0)


_TR_XML = textwrap.dedent(
    """\
    <osm>
      <node id="1" lon="0.0" lat="0.001"/>
      <node id="2" lon="0.001" lat="0.001"/>
      <node id="3" lon="0.002" lat="0.001"/>
      <node id="4" lon="0.001" lat="0.002"/>
      <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/>
        <tag k="highway" v="primary"/></way>
      <way id="20"><nd ref="2"/><nd ref="4"/>
        <tag k="highway" v="residential"/></way>
      <relation id="91">
        <tag k="type" v="restriction"/>
        <tag k="restriction:conditional"
             v="no_left_turn @ (Mo-Fr 07:00-09:00)"/>
        <member type="way" role="from" ref="10"/>
        <member type="node" role="via" ref="2"/>
        <member type="way" role="to" ref="20"/>
      </relation>
    </osm>
    """
)


def test_conditional_only_restriction_resolves_per_instant(
    spark, tmp_path
):
    """A relation tagged ONLY restriction:conditional parses with
    rtype NULL; banned_turn_pairs skips it unresolved, and
    restrictions_at materializes the instant's effective set."""
    p = tmp_path / "tr.osm"
    p.write_text(_TR_XML)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    res = osm_turn_restrictions(elems)
    rows = res.collect()
    assert len(rows) == 1
    assert rows[0]["rtype"] is None
    assert rows[0]["cond_tag"] == "no_left_turn @ (Mo-Fr 07:00-09:00)"
    # unresolved: expands to nothing (no crash, no spurious ban)
    assert banned_turn_pairs(edges, res).count() == 0
    # rush instant: the left turn bans (both approaches of way 10)
    rush = restrictions_at(res, *TUE_8)
    assert [r["rtype"] for r in rush.collect()] == ["no_left_turn"]
    assert banned_turn_pairs(edges, rush).count() == 2
    # off instant: empty set
    assert restrictions_at(res, *SUN_8).count() == 0


def test_restrictions_at_none_lifts_base_ban(spark, tmp_path):
    """restriction + 'none @ (window)': the base ban is LIFTED inside
    the window and active outside it (OSM conditional semantics)."""
    xml = _TR_XML.replace(
        "no_left_turn @ (Mo-Fr 07:00-09:00)", "none @ (Sa-Su)"
    ).replace(
        '<tag k="type" v="restriction"/>',
        '<tag k="type" v="restriction"/>'
        '<tag k="restriction" v="no_left_turn"/>',
    )
    assert 'v="none @ (Sa-Su)"' in xml  # the replaces took
    p = tmp_path / "lift.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    res = osm_turn_restrictions(elems)
    assert restrictions_at(res, *SUN_8).count() == 0  # lifted
    weekday = restrictions_at(res, *TUE_8)
    assert [r["rtype"] for r in weekday.collect()] == ["no_left_turn"]


def test_time_profiles_flip_via_customize(spark, tmp_path):
    """The CCH deployment shape end-to-end: ONE customizable
    contraction order, one customize() per bucket, and the optimum
    provably flips inside the conditional window (matches a fresh
    per-bucket Dijkstra on the raw graph)."""
    from entwiner_spark.catalog import _tp_fixture_xml
    from entwiner_spark.operators.ch import ContractionHierarchy
    from entwiner_spark.operators.graph import SparkGraph
    from entwiner_spark.sources.geojson import nodes_from_edges

    p = tmp_path / "tp.osm"
    p.write_text(_tp_fixture_xml())
    edges = traversal_seconds(
        edges_from_osm(
            spark,
            str(p),
            tag_cols=("highway", "maxspeed", "maxspeed:conditional"),
        )
    ).localCheckpoint()
    g = SparkGraph(nodes_from_edges(edges), edges)
    ch = ContractionHierarchy.build(
        g, weight="_traversal_sec", customizable=True
    )
    profiles = time_profiles(
        edges, ch, {"off": SUN_8, "rush": TUE_8}
    )
    refs = {
        r["_u"]: r["_u_ref"] for r in edges.select("_u", "_u_ref").collect()
    }
    ids = {v: k for k, v in refs.items()}
    got = {}
    for name, prof in profiles.items():
        path, cost = prof.route(ids[1], ids[3])
        got[name] = ([refs[n] for n in path], cost)
    # off-peak: the 60 km/h residential pair; rush: the primary detour
    assert got["off"][0] == [1, 2, 3]
    assert got["rush"][0] == [1, 4, 3]
    # parity vs a fresh Dijkstra on the per-instant raw metric
    for name, (dow, minute) in (("off", SUN_8), ("rush", TUE_8)):
        raw = SparkGraph(
            g.nodes,
            traversal_seconds_at(edges, dow, minute, out_col="_t"),
        )
        path, cost = raw.shortest_path(ids[1], ids[3], weight="_t")
        assert [refs[n] for n in path] == got[name][0]
        assert got[name][1] == pytest.approx(cost, rel=1e-12)


def test_edge_based_time_profiles_compose_with_bans(spark, tmp_path):
    """Buckets × restrictions on the turn-aware hierarchy
    (EdgeBasedCH.time_profiles): per bucket the MINOR re-metrics via
    customize (banned maneuvers stay absent), so the rush-hour
    optimum that would flip to the primary detour is FORCED onto the
    slow conditional-clamped residential when the detour turn is
    banned — while the free build still flips."""
    from entwiner_spark.catalog import _tp_fixture_xml
    from entwiner_spark.operators.ch_edge import EdgeBasedCH
    from entwiner_spark.operators.graph import SparkGraph
    from entwiner_spark.sources.geojson import nodes_from_edges

    p = tmp_path / "tp.osm"
    p.write_text(_tp_fixture_xml())
    edges = traversal_seconds(
        edges_from_osm(
            spark,
            str(p),
            tag_cols=("highway", "maxspeed", "maxspeed:conditional"),
        )
    ).localCheckpoint()
    g = SparkGraph(nodes_from_edges(edges), edges)
    refs = {
        r["_u"]: r["_u_ref"] for r in edges.select("_u", "_u_ref").collect()
    }
    ids = {v: k for k, v in refs.items()}
    bans = spark.createDataFrame(
        [(ids[1], ids[4], ids[4], ids[3])], ["_u1", "_v1", "_u2", "_v2"]
    )
    got = {}
    for label, bt in (("free", None), ("banned", bans)):
        eb = EdgeBasedCH.build(
            g,
            weight="_traversal_sec",
            allow_uturn=False,
            banned_turns=bt,
            customizable=True,
        )
        profs = eb.time_profiles(edges, {"off": SUN_8, "rush": TUE_8})
        for nm, prof in profs.items():
            path, cost = prof.route(ids[1], ids[3])
            got[(label, nm)] = ([refs[n] for n in path], round(cost, 2))
    assert got[("free", "off")][0] == [1, 2, 3]
    assert got[("free", "rush")][0] == [1, 4, 3]  # flips to detour
    assert got[("banned", "off")][0] == [1, 2, 3]
    # the detour turn is banned: rush is FORCED onto the slow clamp
    assert got[("banned", "rush")][0] == [1, 2, 3]
    assert got[("banned", "rush")][1] > 3 * got[("banned", "off")][1]
    # requires a customizable build
    eb0 = EdgeBasedCH.build(g, weight="_traversal_sec")
    with pytest.raises(ValueError, match="customizable"):
        eb0.time_profiles(edges, {"off": SUN_8})


def test_traversal_seconds_at_requires_length(spark):
    df = spark.createDataFrame([("residential",)], ["highway"])
    with pytest.raises(ValueError, match="_length"):
        traversal_seconds_at(df, 0, 0)
