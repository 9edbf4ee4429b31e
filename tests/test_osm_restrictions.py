"""OSM turn restrictions (sources/osm.py relation parse +
banned_turn_pairs; consumed by SparkGraph.to_linegraph(banned_turns=)
— reference TODO.md:62-70's maneuver model: a banned maneuver is one
the minor graph does not contain)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from entwiner_spark.operators.graph import SparkGraph
from entwiner_spark.sources.geojson import nodes_from_edges
from entwiner_spark.sources.osm import (
    banned_turn_pairs,
    edges_from_osm,
    osm_turn_restrictions,
    read_osm_elements,
)

_T_XML = textwrap.dedent(
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
      <relation id="99">
        <tag k="type" v="restriction"/>
        <tag k="restriction" v="no_left_turn"/>
        <member type="way" role="from" ref="10"/>
        <member type="node" role="via" ref="2"/>
        <member type="way" role="to" ref="20"/>
      </relation>
    </osm>
    """
)


@pytest.fixture(scope="module")
def t_graph(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("osmres") / "t.osm"
    p.write_text(_T_XML)
    elems = read_osm_elements(spark, str(p)).localCheckpoint()
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    return elems, edges


def _ref_pairs(edges, bans):
    """Banned pairs mapped back to OSM node refs for assertions."""
    refs = {
        (r["_u"], r["_v"]): (r["_u_ref"], r["_v_ref"])
        for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect()
    }
    return {
        (refs[(r["_u1"], r["_v1"])], refs[(r["_u2"], r["_v2"])])
        for r in bans.collect()
    }


def test_restriction_relation_parses(t_graph):
    elems, _edges = t_graph
    rows = osm_turn_restrictions(elems).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["rel_id"], r["rtype"]) == (99, "no_left_turn")
    assert (r["from_way"], r["via_node"], r["to_way"]) == (10, 2, 20)


def test_no_restriction_bans_both_approaches(t_graph):
    """no_*: every approach of the from way onto the to way at via —
    the two-way from road reaches the junction from both ends."""
    elems, edges = t_graph
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    assert _ref_pairs(edges, bans) == {
        ((1, 2), (2, 4)),
        ((3, 2), (2, 4)),
    }


def test_only_restriction_bans_complement(spark, tmp_path):
    """only_*: every departure NOT on the to way is banned (including
    continuing on the from way)."""
    xml = _T_XML.replace("no_left_turn", "only_left_turn")
    p = tmp_path / "only.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    got = _ref_pairs(edges, bans)
    # approaches (1->2) and (3->2); banned departures: (2->3)/(2->1)
    # (way 10) — the turn onto way 20 (2->4) stays open
    assert got == {
        ((1, 2), (2, 3)),
        ((1, 2), (2, 1)),
        ((3, 2), (2, 3)),
        ((3, 2), (2, 1)),
    }


def test_no_u_turn_drops_reversal_pair(spark, tmp_path):
    """no_u_turn from=to: the reversal maneuver disappears from the
    minor even with allow_uturn=True."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.001"/>
          <node id="2" lon="0.001" lat="0.001"/>
          <node id="3" lon="0.002" lat="0.001"/>
          <node id="4" lon="0.002" lat="0.002"/>
          <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/>
            <tag k="highway" v="primary"/></way>
          <way id="20"><nd ref="3"/><nd ref="4"/>
            <tag k="highway" v="residential"/></way>
          <relation id="77">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_u_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="node" role="via" ref="3"/>
            <member type="way" role="to" ref="10"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "uturn.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    # node 2 is interior (no junction), so way 10 is ONE segment 1..3;
    # the banned reversal is that segment's about-face at via node 3
    assert _ref_pairs(edges, bans) == {((1, 3), (3, 1))}
    g = SparkGraph(nodes_from_edges(edges), edges)
    free = g.to_linegraph(weight="_length", allow_uturn=True)
    restricted = g.to_linegraph(
        weight="_length", allow_uturn=True, banned_turns=bans
    )
    assert restricted.size() == free.size() - bans.count()


def test_malformed_and_multi_via_relations_skipped(spark, tmp_path):
    """Multi-via chains, missing-member, and non-restriction relations
    parse to nothing; a single via-WAY relation parses with via_way
    set (r15 scope extension)."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <relation id="1">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_left_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="way" role="via" ref="15"/>
            <member type="way" role="to" ref="20"/>
          </relation>
          <relation id="2">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_right_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="node" role="via" ref="2"/>
          </relation>
          <relation id="3">
            <tag k="type" v="multipolygon"/>
            <member type="way" role="outer" ref="10"/>
          </relation>
          <relation id="4">
            <tag k="type" v="restriction"/>
            <member type="way" role="from" ref="10"/>
            <member type="node" role="via" ref="2"/>
            <member type="way" role="to" ref="20"/>
          </relation>
          <relation id="5">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_u_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="way" role="via" ref="15"/>
            <member type="way" role="via" ref="16"/>
            <member type="way" role="to" ref="20"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "bad.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    rows = osm_turn_restrictions(elems).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["rel_id"], r["via_way"], r["via_node"]) == (1, 15, None)


def test_restricted_route_detours(spark, tmp_path):
    """End-to-end flip: the unrestricted optimum takes the banned left;
    the restricted minor's best route provably detours (longer cost,
    different node sequence) — the catalog gate's semantics, pinned
    against closed-form expectations here."""
    from entwiner_spark.catalog import _turn_fixture_xml

    p = tmp_path / "turn.osm"
    p.write_text(_turn_fixture_xml())
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    g = SparkGraph(nodes_from_edges(edges), edges)
    refs = {
        (r["_u"], r["_v"]): (r["_u_ref"], r["_v_ref"])
        for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect()
    }
    src_uv = next(k for k, rr in refs.items() if rr == (1, 2))
    src = f"{src_uv[0]}|{src_uv[1]}"
    tgts = [f"{u}|{v}" for (u, v), rr in refs.items() if rr[1] == 4]

    def best(minor):
        res = None
        for t in tgts:
            r = minor.shortest_path(src, t, weight="w")
            if r is not None and (res is None or r[1] < res[1]):
                res = r
        return res

    free = best(g.to_linegraph(weight="_length", allow_uturn=False))
    restr = best(
        g.to_linegraph(
            weight="_length", allow_uturn=False, banned_turns=bans
        )
    )
    free_refs = [refs[tuple(m.split("|"))] for m in free[0]]
    restr_refs = [refs[tuple(m.split("|"))] for m in restr[0]]
    assert free_refs == [(1, 2), (2, 4)]  # the banned left
    assert restr_refs == [(1, 2), (2, 3), (3, 5), (5, 4)]  # detour
    assert restr[1] > free[1]


def test_graph_from_osm_composes_time_and_restrictions(spark, tmp_path):
    """One-call composition: with_traversal_time adds _traversal_sec
    (maxspeed auto-requested) and with_restrictions returns the banned
    pairs — the full time-routable, restriction-aware pipeline."""
    from entwiner_spark.catalog import _turn_fixture_xml
    from entwiner_spark.sources.osm import graph_from_osm

    p = tmp_path / "g.osm"
    p.write_text(_turn_fixture_xml())
    nodes, edges, bans = graph_from_osm(
        spark,
        str(p),
        with_traversal_time=True,
        with_restrictions=True,
    )
    assert "_traversal_sec" in edges.columns
    assert "maxspeed" in edges.columns
    assert bans.count() == 2  # both approaches of way 100 onto 200
    assert nodes.count() == 5
    r = edges.filter(
        (F.col("_way_id") == 100) & (F.col("_dir") == 0)
    ).collect()[0]
    # primary class: 65 km/h
    assert r["_length"] / r["_traversal_sec"] * 3.6 == pytest.approx(65.0)


def test_no_u_turn_interior_junction_keeps_straight(spark, tmp_path):
    """r14-ADVICE over-ban fix: no_u_turn with from == to at an
    INTERIOR junction of the way bans only the reversal of each
    approach — continuing straight through the junction on the same
    way stays open (way-granularity matching would have banned it)."""
    xml = textwrap.dedent(
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
          <relation id="88">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_u_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="node" role="via" ref="2"/>
            <member type="way" role="to" ref="10"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "uturn_mid.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    # node 2 IS a junction (ways 10 and 20 share it): segments
    # 1-2 / 2-3 / 2-4 each two-way.  Banned: ONLY the two reversals
    # at node 2 — (1,2)->(2,1) and (3,2)->(2,3).  Straight-through
    # (1,2)->(2,3) / (3,2)->(2,1) and the side turn (…)->(2,4) open.
    assert _ref_pairs(edges, bans) == {
        ((1, 2), (2, 1)),
        ((3, 2), (2, 3)),
    }


def test_cross_way_no_u_turn_bans_to_way_departure(spark, tmp_path):
    """r15-ADVICE regression fix: no_u_turn with from_way != to_way
    (the dual-carriageway/merge form — approach and departure on
    DIFFERENT carriageways) keeps the way-granularity ban of all
    to-way departures at the via node.  The reversal pin
    (_vref2 == _uref1) can never match across carriageways, so
    applying it here expanded the restriction to ZERO pairs."""
    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.001"/>
          <node id="2" lon="0.001" lat="0.001"/>
          <node id="5" lon="0.0" lat="0.0"/>
          <way id="30"><nd ref="1"/><nd ref="2"/>
            <tag k="highway" v="primary"/>
            <tag k="oneway" v="yes"/></way>
          <way id="40"><nd ref="2"/><nd ref="5"/>
            <tag k="highway" v="primary"/>
            <tag k="oneway" v="yes"/></way>
          <relation id="66">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_u_turn"/>
            <member type="way" role="from" ref="30"/>
            <member type="node" role="via" ref="2"/>
            <member type="way" role="to" ref="40"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "dualcarr.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    # one approach (1->2 on way 30), one to-way departure (2->5 on
    # way 40) — exactly that pair is banned (the u-turn onto the
    # opposite carriageway)
    assert _ref_pairs(edges, bans) == {((1, 2), (2, 5))}


def test_same_way_no_left_turn_is_reversal_scoped(spark, tmp_path):
    """Any no_* with from_way == to_way (not just no_u_turn) matches
    the reversal, not every same-way departure."""
    xml = textwrap.dedent(
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
          <relation id="89">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="no_left_turn"/>
            <member type="way" role="from" ref="10"/>
            <member type="node" role="via" ref="2"/>
            <member type="way" role="to" ref="10"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "sameway.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    bans = banned_turn_pairs(edges, osm_turn_restrictions(elems))
    assert _ref_pairs(edges, bans) == {
        ((1, 2), (2, 1)),
        ((3, 2), (2, 3)),
    }


_VIA_WAY_XML = textwrap.dedent(
    """\
    <osm>
      <node id="1" lon="0.0" lat="0.001"/>
      <node id="2" lon="0.001" lat="0.001"/>
      <node id="3" lon="0.001" lat="0.002"/>
      <node id="4" lon="0.002" lat="0.002"/>
      <node id="6" lon="0.0" lat="0.002"/>
      <way id="100"><nd ref="1"/><nd ref="2"/>
        <tag k="highway" v="primary"/></way>
      <way id="150"><nd ref="2"/><nd ref="3"/>
        <tag k="highway" v="primary_link"/></way>
      <way id="200"><nd ref="3"/><nd ref="4"/>
        <tag k="highway" v="primary"/></way>
      <way id="300"><nd ref="6"/><nd ref="3"/>
        <tag k="highway" v="residential"/></way>
      <relation id="42">
        <tag k="type" v="restriction"/>
        <tag k="restriction" v="no_left_turn"/>
        <member type="way" role="from" ref="100"/>
        <member type="way" role="via" ref="150"/>
        <member type="way" role="to" ref="200"/>
      </relation>
    </osm>
    """
)


def test_via_way_restriction_bans_exit_pair(spark, tmp_path):
    """r14-verdict task #7: a via-WAY relation expands to the banned
    EXIT pair — the via chain's last edge onto every to-way departure
    at the via∩to junction (exact for the canonical connector; the
    documented conservative pair approximation otherwise)."""
    p = tmp_path / "viaway.osm"
    p.write_text(_VIA_WAY_XML)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    restr = osm_turn_restrictions(elems)
    assert restr.collect()[0]["via_way"] == 150
    bans = banned_turn_pairs(edges, restr)
    # chain: A = from∩via = 2, B = via∩to = 3; last via edge (2,3);
    # the one to-way departure at 3 is (3,4) — nothing else banned
    # (way 300's exit at 3, the via entry (1,2)->(2,3), and the
    # reverse directions all stay open)
    assert _ref_pairs(edges, bans) == {((2, 3), (3, 4))}
    # the maneuver really disappears from the minor
    g = SparkGraph(nodes_from_edges(edges), edges)
    free = g.to_linegraph(weight="_length", allow_uturn=True)
    restricted = g.to_linegraph(
        weight="_length", allow_uturn=True, banned_turns=bans
    )
    assert restricted.size() == free.size() - 1


def test_via_way_only_and_unresolvable_skipped(spark, tmp_path):
    """only_* via-way rows and chains whose junctions cannot be
    resolved produce no pairs (documented scope)."""
    xml = _VIA_WAY_XML.replace("no_left_turn", "only_straight_on")
    p = tmp_path / "viaway_only.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    assert banned_turn_pairs(edges, osm_turn_restrictions(elems)).count() == 0
    # unresolvable: via way disjoint from the to way (no B junction)
    xml2 = _VIA_WAY_XML.replace(
        '<way id="200"><nd ref="3"/><nd ref="4"/>',
        '<way id="200"><nd ref="6"/><nd ref="4"/>',
    )
    p2 = tmp_path / "viaway_bad.osm"
    p2.write_text(xml2)
    elems2 = read_osm_elements(spark, str(p2))
    edges2 = edges_from_osm(spark, str(p2), elems=elems2).localCheckpoint()
    assert (
        banned_turn_pairs(edges2, osm_turn_restrictions(elems2)).count()
        == 0
    )


_MULTI_ENTRY_XML = textwrap.dedent(
    """\
    <osm>
      <node id="1" lon="0.0" lat="0.0"/>
      <node id="2" lon="0.001" lat="0.0"/>
      <node id="3" lon="0.002" lat="0.0"/>
      <node id="4" lon="0.003" lat="0.0"/>
      <node id="5" lon="0.004" lat="0.0"/>
      <node id="6" lon="0.002" lat="0.001"/>
      <node id="7" lon="0.002" lat="-0.002"/>
      <way id="10"><nd ref="1"/><nd ref="2"/>
        <tag k="highway" v="primary"/></way>
      <way id="20"><nd ref="2"/><nd ref="3"/><nd ref="4"/>
        <tag k="highway" v="primary"/><tag k="oneway" v="yes"/></way>
      <way id="30"><nd ref="4"/><nd ref="5"/>
        <tag k="highway" v="primary"/></way>
      <way id="40"><nd ref="6"/><nd ref="3"/>
        <tag k="highway" v="residential"/>
        <tag k="oneway" v="yes"/></way>
      <way id="50"><nd ref="2"/><nd ref="7"/><nd ref="5"/>
        <tag k="highway" v="residential"/></way>
      <relation id="900">
        <tag k="type" v="restriction"/>
        <tag k="restriction" v="no_straight_on"/>
        <member type="way" role="from" ref="10"/>
        <member type="way" role="via" ref="20"/>
        <member type="way" role="to" ref="30"/>
      </relation>
    </osm>
    """
)
# topology: X(1)-A(2) from way; via way A(2)->M(3)->B(4) oneway with a
# junction at M; to way B(4)-Y(5); OTHER ENTRANCE C(6)->M oneway;
# detour A(2)->7->Y(5).  The restriction bans the SEQUENCE
# X->A->M->B->Y; C->M->B->Y is legal (multi-entry).


def _minor_route(minor, edges, src_ref_pair, tgt_ref):
    refs = {
        (r["_u"], r["_v"]): (r["_u_ref"], r["_v_ref"])
        for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect()
    }
    src_uv = next(k for k, rr in refs.items() if rr == src_ref_pair)
    src = f"{src_uv[0]}|{src_uv[1]}"
    tgts = [f"{u}|{v}" for (u, v), rr in refs.items() if rr[1] == tgt_ref]
    best = None
    for t in tgts:
        r = minor.shortest_path(src, t, weight="w")
        if r is not None and (best is None or r[1] < best[1]):
            best = r
    if best is None:
        return None
    # shadow minor ids carry a |r<rel> suffix — strip for decode
    out = []
    for m in best[0]:
        u, v = m.split("|")[:2]
        out.append(refs[(u, v)])
    return [out[0][0]] + [p[1] for p in out], best[1]


def test_via_way_splits_exact_vs_exit_pair(spark, tmp_path):
    """r15-verdict task #2: on a MULTI-ENTRY via way the exit-pair
    expansion is provably conservative — it bans the other entrance's
    legal exit — while via_way_splits + to_linegraph(via_splits=)
    is exact: the restricted sequence is gone, the other entrance
    keeps its route."""
    from entwiner_spark.sources.osm import via_way_splits

    p = tmp_path / "multi.osm"
    p.write_text(_MULTI_ENTRY_XML)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    res = osm_turn_restrictions(elems)
    g = SparkGraph(nodes_from_edges(edges), edges)

    splits = via_way_splits(edges, res)
    srows = splits.collect()
    by_kind = {}
    for r in srows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert len(by_kind["via"]) == 2  # chain A->M->B split at M
    assert len(by_kind["from"]) == 1  # one approach (1->2)
    assert len(by_kind["to"]) == 1  # one exit (4->5)

    # conservative mode: the exit pair bans C's legal route too
    cons = banned_turn_pairs(edges, res)  # via_way="exit_pair" default
    minor_cons = g.to_linegraph(
        weight="_length", allow_uturn=False, banned_turns=cons
    )
    got = _minor_route(minor_cons, edges, (6, 3), 5)
    assert got is None or got[0] != [6, 3, 4, 5]  # over-ban, proven

    # exact mode: splits + skip
    bans = banned_turn_pairs(edges, res, via_way="skip")
    assert bans.count() == 0  # the fixture has ONLY the via-way rel
    minor = g.to_linegraph(
        weight="_length",
        allow_uturn=False,
        banned_turns=bans,
        via_splits=splits,
    )
    # the other entrance's route is legal and direct
    assert _minor_route(minor, edges, (6, 3), 5)[0] == [6, 3, 4, 5]
    # the restricted sequence is gone: X-traffic detours via 7
    path, cost = _minor_route(minor, edges, (1, 2), 5)
    assert path == [1, 2, 5]  # way 50's single junction-split edge
    # and the unrestricted minor (no splits) prefers the via way,
    # proving the detour is restriction-forced, not metric-forced
    free = g.to_linegraph(weight="_length", allow_uturn=False)
    fpath, fcost = _minor_route(free, edges, (1, 2), 5)
    assert fpath == [1, 2, 3, 4, 5]
    assert cost > fcost

    # and the split composes with the contracted hierarchy: the
    # shadow minor nodes contract like any other
    from entwiner_spark.operators.ch_edge import EdgeBasedCH

    node_ref = {}
    for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect():
        node_ref[r["_u"]] = r["_u_ref"]
        node_ref[r["_v"]] = r["_v_ref"]
    ids = {rr: n for n, rr in node_ref.items()}
    eb = EdgeBasedCH.build(
        g, weight="_length", banned_turns=bans, via_splits=splits
    )
    lens = {
        (node_ref[r["_u"]], node_ref[r["_v"]]): r["_length"]
        for r in edges.select("_u", "_v", "_length").collect()
    }
    p1, c1 = eb.route(ids[1], ids[5])
    assert [node_ref[n] for n in p1] == [1, 2, 5]
    assert c1 == pytest.approx(lens[(1, 2)] + lens[(2, 5)], rel=1e-12)
    p6, _c6 = eb.route(ids[6], ids[5])
    assert [node_ref[n] for n in p6] == [6, 3, 4, 5]


def test_only_via_way_split_forces_through_route(spark, tmp_path):
    """r16: only_* via-WAY relations are expressible via edge
    splitting (the pair approximation never could): the from-way
    approach's only continuation is the shadow chain and the chain
    end permits only the to-way exit — so the banned-approach route
    provably takes the LONG via way; the via junction's other
    entrance keeps the short direct road."""
    from entwiner_spark.sources.osm import via_way_splits

    xml = textwrap.dedent(
        """\
        <osm>
          <node id="1" lon="0.0" lat="0.0"/>
          <node id="2" lon="0.001" lat="0.0"/>
          <node id="3" lon="0.001" lat="0.003"/>
          <node id="4" lon="0.002" lat="0.0"/>
          <node id="6" lon="0.001" lat="-0.001"/>
          <way id="10"><nd ref="1"/><nd ref="2"/>
            <tag k="highway" v="primary"/></way>
          <way id="20"><nd ref="2"/><nd ref="3"/>
            <tag k="highway" v="primary"/>
            <tag k="oneway" v="yes"/></way>
          <way id="30"><nd ref="3"/><nd ref="4"/>
            <tag k="highway" v="primary"/></way>
          <way id="50"><nd ref="2"/><nd ref="4"/>
            <tag k="highway" v="residential"/></way>
          <way id="40"><nd ref="6"/><nd ref="2"/>
            <tag k="highway" v="residential"/>
            <tag k="oneway" v="yes"/></way>
          <relation id="901">
            <tag k="type" v="restriction"/>
            <tag k="restriction" v="only_straight_on"/>
            <member type="way" role="from" ref="10"/>
            <member type="way" role="via" ref="20"/>
            <member type="way" role="to" ref="30"/>
          </relation>
        </osm>
        """
    )
    p = tmp_path / "only_vw.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    res = osm_turn_restrictions(elems)
    g = SparkGraph(nodes_from_edges(edges), edges)

    splits = via_way_splits(edges, res)
    assert {r["only"] for r in splits.collect()} == {True}
    # the exit-pair path skips only_ via-way rels entirely
    assert banned_turn_pairs(edges, res).count() == 0

    free = g.to_linegraph(weight="_length", allow_uturn=False)
    fpath, fcost = _minor_route(free, edges, (1, 2), 4)
    assert fpath == [1, 2, 4]  # the short direct road

    minor = g.to_linegraph(
        weight="_length", allow_uturn=False, via_splits=splits
    )
    path, cost = _minor_route(minor, edges, (1, 2), 4)
    assert path == [1, 2, 3, 4]  # forced through the long via way
    assert cost > fcost
    # the via junction's OTHER entrance keeps the direct road
    assert _minor_route(minor, edges, (6, 2), 4)[0] == [6, 2, 4]


def test_except_tag_profile_filtering(spark, tmp_path):
    """except=: a restriction listing the routed profile does not
    apply to it — banned_turn_pairs(profile=) drops it before
    expansion; other profiles (and the conservative None default)
    keep it."""
    xml = _T_XML.replace(
        '<tag k="restriction" v="no_left_turn"/>',
        '<tag k="restriction" v="no_left_turn"/>\n'
        '    <tag k="except" v="bicycle;psv"/>',
    )
    p = tmp_path / "except.osm"
    p.write_text(xml)
    elems = read_osm_elements(spark, str(p))
    edges = edges_from_osm(spark, str(p), elems=elems).localCheckpoint()
    restr = osm_turn_restrictions(elems)
    assert restr.collect()[0]["except_tag"] == "bicycle;psv"
    # exempted profiles: no bans
    assert banned_turn_pairs(edges, restr, profile="bicycle").count() == 0
    assert banned_turn_pairs(edges, restr, profile="psv").count() == 0
    # non-exempted profile and the conservative default: banned
    assert (
        banned_turn_pairs(edges, restr, profile="motorcar").count() == 2
    )
    assert banned_turn_pairs(edges, restr).count() == 2
