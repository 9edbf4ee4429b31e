"""Edge-based (turn-aware) contraction hierarchies
(operators/ch_edge.py): CH over the maneuver minor so restricted /
turn-penalized routing composes with the hierarchy (reference
TODO.md:62-76 — maneuver minor and CH as sibling roadmap bullets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entwiner_spark.operators.ch_edge import EdgeBasedCH
from entwiner_spark.operators.graph import SparkGraph


def _grid_graph(spark, n=5):
    """Directed n×n grid, two-way, distinct dyadic-ish weights so all
    optima are unique."""
    rows = []
    k = 0
    for i in range(n):
        for j in range(n):
            for di, dj in ((0, 1), (1, 0)):
                ii, jj = i + di, j + dj
                if ii < n and jj < n:
                    k += 1
                    w = 4.0 + 2.0 ** (-k)
                    a, b = f"{i},{j}", f"{ii},{jj}"
                    rows.append((a, b, w))
                    rows.append((b, a, w + 2.0 ** (-40 - k)))
    edges = spark.createDataFrame(rows, "_u string, _v string, w double")
    nodes = (
        edges.select(F.col("_u").alias("_n"))
        .unionByName(edges.select(F.col("_v").alias("_n")))
        .distinct()
    )
    return SparkGraph(nodes, edges, partitions=8)


@pytest.fixture(scope="module")
def grid(spark):
    return _grid_graph(spark)


def test_unrestricted_matches_node_routing(spark, grid):
    """With u-turns allowed and no turn costs, the edge-based route
    equals plain node-graph shortest_path exactly (cost and path)."""
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    for s, t in (("0,0", "4,4"), ("2,1", "0,3"), ("4,0", "1,4")):
        want = grid.shortest_path(s, t, weight="w")
        got = eb.route(s, t)
        assert got is not None
        assert got[0] == want[0]
        assert got[1] == pytest.approx(want[1], abs=1e-12)


def test_banned_turn_forces_detour(spark):
    """A banned maneuver on the unique optimum provably detours — and
    equals the linegraph-SSSP composition (the raw restricted
    oracle)."""
    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0),
            ("b", "d", 1.0),
            ("a", "c", 2.0),
            ("c", "d", 2.0),
            ("b", "c", 5.0),
        ],
        "_u string, _v string, w double",
    )
    nodes = (
        edges.select(F.col("_u").alias("_n"))
        .unionByName(edges.select(F.col("_v").alias("_n")))
        .distinct()
    )
    g = SparkGraph(nodes, edges, partitions=4)
    ban = spark.createDataFrame(
        [("a", "b", "b", "d")],
        "_u1 string, _v1 string, _u2 string, _v2 string",
    )
    free = EdgeBasedCH.build(g, weight="w")
    assert free.route("a", "d") == (["a", "b", "d"], 2.0)
    eb = EdgeBasedCH.build(g, weight="w", banned_turns=ban)
    got = eb.route("a", "d")
    # linegraph oracle: a->b then b->c->d = 1+5+2 = 8 vs a->c->d = 4
    assert got == (["a", "c", "d"], 4.0)
    # raw linegraph SSSP oracle: min over (first edge w0 + minor cost)
    minor = g.to_linegraph(weight="w", allow_uturn=False, banned_turns=ban)
    cands = []
    for s0, w0 in (("a|b", 1.0), ("a|c", 2.0)):
        for t in ("b|d", "c|d"):
            r = minor.shortest_path(s0, t, weight="w")
            if r is not None:
                cands.append(w0 + r[1])
    assert got[1] == pytest.approx(min(cands), abs=1e-12)


def test_turn_cost_penalty_flips_route(spark, grid):
    """A 90°-turn penalty makes the zig-zag optimum lose to the
    straight-then-turn route; parity against the raw penalized minor."""
    eb = EdgeBasedCH.build(
        grid,
        weight="w",
        allow_uturn=True,
        turn_cost=lambda e1, e2: F.when(
            (e1("_u") != e2("_v"))
            & (
                F.split(e1("_u"), ",")[0] != F.split(e2("_v"), ",")[0]
            )
            & (
                F.split(e1("_u"), ",")[1] != F.split(e2("_v"), ",")[1]
            ),
            F.lit(3.0),
        ).otherwise(F.lit(0.0)),
    )
    got = eb.route("0,0", "2,2")
    minor = grid.to_linegraph(
        weight="w",
        allow_uturn=True,
        turn_cost=lambda e1, e2: F.when(
            (e1("_u") != e2("_v"))
            & (
                F.split(e1("_u"), ",")[0] != F.split(e2("_v"), ",")[0]
            )
            & (
                F.split(e1("_u"), ",")[1] != F.split(e2("_v"), ",")[1]
            ),
            F.lit(3.0),
        ).otherwise(F.lit(0.0)),
    )
    w0s = {
        r["_n"]: r["w"]
        for r in minor.nodes.filter(F.col("_edge_u") == "0,0")
        .select("_n", "w")
        .collect()
    }
    tgts = [
        r["_n"]
        for r in minor.nodes.filter(F.col("_edge_v") == "2,2")
        .select("_n")
        .collect()
    ]
    best = None
    for s0, w0 in w0s.items():
        for t in tgts:
            r = minor.shortest_path(s0, t, weight="w")
            if r is not None:
                c = w0 + r[1]
                if best is None or c < best:
                    best = c
    assert got[1] == pytest.approx(best, abs=1e-12)


def test_save_load_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0),
            ("b", "d", 1.0),
            ("a", "c", 2.0),
            ("c", "d", 2.0),
            ("b", "c", 5.0),
        ],
        "_u string, _v string, w double",
    )
    nodes = (
        edges.select(F.col("_u").alias("_n"))
        .unionByName(edges.select(F.col("_v").alias("_n")))
        .distinct()
    )
    g = SparkGraph(nodes, edges, partitions=4)
    ban = spark.createDataFrame(
        [("a", "b", "b", "d")],
        "_u1 string, _v1 string, _u2 string, _v2 string",
    )
    eb = EdgeBasedCH.build(g, weight="w", banned_turns=ban)
    store = str(tmp_path / "ebch")
    eb.save(store)
    re1 = EdgeBasedCH.load(spark, store)
    assert re1.route("a", "d") == eb.route("a", "d")
    # atomic overwrite: save again over the existing store
    eb.save(store)
    re2 = EdgeBasedCH.load(spark, store)
    assert re2.route("a", "d") == (["a", "c", "d"], 4.0)


def test_distance_matrix_matches_routes(spark, grid):
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    srcs, tgts = ["0,0", "2,2"], ["4,4", "0,0"]
    mat = {
        (r["src"], r["dst"]): r["dist"]
        for r in eb.distance_matrix(srcs, tgts).collect()
    }
    for s in srcs:
        for t in tgts:
            if s == t:
                assert mat[(s, t)] == 0.0
                continue
            want = eb.route(s, t)
            assert mat[(s, t)] == pytest.approx(want[1], abs=1e-12)


def test_unreachable_and_missing_terminals(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "_u string, _v string, w double"
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("z",)], "_n string"
    )
    g = SparkGraph(nodes, edges, partitions=2)
    eb = EdgeBasedCH.build(g, weight="w")
    assert eb.route("b", "a") is None  # no out-edges from b
    assert eb.route("z", "b") is None  # isolated node
    assert eb.route("a", "a") == (["a"], 0.0)


def test_osm_restriction_composition(spark, tmp_path):
    """End-to-end OSM composition: graph_from_osm(with_restrictions)
    → EdgeBasedCH → the restricted optimum detours exactly like the
    raw linegraph route (the g_turn_restriction expectations)."""
    from entwiner_spark.catalog import _turn_fixture_xml
    from entwiner_spark.sources.osm import graph_from_osm

    p = tmp_path / "turn.osm"
    p.write_text(_turn_fixture_xml())
    nodes, edges, bans = graph_from_osm(
        spark, str(p), with_restrictions=True
    )
    g = SparkGraph(nodes, edges)
    refs = {
        (r["_u"], r["_v"]): (r["_u_ref"], r["_v_ref"])
        for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect()
    }
    node_ref = {}
    for (u, v), (ur, vr) in refs.items():
        node_ref[u], node_ref[v] = ur, vr
    src = next(u for u, r in node_ref.items() if r == 1)
    tgt = next(u for u, r in node_ref.items() if r == 4)
    free = EdgeBasedCH.build(g, weight="_length")
    restr = EdgeBasedCH.build(g, weight="_length", banned_turns=bans)
    free_refs = [node_ref[n] for n in free.route(src, tgt)[0]]
    restr_refs = [node_ref[n] for n in restr.route(src, tgt)[0]]
    assert free_refs == [1, 2, 4]  # takes the banned left
    assert restr_refs == [1, 2, 3, 5, 4]  # detours
    assert restr.route(src, tgt)[1] > free.route(src, tgt)[1]


def test_edge_based_isochrone(spark, grid):
    """Turn-aware isochrone == per-target edge-based route distances,
    budget-filtered; the source itself appears at dist 0; a banned
    maneuver shrinks the set."""
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    budget = 9.0
    iso = {
        r["_n"]: r["dist"] for r in eb.isochrone("0,0", budget).collect()
    }
    assert iso["0,0"] == 0.0
    # oracle: route to every node, keep those within budget
    want = {"0,0": 0.0}
    for r in grid.nodes.collect():
        t = r["_n"]
        if t == "0,0":
            continue
        res = eb.route("0,0", t)
        if res is not None and res[1] <= budget:
            want[t] = res[1]
    assert iso.keys() == want.keys()
    for k in want:
        assert iso[k] == pytest.approx(want[k], abs=1e-12)
    # a ban on the cheapest first maneuver shrinks or re-prices the set
    ban = spark.createDataFrame(
        [("0,0", "0,1", "0,1", "0,2"), ("0,0", "1,0", "1,0", "2,0")],
        "_u1 string, _v1 string, _u2 string, _v2 string",
    )
    eb2 = EdgeBasedCH.build(
        grid, weight="w", allow_uturn=True, banned_turns=ban
    )
    iso2 = {
        r["_n"]: r["dist"] for r in eb2.isochrone("0,0", budget).collect()
    }
    assert set(iso2) <= set(iso)
    assert all(iso2[k] >= iso[k] - 1e-12 for k in iso2)
    assert iso2 != iso


def test_osm_time_metric_restricted_composition(spark, tmp_path):
    """Full stack: OSM cost profiles (traversal seconds) + turn
    restrictions + edge-based CH — time routing through the
    contracted minor equals the raw restricted linegraph optimum on
    the time metric."""
    from entwiner_spark.catalog import _turn_fixture_xml
    from entwiner_spark.sources.osm import graph_from_osm

    p = tmp_path / "turn_t.osm"
    p.write_text(_turn_fixture_xml())
    nodes, edges, bans = graph_from_osm(
        spark,
        str(p),
        with_traversal_time=True,
        with_restrictions=True,
    )
    g = SparkGraph(nodes, edges)
    node_ref = {}
    for r in edges.select("_u", "_v", "_u_ref", "_v_ref").collect():
        node_ref[r["_u"]] = r["_u_ref"]
        node_ref[r["_v"]] = r["_v_ref"]
    src = next(n for n, rr in node_ref.items() if rr == 1)
    tgt = next(n for n, rr in node_ref.items() if rr == 4)
    eb = EdgeBasedCH.build(
        g, weight="_traversal_sec", banned_turns=bans
    )
    got = eb.route(src, tgt)
    assert [node_ref[n] for n in got[0]] == [1, 2, 3, 5, 4]  # detour
    # raw linegraph oracle on the same metric
    minor = g.to_linegraph(
        weight="_traversal_sec", allow_uturn=False, banned_turns=bans
    )
    w0s = {
        r["_n"]: r["_traversal_sec"]
        for r in minor.nodes.filter(F.col("_edge_u") == src)
        .select("_n", "_traversal_sec")
        .collect()
    }
    tgts = [
        r["_n"]
        for r in minor.nodes.filter(F.col("_edge_v") == tgt)
        .select("_n")
        .collect()
    ]
    best = None
    for s0, w0 in w0s.items():
        for t in tgts:
            r = minor.shortest_path(s0, t, weight="w")
            if r is not None:
                c = w0 + r[1]
                if best is None or c < best:
                    best = c
    assert got[1] == pytest.approx(best, rel=1e-12)


def test_edge_based_alternatives_match_replay(spark, grid):
    """Turn-aware penalty alternatives == an independent penalty-
    Dijkstra replay over the maneuver minor (penalized arcs +
    penalized first-edge offsets, same tie-breaks): node paths and
    original-metric costs, with a banned maneuver in force."""
    import heapq

    ban = spark.createDataFrame(
        [("0,0", "1,0", "1,0", "2,0")],
        "_u1 string, _v1 string, _u2 string, _v2 string",
    )
    eb = EdgeBasedCH.build(
        grid,
        weight="w",
        allow_uturn=True,
        banned_turns=ban,
        customizable=True,
    )
    got = eb.alternatives("0,0", "3,3", k=3, penalty=2.0)

    minor = grid.to_linegraph(weight="w", allow_uturn=True, banned_turns=ban)
    arcs = {
        (r["_u"], r["_v"]): r["w"]
        for r in minor.edges.select("_u", "_v", "w").collect()
    }
    terms = {
        r["_n"]: (r["_edge_u"], r["_edge_v"], r["w"])
        for r in minor.nodes.select("_n", "_edge_u", "_edge_v", "w").collect()
    }
    srcs = {n: w for n, (u, _v, w) in terms.items() if u == "0,0"}
    tgts = {n for n, (_u, v, _w) in terms.items() if v == "3,3"}
    adj = {}
    for (a, b) in arcs:
        adj.setdefault(a, []).append(b)

    pen_arcs, pen_first = {}, {}
    want, seen = [], set()
    for _ in range(12):
        best = None
        for s0 in srcs:
            dist = {s0: 0.0}
            pred = {s0: None}
            pq = [(0.0, s0)]
            while pq:
                d, a = heapq.heappop(pq)
                if d > dist.get(a, float("inf")):
                    continue
                for b in adj.get(a, ()):
                    nd = d + arcs[(a, b)] * (
                        2.0 ** pen_arcs.get((a, b), 0)
                    )
                    if nd < dist.get(b, float("inf")):
                        dist[b], pred[b] = nd, a
                        heapq.heappush(pq, (nd, b))
            for t in tgts:
                if t not in dist:
                    continue
                c = srcs[s0] * (2.0 ** pen_first.get(s0, 0)) + dist[t]
                key = (c, str(s0), str(t))
                if best is None or key < best[0]:
                    mp, cur = [], t
                    while cur is not None:
                        mp.append(cur)
                        cur = pred[cur]
                    best = (key, mp[::-1])
        if best is None:
            break
        mpath = best[1]
        node_path = [terms[mpath[0]][0]] + [terms[m][1] for m in mpath]
        if tuple(node_path) not in seen:
            seen.add(tuple(node_path))
            want.append(
                (
                    node_path,
                    srcs[mpath[0]]
                    + sum(arcs[p] for p in zip(mpath, mpath[1:])),
                )
            )
            if len(want) >= 3:
                break
        pen_first[mpath[0]] = pen_first.get(mpath[0], 0) + 1
        for p in zip(mpath, mpath[1:]):
            pen_arcs[p] = pen_arcs.get(p, 0) + 1

    assert len(got) == len(want) == 3
    for (gp, gc), (wp, wc) in zip(got, want):
        assert gp == wp
        assert gc == pytest.approx(wc, rel=1e-12)
    # the first alternative is the true restricted optimum
    assert got[0][0] == eb.route("0,0", "3,3")[0]
    # banned maneuver absent from every alternative
    for p, _c in got:
        assert ("0,0", "1,0", "2,0") not in set(zip(p, p[1:], p[2:]))


def test_edge_based_alternatives_requires_customizable(spark, grid):
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    with pytest.raises(ValueError, match="customizable"):
        eb.alternatives("0,0", "3,3")


def test_edge_based_staleness_guard(spark, tmp_path, grid):
    """load(graph=) on the edge-based store refuses a mutated BASE
    graph — the ContractionHierarchy fingerprint guard lifted to the
    minor artifact."""
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    store = str(tmp_path / "ebch_fresh")
    eb.save(store)
    re1 = EdgeBasedCH.load(spark, store, graph=grid, weight="w")
    assert re1.base_fingerprint == eb.base_fingerprint
    mutated = SparkGraph(
        grid.nodes,
        grid.edges.withColumn(
            "w",
            F.when(
                (F.col("_u") == "0,0") & (F.col("_v") == "1,0"),
                F.col("w") + 7.0,
            ).otherwise(F.col("w")),
        ),
        partitions=8,
    )
    with pytest.raises(RuntimeError, match="stale"):
        EdgeBasedCH.load(spark, store, graph=mutated, weight="w")
    re1.base_fingerprint = None
    with pytest.raises(ValueError, match="no base-graph fingerprint"):
        re1.check_fresh(grid, "w")


def test_edge_based_route_matrix_matches_per_pair(spark, grid):
    """route_matrix == per-pair route() (cost AND path) for every
    reachable pair, trivial diagonal rows included; one batched
    hierarchy query serves the whole matrix."""
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    srcs = ["0,0", "2,2", "4,0"]
    tgts = ["4,4", "0,3", "2,2"]
    got = {
        (r["src"], r["dst"]): (list(r["path"]), r["dist"])
        for r in eb.route_matrix(srcs, tgts).collect()
    }
    assert set(got) == {(s, t) for s in srcs for t in tgts}
    for s in srcs:
        for t in tgts:
            want = eb.route(s, t)
            assert got[(s, t)][0] == want[0]
            assert got[(s, t)][1] == pytest.approx(want[1], abs=1e-12)
    assert got[("2,2", "2,2")] == (["2,2"], 0.0)
    with pytest.raises(ValueError, match="non-empty"):
        eb.route_matrix([], tgts)


def test_edge_based_turn_config_staleness(spark, tmp_path, grid):
    """r15 ADVICE: the base fingerprint covers only the edge table —
    the TURN configuration (banned pairs, allow_uturn, turn_cost)
    fingerprints separately, and check_fresh verifies it when the
    caller re-states any turn kwarg."""
    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    store = str(tmp_path / "ebch_turncfg")
    eb.save(store)
    re1 = EdgeBasedCH.load(spark, store, graph=grid, weight="w")
    assert re1.turn_fingerprint == eb.turn_fingerprint
    # re-stating the build config verifies clean
    re1.check_fresh(grid, "w", allow_uturn=True)
    # a flipped allow_uturn is a different minor — stale
    with pytest.raises(RuntimeError, match="turn config"):
        re1.check_fresh(grid, "w", allow_uturn=False)
    # a restriction set the build never saw — stale
    bans = spark.createDataFrame(
        [("0,0", "1,0", "1,0", "2,0")], ["_u1", "_v1", "_u2", "_v2"]
    )
    with pytest.raises(RuntimeError, match="turn config"):
        re1.check_fresh(grid, "w", banned_turns=bans, allow_uturn=True)
    # no turn kwargs → only the base edge table is checked (no claim)
    re1.check_fresh(grid, "w")
    # pre-r16 artifacts degrade loudly when a turn claim IS made
    re1.turn_fingerprint = None
    with pytest.raises(ValueError, match="no turn fingerprint"):
        re1.check_fresh(grid, "w", allow_uturn=True)


def test_edge_based_load_old_fallback(spark, tmp_path, grid):
    """Crash-window recovery mirrors the node-CH store: artifact only
    at <store>.old still loads."""
    import os

    eb = EdgeBasedCH.build(grid, weight="w", allow_uturn=True)
    store = str(tmp_path / "ebch_crash")
    eb.save(store)
    os.rename(store, store + ".old")
    re1 = EdgeBasedCH.load(spark, store, graph=grid, weight="w")
    assert re1.base_fingerprint == eb.base_fingerprint
    with pytest.raises(FileNotFoundError):
        EdgeBasedCH.load(spark, str(tmp_path / "nope"))
