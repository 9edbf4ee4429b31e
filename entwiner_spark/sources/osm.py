"""OpenStreetMap XML ingest (reference TODO.md:29 — the reference
scopes itself as consuming "GeoJSON, OpenStreetMap, GTFS"; OSM is the
one named input format it never built, and the format street networks
actually come from).

OSM's model differs from every other source here: a ``way`` stores node
REFERENCES, not coordinates, so geometry needs a refs→nodes join; and
way endpoints are NOT junctions — a street keeps one way id across
many intersections — so building a routable graph means splitting ways
at junction nodes (nodes referenced more than once).  Both steps are
expressed as DataFrame ops:

* **parse** — one executor task per ``.osm`` file (XML is not
  splittable), stdlib ``xml.etree.iterparse`` INSIDE the task via
  ``mapInPandas`` streaming Arrow batches: the
  ``edges_from_ogr_distributed`` pattern (sources/ogr.py:19), no
  driver materialization, bounded memory per task (elements are
  cleared as soon as they complete).
* **geometry join** — way members ⋈ node coordinates on the node id:
  the scale hinge.  A hash-partitioned equi-join on an 8-byte long —
  both sides shuffle once; at planet scale this is the canonical
  "assemble geometries" shuffle every OSM pipeline pays exactly once.
* **junction split** — usage counts (one groupBy on ref) mark junction
  nodes; a per-way running sum of cut flags assigns each member row
  its segment id(s); one groupBy((way, seg)) assembles ordered
  coordinate arrays.  All windows partition by ``way_id`` — the OSM
  spec caps ways at 2,000 nodes, so no window ever sees an unbounded
  partition.
* **oneway** — ``oneway=yes|1|true`` emits forward only,
  ``oneway=-1|reverse`` emits the flipped direction only, everything
  else emits the fwd+rev pair (the U1 union the GeoJSON ingest uses).

PBF is environment-closed (no protobuf codec in this container) — the
probe lives in COVERAGE.md; the XML path has no dependency beyond the
stdlib.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entwiner_spark.functions.geo import bbox_columns, linestring_length_m
from entwiner_spark.functions.ids import node_id, node_id_from_coord
from entwiner_spark.schemas import DEFAULT_PRECISION

#: One union schema for both element kinds so a single parse pass per
#: file feeds both the node and the way-member branch.
_ELEM_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'node' | 'member'
        T.StructField("osm_id", T.LongType()),  # node id (kind=node)
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("way_id", T.LongType()),  # kind=member: the way;
        # kind=restriction: the FROM way
        T.StructField("seq", T.IntegerType()),  # member position in way
        T.StructField("ref", T.LongType()),  # kind=member: referenced
        # node id; kind=restriction: the VIA node
        T.StructField("to_way", T.LongType()),  # kind=restriction only
        T.StructField("via_way", T.LongType()),  # kind=restriction with
        # a via WAY member (ref is then NULL)
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)
_ELEM_COLS = [f.name for f in _ELEM_SCHEMA.fields]

#: Arrow batch size for the streaming parser.
_BATCH_ROWS = 65_536

#: oneway tag values meaning "forward direction only" / "reversed".
ONEWAY_FWD = ("yes", "1", "true")
ONEWAY_REV = ("-1", "reverse")

#: access tag values that exclude a way from the routable network
#: (OSM wiki access=*: legal-access restriction; construction/proposed
#: highways are not traversable yet either).
ACCESS_DENIED = ("no", "private")
HIGHWAY_NOT_BUILT = ("construction", "proposed")

#: Default free-flow speed per highway class, km/h — the standard
#: car-profile defaults every public OSM router ships (OSRM/Valhalla
#: ballpark); override per deployment via ``traversal_seconds(speeds=)``.
DEFAULT_SPEEDS_KMH = {
    "motorway": 110.0,
    "motorway_link": 45.0,
    "trunk": 90.0,
    "trunk_link": 40.0,
    "primary": 65.0,
    "primary_link": 30.0,
    "secondary": 55.0,
    "secondary_link": 25.0,
    "tertiary": 40.0,
    "tertiary_link": 20.0,
    "unclassified": 25.0,
    "residential": 30.0,
    "living_street": 10.0,
    "service": 15.0,
}

#: miles → km (exact, international mile).
_MPH_TO_KMH = 1.609344


def _local_name(tag: str) -> str:
    """Strip an XML namespace prefix ('{uri}node' -> 'node')."""
    return tag.rsplit("}", 1)[-1]


def _iter_osm_elements(path: str) -> Iterator[dict]:
    """Stream (node | way-member) dict rows from one OSM XML file.

    ``iterparse`` + clearing each completed top-level element keeps
    memory bounded by the largest single way, not the file; runs
    INSIDE executor tasks on the distributed path."""
    import xml.etree.ElementTree as ET  # noqa: PLC0415

    base = {k: None for k in _ELEM_COLS}
    for _ev, elem in ET.iterparse(path, events=("end",)):
        name = _local_name(elem.tag)
        if name == "node":
            tags = {
                t.get("k"): t.get("v")
                for t in elem
                if _local_name(t.tag) == "tag"
            }
            lon, lat = elem.get("lon"), elem.get("lat")
            if lon is not None and lat is not None:
                yield {
                    **base,
                    "kind": "node",
                    "osm_id": int(elem.get("id")),
                    "lon": float(lon),
                    "lat": float(lat),
                    "tags": tags,
                }
            elem.clear()
        elif name == "way":
            tags = {}
            refs = []
            for child in elem:
                cn = _local_name(child.tag)
                if cn == "nd":
                    refs.append(int(child.get("ref")))
                elif cn == "tag":
                    tags[child.get("k")] = child.get("v")
            wid = int(elem.get("id"))
            for i, r in enumerate(refs):
                yield {
                    **base,
                    "kind": "member",
                    "way_id": wid,
                    "seq": i,
                    "ref": r,
                    "tags": tags,
                }
            elem.clear()
        elif name == "relation":
            # type=restriction relations (no_left_turn, only_straight_on,
            # no_u_turn, ...) are the one relation kind a router needs;
            # everything else (multipolygons, routes) stays out of scope.
            # Supported shapes: one from WAY + one via NODE + one to
            # WAY (the overwhelming majority), and — r15 — one from
            # WAY + one via WAY + one to WAY (the dual-carriageway
            # connector form; multi-via chains stay skipped,
            # documented).
            tags = {}
            f_way = t_way = v_node = v_way = None
            ok = True
            for child in elem:
                cn = _local_name(child.tag)
                if cn == "tag":
                    tags[child.get("k")] = child.get("v")
                elif cn == "member":
                    role = child.get("role")
                    mtype = child.get("type")
                    mref = child.get("ref")
                    if mref is None:
                        continue
                    if role == "from":
                        ok = ok and f_way is None and mtype == "way"
                        f_way = int(mref)
                    elif role == "to":
                        ok = ok and t_way is None and mtype == "way"
                        t_way = int(mref)
                    elif role == "via":
                        if v_node is not None or v_way is not None:
                            ok = False  # multi-via chain: skip
                        elif mtype == "node":
                            v_node = int(mref)
                        elif mtype == "way":
                            v_way = int(mref)
                        else:
                            ok = False
            rtype = tags.get("restriction")
            if (
                tags.get("type") == "restriction"
                # a relation tagged ONLY restriction:conditional is
                # still a restriction — its effective type resolves
                # per time bucket (restrictions_at)
                and (rtype or tags.get("restriction:conditional"))
                and ok
                and f_way is not None
                and t_way is not None
                and (v_node is not None or v_way is not None)
            ):
                yield {
                    **base,
                    "kind": "restriction",
                    "osm_id": int(elem.get("id")),
                    "way_id": f_way,
                    "ref": v_node,
                    "to_way": t_way,
                    "via_way": v_way,
                    "tags": tags,
                }
            elem.clear()
        elif name in ("osm", "bounds"):
            elem.clear()


def read_osm_elements(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Distributed OSM XML read: one task per file, union-schema rows
    (``kind`` discriminates node vs way-member).  Downstream branches
    filter on ``kind`` — note each ACTION re-parses the XML (the frame
    is lazy); ``edges_from_osm`` structures its plan as one join so the
    files are parsed once per branch, and a caller looping over many
    actions should ``persist()`` this frame first."""
    path_list = [paths] if isinstance(paths, str) else list(paths)

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            for p in pdf["path"]:
                buf: list[dict] = []
                for row in _iter_osm_elements(p):
                    buf.append(row)
                    if len(buf) >= _BATCH_ROWS:
                        yield pd.DataFrame(buf, columns=_ELEM_COLS)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=_ELEM_COLS)

    files = spark.createDataFrame(
        [(p,) for p in path_list],
        T.StructType([T.StructField("path", T.StringType())]),
    ).repartition(max(len(path_list), 1))
    return files.mapInPandas(parse, schema=_ELEM_SCHEMA)


def osm_nodes(elems: DataFrame) -> DataFrame:
    """``(osm_id, lon, lat, tags)`` from a ``read_osm_elements`` frame."""
    return elems.filter(F.col("kind") == "node").select(
        "osm_id", "lon", "lat", "tags"
    )


def osm_way_members(elems: DataFrame) -> DataFrame:
    """``(way_id, seq, ref, tags)`` — one row per way-node reference."""
    return elems.filter(F.col("kind") == "member").select(
        "way_id", "seq", "ref", "tags"
    )


def osm_turn_restrictions(elems: DataFrame) -> DataFrame:
    """``(rel_id, rtype, from_way, via_node, via_way, to_way)`` from
    ``type=restriction`` relations — from-way/via-NODE/to-way rows
    carry ``via_node`` (``via_way`` NULL), from-way/via-WAY/to-way
    rows the reverse; multi-via chains and malformed relations are
    skipped at parse.  ``rtype`` is the raw ``restriction=`` value —
    ``no_*`` bans the one maneuver, ``only_*`` bans every OTHER
    maneuver from the same approach.  ``except_tag`` surfaces the
    ``except=`` transport-mode list (``psv;bicycle`` style) so
    profile-aware expansion can skip restrictions that don't apply
    to the routed mode (``banned_turn_pairs(profile=)``).
    ``cond_tag`` surfaces ``restriction:conditional`` (time-windowed
    bans / lifts) — resolve it to an instant's effective restriction
    set with :func:`restrictions_at` before expansion; ``rtype`` is
    NULL on conditional-only relations (``banned_turn_pairs`` skips
    those until resolved)."""
    return elems.filter(F.col("kind") == "restriction").select(
        F.col("osm_id").alias("rel_id"),
        F.col("tags").getItem("restriction").alias("rtype"),
        F.col("way_id").alias("from_way"),
        F.col("ref").alias("via_node"),
        F.col("via_way"),
        F.col("to_way"),
        F.col("tags").getItem("except").alias("except_tag"),
        F.col("tags").getItem("restriction:conditional").alias("cond_tag"),
    )


def banned_turn_pairs(
    edges: DataFrame,
    restrictions: DataFrame,
    profile: str | None = None,
    via_way: str = "exit_pair",
) -> DataFrame:
    """Expand turn-restriction relations into banned maneuver pairs
    over an ``edges_from_osm`` table: one row per banned adjacent edge
    pair ``(_u1,_v1) -> (_u2,_v2)`` in the engine's rounded node ids —
    the exact anti-join key ``SparkGraph.to_linegraph(banned_turns=)``
    consumes (a banned maneuver is simply a maneuver the minor graph
    does not contain; reference TODO.md:62-70's maneuver-graph model).

    Resolution uses the OSM-ref columns the ingest carries
    (``_way_id``, ``_u_ref``, ``_v_ref``): the approach side is every
    edge row of the from way ENDING at the via node (both travel
    directions of a two-way road that reach the junction), the
    departure side every row LEAVING it.  ``no_*`` keeps departures on
    the to way; ``only_*`` keeps departures NOT on it (ban-everything-
    else semantics).  Restrictions are tiny next to the edge table —
    both joins broadcast them; the edge side is touched twice with
    single-column equi-predicates, no shuffle beyond the scan.

    Via-WAY relations (r15; the dual-carriageway connector form) are
    expanded driver-side from the restriction-bounded edge subset:
    junction A = the node the from and via ways share, B = via∩to,
    the via chain walked A→B over the via way's directed segments,
    and the ban emitted as the EXIT pair (last chain edge → every
    to-way departure at B).  For the canonical connector (the via way
    reachable only from the from way, the overwhelming real-world
    shape) this is exact; when the via way has other entrances it
    conservatively also restricts their exit onto the to way — the
    standard pair-based approximation — :func:`via_way_splits` +
    ``to_linegraph(via_splits=)`` is the EXACT path (stateful edge
    splitting, r16).  ``only_*`` via-way relations (inexpressible as
    pairs; the splits path handles them) and unresolvable chains
    (ambiguous shared junctions, no directed path) are skipped.

    ``profile``: the routed transport mode (``"motorcar"``,
    ``"bicycle"``, ``"psv"``, …).  A restriction whose ``except=``
    list names the profile does not apply to it and is dropped
    before expansion (OSM semantics: ``except=bicycle`` on a
    no_left_turn means cyclists MAY turn).  ``None`` (default) keeps
    every restriction — the conservative choice for an unspecified
    mode.  ``restriction:conditional`` values resolve per instant via
    :func:`restrictions_at` (r16; unresolved conditional-only rows
    expand to nothing).

    ``via_way``: ``"exit_pair"`` (default) applies the conservative
    expansion described above; ``"skip"`` omits via-way relations
    entirely — use it when ALSO passing :func:`via_way_splits` to
    ``to_linegraph(via_splits=)``, which handles them exactly (the
    exit pairs would otherwise over-ban other entrants)."""
    if via_way not in ("exit_pair", "skip"):
        raise ValueError(
            f"via_way must be 'exit_pair' or 'skip': {via_way!r}"
        )
    # conditional-only relations carry rtype NULL until a time bucket
    # resolves them (restrictions_at) — unresolved, they expand to
    # nothing rather than poisoning the no_*/only_* predicates
    restrictions = restrictions.filter(F.col("rtype").isNotNull())
    if profile is not None and "except_tag" in restrictions.columns:
        restrictions = restrictions.filter(
            ~F.array_contains(
                F.split(F.coalesce(F.col("except_tag"), F.lit("")), ";"),
                profile,
            )
        )
    if "via_way" in restrictions.columns:
        via_way_rows = (
            restrictions.filter(F.col("via_way").isNotNull()).collect()
            if via_way == "exit_pair"
            else []
        )
        restrictions = restrictions.filter(F.col("via_way").isNull())
    else:  # pre-r15 caller-built frames
        via_way_rows = []
    r = restrictions.select(
        "rel_id",
        F.col("rtype").startswith("only_").alias("_only"),
        # same-way no_* (from == to, the classic no_u_turn shape):
        # way-granularity would ban EVERY departure on the way at the
        # via node — including continuing straight through an interior
        # junction — when the restricted maneuver is only the
        # REVERSAL; match those by the departure's far end instead.
        # The pin applies ONLY when from_way == to_way: a cross-way
        # no_u_turn (dual-carriageway/merge form, from != to) has its
        # approach and departure on DIFFERENT node chains, so the
        # far-end==near-end pin would never match and the restriction
        # would expand to zero pairs — those keep the way-granularity
        # ban of all to-way departures at the via node.
        (
            ~F.col("rtype").startswith("only_")
            & (F.col("from_way") == F.col("to_way"))
        ).alias("_rev_only"),
        "from_way",
        "via_node",
        "to_way",
    )
    approach = edges.join(
        F.broadcast(r),
        (F.col("_way_id") == F.col("from_way"))
        & (F.col("_v_ref") == F.col("via_node")),
    ).select(
        F.col("_u").alias("_u1"),
        F.col("_v").alias("_v1"),
        F.col("_u_ref").alias("_uref1"),
        "rel_id",
        "_only",
        "_rev_only",
        "via_node",
        "to_way",
    )
    depart = edges.select(
        F.col("_u").alias("_u2"),
        F.col("_v").alias("_v2"),
        F.col("_way_id").alias("_wid2"),
        F.col("_u_ref").alias("_uref2"),
        F.col("_v_ref").alias("_vref2"),
    )
    # approach is restriction-bounded (≤ ~2 rows per relation), the
    # departure side is the full edge table: broadcast the small side
    paired = depart.join(
        F.broadcast(approach), F.col("via_node") == F.col("_uref2")
    ).filter(
        (
            ~F.col("_only")
            & (F.col("_wid2") == F.col("to_way"))
            # reversal-only restrictions additionally pin the
            # departure's far end to the approach's near end — the
            # exact u-turn pair, nothing else on the way
            & (~F.col("_rev_only") | (F.col("_vref2") == F.col("_uref1")))
        )
        | (F.col("_only") & (F.col("_wid2") != F.col("to_way")))
    )
    out = paired.select("_u1", "_v1", "_u2", "_v2").distinct()
    vw_pairs = _via_way_pairs(edges, via_way_rows)
    if vw_pairs:
        out = out.unionByName(
            edges.sparkSession.createDataFrame(
                sorted(vw_pairs), out.schema
            )
        ).distinct()
    # The pair set is restriction-sized but its plan chains the edge
    # table twice (approach/depart sides); consumers reference it
    # repeatedly (the minor's anti-join, hierarchy turn fingerprints),
    # so truncate the plan once — analysis and re-execution of the
    # producing joins collapse to a single materialization.
    return out.localCheckpoint(eager=False)


def _via_way_resolved(
    edges: DataFrame, vrows: list, include_only: bool = False
) -> list[dict]:
    """Driver-side via-way chain resolution (restriction-bounded: only
    the few ways a relation names are ever collected).  Per resolvable
    relation returns ``{rel_id, only, approaches, chain, exits}`` in
    engine ``(_u, _v)`` ids: every from-way edge ENTERING junction A,
    the directed via chain A→B in order, and every to-way departure
    LEAVING junction B.  Ambiguous shared junctions and chains with no
    directed path are skipped; ``only_*`` relations are included only
    when ``include_only`` (the exit-pair approximation cannot express
    them — :func:`via_way_splits` can)."""
    from collections import deque

    vrows = [
        r
        for r in vrows
        if r["rtype"] is not None
        and (include_only or not r["rtype"].startswith("only_"))
    ]
    if not vrows:
        return []
    way_ids = sorted(
        {
            w
            for r in vrows
            for w in (r["from_way"], r["via_way"], r["to_way"])
        }
    )
    erows = (
        edges.filter(F.col("_way_id").isin(way_ids))
        .select("_u", "_v", "_way_id", "_u_ref", "_v_ref")
        .collect()
    )
    by_way: dict = {}
    for e in erows:
        by_way.setdefault(e["_way_id"], []).append(e)
    out: list[dict] = []
    for r in vrows:
        f_e = by_way.get(r["from_way"], [])
        v_e = by_way.get(r["via_way"], [])
        t_e = by_way.get(r["to_way"], [])
        f_nodes = {x["_u_ref"] for x in f_e} | {x["_v_ref"] for x in f_e}
        v_nodes = {x["_u_ref"] for x in v_e} | {x["_v_ref"] for x in v_e}
        t_nodes = {x["_u_ref"] for x in t_e} | {x["_v_ref"] for x in t_e}
        a_set = (f_nodes & v_nodes) - t_nodes
        b_set = (t_nodes & v_nodes) - f_nodes
        if len(a_set) != 1 or len(b_set) != 1:
            continue  # ambiguous topology: skip, documented
        a, b = next(iter(a_set)), next(iter(b_set))
        # BFS over the via way's DIRECTED segments from A to B (a
        # oneway via only carries one direction)
        adj: dict = {}
        for x in v_e:
            adj.setdefault(x["_u_ref"], []).append(x)
        prev: dict = {a: None}
        qd = deque([a])
        while qd and b not in prev:
            cur = qd.popleft()
            for x in adj.get(cur, []):
                if x["_v_ref"] not in prev:
                    prev[x["_v_ref"]] = x
                    qd.append(x["_v_ref"])
        if b not in prev:
            continue  # no directed via path: skip
        chain, cur = [], b
        while prev[cur] is not None:
            e = prev[cur]
            chain.append((e["_u"], e["_v"]))
            cur = e["_u_ref"]
        chain.reverse()
        out.append(
            {
                "rel_id": r["rel_id"],
                "only": r["rtype"].startswith("only_"),
                "approaches": sorted(
                    (x["_u"], x["_v"]) for x in f_e if x["_v_ref"] == a
                ),
                "chain": chain,
                "exits": sorted(
                    (x["_u"], x["_v"]) for x in t_e if x["_u_ref"] == b
                ),
            }
        )
    return out


def _via_way_pairs(edges: DataFrame, vrows: list) -> list[tuple]:
    """Conservative EXIT-PAIR expansion of via-way relations (last
    chain edge → every to-way departure at B) — see
    ``banned_turn_pairs`` for the semantics and the documented
    approximation; :func:`via_way_splits` is the exact path."""
    pairs: set = set()
    for r in _via_way_resolved(edges, vrows):
        if not r["chain"]:
            continue
        lu, lv = r["chain"][-1]
        for tu, tv in r["exits"]:
            pairs.add((lu, lv, tu, tv))
    return list(pairs)


def via_way_splits(
    edges: DataFrame,
    restrictions: DataFrame,
    profile: str | None = None,
) -> DataFrame:
    """EXACT via-way restriction handling (r15-verdict task #2) via
    stateful edge splitting: resolve every ``no_*`` via-WAY relation
    to ``(rel_id, kind, seq, _u, _v)`` rows — ``kind='from'`` the
    approach edges entering junction A, ``kind='via'`` the directed
    chain A→B (``seq`` ordered), ``kind='to'`` the banned departures
    at B — and feed the frame to
    :meth:`SparkGraph.to_linegraph(via_splits=)`, which duplicates the
    chain's minor nodes PER RESTRICTION (a shadow copy entered only
    from the approach, whose exit onto the to way does not exist).
    Unlike the exit-pair approximation inside
    :func:`banned_turn_pairs`, traffic entering the via way from any
    OTHER entrance keeps the original unrestricted maneuvers — the
    sequence ban is exact.

    ``only_*`` via-way relations (``only_straight_on`` through a
    connector) are expressible ONLY here (r16; the pair approximation
    skips them): rows carry ``only=true``, and the split then REMOVES
    every original departure of the approach (the shadow entry is the
    sole continuation), pins the shadow to the chain, and permits
    only the to-way exits at the chain end.

    Use with ``banned_turn_pairs(..., via_way="skip")`` so the
    conservative exit pairs are not ALSO applied.  ``profile`` filters
    ``except=``-listed relations, same as ``banned_turn_pairs``."""
    if profile is not None and "except_tag" in restrictions.columns:
        restrictions = restrictions.filter(
            ~F.array_contains(
                F.split(F.coalesce(F.col("except_tag"), F.lit("")), ";"),
                profile,
            )
        )
    restrictions = restrictions.filter(F.col("rtype").isNotNull())
    vrows = (
        restrictions.filter(F.col("via_way").isNotNull()).collect()
        if "via_way" in restrictions.columns
        else []
    )
    rows = []
    for r in _via_way_resolved(edges, vrows, include_only=True):
        if not r["chain"]:
            continue
        only = bool(r["only"])
        for u, v in r["approaches"]:
            rows.append((int(r["rel_id"]), "from", 0, u, v, only))
        for i, (u, v) in enumerate(r["chain"]):
            rows.append((int(r["rel_id"]), "via", i, u, v, only))
        for u, v in r["exits"]:
            rows.append((int(r["rel_id"]), "to", 0, u, v, only))
    idt = edges.schema["_u"].dataType
    schema = T.StructType(
        [
            T.StructField("rel_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("seq", T.IntegerType(), False),
            T.StructField("_u", idt, False),
            T.StructField("_v", idt, False),
            T.StructField("only", T.BooleanType(), False),
        ]
    )
    return edges.sparkSession.createDataFrame(rows, schema)


def edges_from_osm(
    spark: SparkSession,
    paths: str | list[str],
    way_filter: str = "highway",
    tag_cols: tuple[str, ...] = ("highway", "name"),
    precision: int = DEFAULT_PRECISION,
    with_length: bool = True,
    elems: DataFrame | None = None,
    respect_access: bool = True,
) -> DataFrame:
    """Routable edge table from OSM XML: tag-filtered ways, geometry
    assembled via the refs→nodes join, ways SPLIT at junction nodes,
    oneway honored, node ids in the engine's canonical rounded
    ``"lon, lat"`` form (functions/ids.py F1/F2 — so OSM graphs compose
    with GTFS stop links, haversine heuristics, and every other
    source).

    Output: ``(_u, _v, _layer='osm', geom, _way_id, _seg, _dir,
    _u_ref, _v_ref, <tag_cols>..., _minx/_maxx/_miny/_maxy
    [, _length])`` — one row per direction per junction-to-junction
    segment.

    ``way_filter``: keep only ways carrying this tag key (``highway``
    = the street network; pass ``None`` to keep every way).
    ``respect_access``: drop legally/physically untraversable ways —
    ``access=no|private`` and ``highway=construction|proposed`` (the
    standard router default; finer per-mode rules like ``foot=yes``
    overriding ``access=no`` are a profile concern — read the tag via
    ``tag_cols`` and filter downstream).
    ``tag_cols``: way tags surfaced as top-level columns.
    ``elems``: pre-read (possibly persisted) element frame — pass it
    when building edges AND node attrs from the same files to parse
    the XML once.

    Junction rule: a node is a cut point iff it is referenced more
    than once across all KEPT ways (shared by two ways, or a loop
    closure within one) or it is its way's first/last member.  Each
    member row gets segment id = (running count of cut flags up to and
    including it) - 1; interior cut rows additionally close the
    previous segment — so consecutive cut-to-cut runs become segments
    with the junction row present in both.  Dangling refs (members
    whose node is missing from the extract — normal at extract
    boundaries) drop in the inner geometry join, and any segment left
    with fewer than 2 points is discarded.
    """
    if elems is None:
        elems = read_osm_elements(spark, paths)
    members = osm_way_members(elems)
    if way_filter is not None:
        members = members.filter(
            F.col("tags").getItem(way_filter).isNotNull()
        )
    if respect_access:
        members = members.filter(
            ~F.lower(
                F.coalesce(F.col("tags").getItem("access"), F.lit(""))
            ).isin(*ACCESS_DENIED)
            & ~F.lower(
                F.coalesce(F.col("tags").getItem("highway"), F.lit(""))
            ).isin(*HIGHWAY_NOT_BUILT)
        )
    # overlapping region extracts repeat boundary nodes; a duplicate
    # definition would multiply member rows through the join (inflating
    # _use into phantom junction splits and duplicating geometry
    # points), so reduce to one deterministic row per ref first
    coords = (
        osm_nodes(elems)
        .groupBy(F.col("osm_id").alias("ref"))
        .agg(
            F.max(F.struct("lon", "lat")).alias("_c"),
        )
        .select("ref", F.col("_c.lon").alias("lon"), F.col("_c.lat").alias("lat"))
    )
    # THE scale join: members shuffle on ref, nodes on osm_id — one
    # hash exchange each, 8-byte long keys.  Inner join drops dangling
    # refs by construction.
    mj = members.join(coords, "ref")

    use = mj.groupBy("ref").agg(F.count(F.lit(1)).alias("_use"))
    wext = Window.partitionBy("way_id")
    mjx = (
        mj.join(use, "ref")
        .withColumn("_minseq", F.min("seq").over(wext))
        .withColumn("_maxseq", F.max("seq").over(wext))
        .withColumn(
            "_cut",
            (F.col("_use") > 1)
            | (F.col("seq") == F.col("_minseq"))
            | (F.col("seq") == F.col("_maxseq")),
        )
    )
    wseq = Window.partitionBy("way_id").orderBy("seq")
    mjs = mjx.withColumn(
        "_cuts_incl",
        F.sum(F.col("_cut").cast("int")).over(
            wseq.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    primary = mjs.withColumn("_seg", F.col("_cuts_incl") - 1)
    # an interior cut row closes the previous segment too (it is both
    # the end of segment k-1 and the start of segment k)
    closer = mjs.filter(
        F.col("_cut") & (F.col("seq") > F.col("_minseq"))
    ).withColumn("_seg", F.col("_cuts_incl") - 2)
    rows = primary.unionByName(closer)

    segs = (
        rows.groupBy("way_id", "_seg")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "ref", "lon", "lat"))
            ).alias("_pts"),
            F.first("tags").alias("tags"),
        )
        # the way's last row starts a phantom 1-point segment; drop it
        .filter(F.size("_pts") >= 2)
    )
    pts = F.col("_pts")
    cs = F.transform(pts, lambda p: F.array(p["lon"], p["lat"]))
    base = segs.select(
        F.col("way_id").alias("_way_id"),
        F.col("_seg"),
        cs.alias("_coords"),
        F.element_at(pts, 1)["ref"].alias("_first_ref"),
        F.element_at(pts, -1)["ref"].alias("_last_ref"),
        F.lower(F.coalesce(F.col("tags").getItem("oneway"), F.lit(""))).alias(
            "_oneway"
        ),
        *[F.col("tags").getItem(t).alias(t) for t in tag_cols],
    )

    def _emit(reverse: bool) -> DataFrame:
        c = F.reverse(F.col("_coords")) if reverse else F.col("_coords")
        first = F.col("_last_ref") if reverse else F.col("_first_ref")
        last = F.col("_first_ref") if reverse else F.col("_last_ref")
        return base.select(
            node_id_from_coord(F.element_at(c, 1), precision).alias("_u"),
            node_id_from_coord(F.element_at(c, -1), precision).alias("_v"),
            F.lit("osm").alias("_layer"),
            F.struct(
                F.lit("LineString").alias("type"), c.alias("coordinates")
            ).alias("geom"),
            "_way_id",
            "_seg",
            F.lit(1 if reverse else 0).alias("_dir"),
            first.alias("_u_ref"),
            last.alias("_v_ref"),
            "_oneway",
            *[F.col(t) for t in tag_cols],
        )

    fwd = _emit(False).filter(~F.col("_oneway").isin(*ONEWAY_REV))
    rev = _emit(True).filter(~F.col("_oneway").isin(*ONEWAY_FWD))
    edges = fwd.unionByName(rev).drop("_oneway")
    edges = edges.withColumns(bbox_columns(F.col("geom.coordinates")))
    if with_length:
        edges = edges.withColumn(
            "_length", linestring_length_m(F.col("geom.coordinates"))
        )
    return edges


def node_attrs_from_osm(
    elems: DataFrame,
    keys: tuple[str, ...],
    precision: int = DEFAULT_PRECISION,
) -> DataFrame:
    """Node-tag attributes (``highway=crossing``, ``kerb=...``, ...)
    keyed by the engine's rounded ``"lon, lat"`` node id — the OSM
    composition of the r12 Point-feature node-attribute path: feed the
    result to ``nodes_from_edges(edges, point_attrs=...)``.  Only
    nodes carrying at least one requested key are emitted; duplicates
    per rounded id resolve last-write-wins on the OSM node id (the U2
    idiom: later node wins)."""
    pts = osm_nodes(elems)
    keyed = pts.select(
        node_id(F.col("lon"), F.col("lat"), precision).alias("_n"),
        F.col("osm_id"),
        *[F.col("tags").getItem(k).alias(k) for k in keys],
    ).filter(
        F.greatest(*[F.col(k).isNotNull() for k in keys])
        if len(keys) > 1
        else F.col(keys[0]).isNotNull()
    )
    w = Window.partitionBy("_n").orderBy(F.col("osm_id").desc())
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "osm_id")
    )


def split_osm_xml(
    path: str, out_dir: str, target_bytes: int = 64 << 20
) -> list[str]:
    """Pre-split ONE large ``.osm`` file into many valid shard files —
    the escape hatch for the documented one-task-per-file trap (XML is
    not splittable, so a single planet-scale extract would parse in
    one executor task; planet-scale reality is PBF, but big regional
    XML extracts are common).

    Streaming ``iterparse`` with per-element clearing — bounded memory
    regardless of input size; each completed top-level element
    (node / way / relation) is re-serialized into the current shard,
    rotating at ``target_bytes``.  Shards need NOT be self-contained:
    the refs→nodes geometry join is global across the file set by
    construction (see module docstring), which is exactly what makes
    this split safe.  Driver-side and one-off; returns shard paths in
    document order (element order is preserved within and across
    shards)."""
    import os
    import xml.etree.ElementTree as ET  # noqa: PLC0415

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    fh = None
    written = 0

    def rotate():
        nonlocal fh, written
        if fh is not None:
            fh.write("</osm>\n")
            fh.close()
        p = os.path.join(out_dir, f"shard{len(paths):05d}.osm")
        paths.append(p)
        fh = open(p, "w", encoding="utf-8")
        fh.write("<osm>\n")
        written = 0

    rotate()
    root = None
    for ev, elem in ET.iterparse(path, events=("start", "end")):
        if ev == "start":
            if root is None:
                root = elem
            continue
        name = _local_name(elem.tag)
        if name in ("node", "way", "relation"):
            if written >= target_bytes:
                rotate()
            chunk = ET.tostring(elem, encoding="unicode")
            fh.write(chunk)
            if not chunk.endswith("\n"):
                fh.write("\n")
            written += len(chunk)
            elem.clear()
            if root is not None:
                # drop the completed child from the root so the tree
                # never accumulates (iterparse keeps children attached)
                try:
                    root.remove(elem)
                except ValueError:
                    pass
        elif name in ("osm", "bounds"):
            elem.clear()
    fh.write("</osm>\n")
    fh.close()
    return paths


def speed_kmh_col(
    highway_col: str = "highway",
    maxspeed_col: str | None = "maxspeed",
    speeds: dict[str, float] | None = None,
    default_kmh: float = 30.0,
) -> F.Column:
    """Free-flow speed Column (km/h) for an ``edges_from_osm`` table:
    a parsed explicit ``maxspeed`` tag wins (plain number = km/h,
    ``NN mph`` converted; unparseable values like ``none``/``walk``
    fall through), else the ``speeds`` table keyed by highway class,
    else ``default_kmh``.  Pure Catalyst CASE/regexp — whole-stage
    codegen, no UDF."""
    table = speeds if speeds is not None else DEFAULT_SPEEDS_KMH
    by_class = None
    for k, v in table.items():
        cond = F.col(highway_col) == k
        by_class = (
            F.when(cond, float(v))
            if by_class is None
            else by_class.when(cond, float(v))
        )
    parts = []
    if maxspeed_col is not None:
        ms = F.col(maxspeed_col)
        num = F.regexp_extract(ms, r"^\s*(\d+(?:\.\d+)?)", 1)
        parsed = F.when(
            num != "",
            num.cast("double")
            * F.when(
                F.upper(ms).contains("MPH"), F.lit(_MPH_TO_KMH)
            ).otherwise(F.lit(1.0)),
        )
        parts.append(parsed)
    if by_class is not None:
        parts.append(by_class)
    parts.append(F.lit(float(default_kmh)))
    return F.coalesce(*parts)


def traversal_seconds(
    edges: DataFrame,
    speeds: dict[str, float] | None = None,
    default_kmh: float = 30.0,
    highway_col: str = "highway",
    maxspeed_col: str | None = "maxspeed",
    length_col: str = "_length",
    out_col: str = "_traversal_sec",
) -> DataFrame:
    """Cost-profile column (reference "routing engine" scoping — the
    r13 roadmap item): per-edge free-flow traversal TIME from the
    haversine length and a per-highway-class speed table, so
    ``graph_from_osm`` output routes by time
    (``shortest_path(weight="_traversal_sec")``), composing with
    ``layer_cost`` / maneuver costs like any other weight column.
    Map-side column arithmetic — zero shuffles, survives any scale."""
    if length_col not in edges.columns:
        raise ValueError(
            f"traversal_seconds needs {length_col!r} (pass "
            "with_length=True to edges_from_osm)"
        )
    ms = maxspeed_col if maxspeed_col in edges.columns else None
    kmh = speed_kmh_col(
        highway_col=highway_col,
        maxspeed_col=ms,
        speeds=speeds,
        default_kmh=default_kmh,
    )
    return edges.withColumn(
        out_col, F.col(length_col) / (kmh / F.lit(3.6))
    )


# --------------------------------------------------------------------
# Time-dependent metrics: OSM *:conditional tags (r15-verdict task #1)
# --------------------------------------------------------------------

_DAY_NAMES = ("Mo", "Tu", "We", "Th", "Fr", "Sa", "Su")
_DAY_RE = r"(?:Mo|Tu|We|Th|Fr|Sa|Su)(?:-(?:Mo|Tu|We|Th|Fr|Sa|Su))?"
_SPAN_RE = r"\d{1,2}:\d{2}-\d{1,2}:\d{2}"

#: the conditional-maxspeed tag name, for tag_cols lists
COND_MAXSPEED = "maxspeed:conditional"


def _day_idx(tok: F.Column) -> F.Column:
    expr = F.when(tok == _DAY_NAMES[0], 0)
    for i, d in enumerate(_DAY_NAMES[1:], 1):
        expr = expr.when(tok == d, i)
    return expr


def conditional_value_at(cond, dow: int, minute: int) -> F.Column:
    """Value of an OSM ``*:conditional`` tag column at one instant —
    ``dow`` 0=Mo..6=Su, ``minute`` minutes past local midnight — or
    NULL when no clause applies (public tagging scheme: semicolon-
    separated ``value @ (condition)`` clauses, rightmost applicable
    clause wins).

    Supported condition subset (the time-interval grammar — the shapes
    that matter for routing metrics): day ranges (``Mo-Fr``, ``Sa-Su``,
    single days, comma lists, week-wrapping ``Fr-Mo``) and time spans
    (``07:00-09:00``, comma lists, midnight-wrapping ``22:00-06:00``,
    start-inclusive end-exclusive).  A clause with neither days nor
    spans matches always; non-time predicates (``wet``, ``snow``,
    vehicle properties) contribute no day/span tokens and therefore
    match conservatively — callers routing a known mode should prefer
    explicit buckets.  Pure Catalyst (split / regexp_extract_all /
    exists) — whole-stage codegen over the edge table, no UDF; the
    instant is a plan-time literal, so each bucket compiles to a
    constant-folded CASE cascade."""
    if not 0 <= dow <= 6:
        raise ValueError(f"dow must be 0(Mo)..6(Su), got {dow}")
    if not 0 <= minute < 1440:
        raise ValueError(f"minute must be 0..1439, got {minute}")
    cond = F.col(cond) if isinstance(cond, str) else cond
    q_day = F.lit(int(dow))
    q_min = F.lit(int(minute))

    def day_tok_matches(tok):
        a = _day_idx(F.substring(tok, 1, 2))
        b = F.when(
            F.length(tok) > 2, _day_idx(F.substring(tok, 4, 2))
        ).otherwise(a)
        return F.when(
            a <= b, (q_day >= a) & (q_day <= b)
        ).otherwise((q_day >= a) | (q_day <= b))

    def span_matches(s):
        p = F.split(s, r"[:\-]")
        start = p[0].cast("int") * 60 + p[1].cast("int")
        end = p[2].cast("int") * 60 + p[3].cast("int")
        return F.when(
            start <= end, (q_min >= start) & (q_min < end)
        ).otherwise((q_min >= start) | (q_min < end))

    def clause_active(cl):
        c = F.regexp_extract(cl, r"@\s*\(([^)]*)\)\s*$", 1)
        days = F.regexp_extract_all(c, F.lit(_DAY_RE), 0)
        spans = F.regexp_extract_all(c, F.lit(_SPAN_RE), 0)
        return ((F.size(days) == 0) | F.exists(days, day_tok_matches)) & (
            (F.size(spans) == 0) | F.exists(spans, span_matches)
        )

    active = F.filter(F.split(cond, ";"), clause_active)
    last = F.try_element_at(active, F.lit(-1))
    val = F.trim(F.regexp_extract(last, r"^\s*([^@]*?)\s*@", 1))
    return F.when(val != "", val)


def speed_kmh_at(
    dow: int,
    minute: int,
    highway_col: str = "highway",
    maxspeed_col: str | None = "maxspeed",
    conditional_col: str | None = COND_MAXSPEED,
    speeds: dict[str, float] | None = None,
    default_kmh: float = 30.0,
) -> F.Column:
    """:func:`speed_kmh_col` at one instant: an applicable
    ``maxspeed:conditional`` clause wins over everything (same numeric
    parse, mph honored), then the plain ``maxspeed`` tag, then the
    class table, then the default."""
    base = speed_kmh_col(
        highway_col=highway_col,
        maxspeed_col=maxspeed_col,
        speeds=speeds,
        default_kmh=default_kmh,
    )
    if conditional_col is None:
        return base
    cv = conditional_value_at(F.col(conditional_col), dow, minute)
    num = F.regexp_extract(cv, r"^\s*(\d+(?:\.\d+)?)", 1)
    cond_kmh = F.when(
        num != "",
        num.cast("double")
        * F.when(
            F.upper(cv).contains("MPH"), F.lit(_MPH_TO_KMH)
        ).otherwise(F.lit(1.0)),
    )
    return F.coalesce(cond_kmh, base)


def traversal_seconds_at(
    edges: DataFrame,
    dow: int,
    minute: int,
    speeds: dict[str, float] | None = None,
    default_kmh: float = 30.0,
    highway_col: str = "highway",
    maxspeed_col: str | None = "maxspeed",
    conditional_col: str | None = COND_MAXSPEED,
    length_col: str = "_length",
    out_col: str = "_traversal_sec",
) -> DataFrame:
    """:func:`traversal_seconds` at one instant — the per-time-bucket
    cost profile (``maxspeed:conditional`` rush-hour limits change the
    metric).  Same zero-shuffle map-side arithmetic."""
    if length_col not in edges.columns:
        raise ValueError(
            f"traversal_seconds_at needs {length_col!r} (pass "
            "with_length=True to edges_from_osm)"
        )
    ms = maxspeed_col if maxspeed_col in edges.columns else None
    cc = conditional_col if conditional_col in edges.columns else None
    kmh = speed_kmh_at(
        dow,
        minute,
        highway_col=highway_col,
        maxspeed_col=ms,
        conditional_col=cc,
        speeds=speeds,
        default_kmh=default_kmh,
    )
    return edges.withColumn(
        out_col, F.col(length_col) / (kmh / F.lit(3.6))
    )


def restrictions_at(
    restrictions: DataFrame, dow: int, minute: int
) -> DataFrame:
    """Materialize the turn-restriction set ACTIVE at one instant:
    an applicable ``restriction:conditional`` clause overrides the
    unconditional ``restriction`` value (so ``no_left_turn @ (Mo-Fr
    07:00-09:00)`` bans only during rush hour, and ``none @ (...)``
    LIFTS a base restriction inside its window); rows left with no
    effective type drop.  Feed the result to
    :func:`banned_turn_pairs` — one banned-pairs set per time bucket,
    composing with per-bucket minors / :class:`~entwiner_spark.
    operators.ch_edge.EdgeBasedCH` builds."""
    if "cond_tag" not in restrictions.columns:
        return restrictions.filter(F.col("rtype").isNotNull())
    eff = F.coalesce(
        conditional_value_at(F.col("cond_tag"), dow, minute),
        F.col("rtype"),
    )
    return (
        restrictions.withColumn("rtype", eff)
        .filter(F.col("rtype").isNotNull() & (F.col("rtype") != "none"))
    )


def time_profiles(
    edges: DataFrame,
    ch,
    buckets: dict[str, tuple[int, int]],
    speeds: dict[str, float] | None = None,
    default_kmh: float = 30.0,
    highway_col: str = "highway",
    maxspeed_col: str | None = "maxspeed",
    conditional_col: str | None = COND_MAXSPEED,
    length_col: str = "_length",
    strategy: str = "auto",
) -> dict:
    """Per-time-bucket routing metrics over ONE contraction order —
    the standard CCH deployment shape (Dibbelt/Strasser/Wagner 2014:
    contract once, customize per metric).  ``buckets`` maps bucket
    name → ``(dow, minute)`` instants; each bucket's traversal-time
    metric (``maxspeed:conditional`` resolved at that instant) is
    served through :meth:`~entwiner_spark.operators.ch.
    ContractionHierarchy.customize` — one join pass per build level,
    NO recontraction — so k buckets cost k customizations, not k
    hierarchy builds.  Returns bucket name → customized hierarchy.

    ``ch`` must be ``build(customizable=True)`` over the SAME edge
    table (any positive base metric)."""
    out = {}
    for name, (dow, minute) in buckets.items():
        metric = traversal_seconds_at(
            edges,
            dow,
            minute,
            speeds=speeds,
            default_kmh=default_kmh,
            highway_col=highway_col,
            maxspeed_col=maxspeed_col,
            conditional_col=conditional_col,
            length_col=length_col,
            out_col="w",
        ).select("_u", "_v", "w")
        out[name] = ch.customize(metric, strategy=strategy)
    return out


def graph_from_osm(
    spark: SparkSession,
    paths: str | list[str],
    way_filter: str = "highway",
    tag_cols: tuple[str, ...] = ("highway", "name"),
    node_attr_keys: tuple[str, ...] = (),
    precision: int = DEFAULT_PRECISION,
    with_traversal_time: bool = False,
    speeds: dict[str, float] | None = None,
    with_restrictions: bool = False,
    profile: str | None = None,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """One-call OSM → (nodes, edges): tag-filtered, junction-split,
    oneway-honoring edges plus the endpoint-derived nodes table, node
    tags joined on as attributes when ``node_attr_keys`` is given.
    Feed the pair straight to ``SparkGraph`` (or ``bulk_load`` into a
    parquet store).

    ``with_traversal_time=True`` appends the ``_traversal_sec`` cost
    profile (``traversal_seconds``; ``maxspeed`` is auto-added to
    ``tag_cols`` so explicit limits win over the ``speeds`` table) —
    the result routes by TIME via
    ``shortest_path(weight="_traversal_sec")``.

    ``with_restrictions=True`` returns a THIRD frame: the banned
    maneuver pairs from ``type=restriction`` relations
    (``banned_turn_pairs``), ready for
    ``to_linegraph(banned_turns=...)``; ``profile`` names the routed
    mode so ``except=``-listed restrictions drop (see
    ``banned_turn_pairs``)."""
    from entwiner_spark.sources.geojson import nodes_from_edges

    if with_traversal_time and "maxspeed" not in tag_cols:
        tag_cols = (*tag_cols, "maxspeed")
    elems = read_osm_elements(spark, paths)
    edges = edges_from_osm(
        spark,
        paths,
        way_filter=way_filter,
        tag_cols=tag_cols,
        precision=precision,
        elems=elems,
    )
    if with_traversal_time:
        edges = traversal_seconds(edges, speeds=speeds)
    # One parse execution for the whole family: nodes_from_edges, the
    # restriction expansion, and every caller action all reference the
    # edge frame independently, and each reference would otherwise
    # re-run the XML parse + junction-split pipeline.  A lazy
    # checkpoint truncates the logical plan now and materializes on
    # the first action; values and schema are untouched.
    edges = edges.localCheckpoint(eager=False)
    attrs = (
        node_attrs_from_osm(elems, node_attr_keys, precision=precision)
        if node_attr_keys
        else None
    )
    nodes = nodes_from_edges(edges, precision=precision, point_attrs=attrs)
    if with_restrictions:
        bans = banned_turn_pairs(
            edges, osm_turn_restrictions(elems), profile=profile
        )
        return nodes, edges, bans
    return nodes, edges
