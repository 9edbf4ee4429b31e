"""SparkGraph — the DataFrame-native graph facade (SURVEY.md §2.11, §3.2).

Replaces the reference's NetworkX-protocol layer
(/root/reference/entwiner/graphs/digraphdb/) with set-at-a-time
DataFrame queries, and its per-node-SQL Dijkstra driving
(README.md:66-74) with a Pregel-style iterative frontier expansion:
each iteration is ONE distributed join+shuffle over the whole frontier
instead of one SQLite query per expanded node.

Scale notes:
- edges are repartitioned on ``_u`` once at construction so every
  frontier join reuses the same hash partitioning (no re-shuffle of the
  big side per iteration);
- lineage is truncated with ``localCheckpoint`` every few iterations
  (iterative-plan blowup is the classic Spark failure mode here);
- convergence = count of improved vertices, one lightweight action per
  iteration.

Known reference quirks NOT replicated (SURVEY.md §7): swapped
successor/predecessor wiring in OuterAdjlistView defaults and
``unique_successors`` counting ``_u`` (edge_table.py:129) — this
implementation uses the semantically correct columns.
"""

from __future__ import annotations

import inspect
import re
import time

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entwiner_spark.operators import spatial


def rebase_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint(eager=True)`` with full provenance severing.

    ``eager=False`` defers materialization to the caller's next action
    over the returned frame (the probe-fold pattern: a count that
    immediately follows both materializes the checkpoint and answers
    the probe in ONE scheduled job).  Only safe when that action runs
    before the frame is referenced more than once — the plan is
    already a bare ExternalRDD scan either way, so Catalyst analysis
    stays flat; it is the RDD compute that must not be repeated.

    ``Dataset.localCheckpoint`` truncates plan and RDD lineage but the
    returned Dataset still carries origin metadata from the plan it
    checkpointed; when an iterative loop references the previous
    round's checkpoint MORE THAN ONCE per round (any self-join, e.g.
    pointer doubling), that carried state compounds and the
    per-round JOB time doubles from ~round 16 even though rows,
    partitions, optimized-plan size, and ``toDebugString`` lineage all
    stay constant (measured on pyspark 4.1.2: 0.3 s/round through
    round 15, then 0.6/1.2/3.0/7.1/22 s; single-reference chains such
    as the SSSP frontier loop run 300+ rounds flat, and neither
    ``spark.sql.adaptive.enabled=false``,
    ``spark.sql.constraintPropagation.enabled=false``, reliable
    ``checkpoint()``, nor checkpointing the self-join's right side
    separately avoids it).  Rebuilding the frame from its own JavaRDD
    first gives ``localCheckpoint`` a bare ExternalRDD scan to wrap —
    nothing from the join chain survives — and 30-round self-join
    loops then run flat.  The rebuild is one distributed JVM-side
    encoder pass (InternalRow -> Row -> InternalRow); no data touches
    the driver or Python.
    """
    spark = df.sparkSession
    if not hasattr(spark, "_jsparkSession") or not hasattr(df, "_jdf"):
        # Spark Connect: py4j internals absent.  Plain localCheckpoint
        # keeps correctness; only the flat-self-join-loop perf
        # mitigation is lost.
        return df.localCheckpoint(eager=eager)
    jdf = spark._jsparkSession.createDataFrame(df._jdf.javaRDD(), df._jdf.schema())
    return DataFrame(jdf, spark).localCheckpoint(eager=eager)


class FixpointProbe:
    """Signature-based fixpoint detection with an exact confirmation.

    Cheap path (every round): ONE tiny aggregate — row count plus a
    64-bit xor-folded ``xxhash64`` over ALL tracked columns, key
    columns included (an order-insensitive multiset signature that
    cannot overflow under ANSI mode).  A bare signature match could in
    principle be a collision (~2**-64 per round) silently stopping a
    fixpoint one round early with wrong labels, so ``converged``
    CONFIRMS every signature match with an exact multiset comparison
    (``exceptAll`` against the previous round's checkpointed frame,
    ``limit(1).count()``) before declaring convergence.  The exact
    check runs only on a signature match — normally exactly once per
    loop — so the steady-state cost stays one aggregate per round.

    Callers MUST pass materialized (checkpointed) frames: the probe
    retains a reference to the previous frame for the exact check.
    """

    def __init__(self, *cols: str):
        self._cols = list(cols)
        self._prev_sig: tuple | None = None
        self._prev_df: DataFrame | None = None

    def converged_with(self, df: DataFrame, **aggs):
        """``converged()`` plus caller aggregates in the SAME single
        action: returns ``(done, row)`` where ``row`` carries each
        keyword aggregate by name.  For loops that need a per-round
        statistic anyway (ANF's ball-size sum), this folds the probe
        and the statistic into one job per round instead of two —
        signature/confirm semantics identical to ``converged``."""
        hashed = df.withColumn(
            "_fp_h", F.xxhash64(*[F.col(c) for c in self._cols])
        )
        row = hashed.agg(
            F.count(F.lit(1)).alias("_fp_n"),
            F.expr("bit_xor(_fp_h)").alias("_fp_sig"),
            *[a.alias(k) for k, a in aggs.items()],
        ).collect()[0]
        proj = df.select(*self._cols)
        sig = (row["_fp_n"], row["_fp_sig"])
        done = (
            sig == self._prev_sig
            and self._prev_df is not None
            and proj.exceptAll(self._prev_df).limit(1).count() == 0
        )
        self._prev_sig = sig
        self._prev_df = proj
        return done, row

    def converged(self, df: DataFrame) -> bool:
        done, _ = self.converged_with(df)
        return done


def layer_cost(
    base, multipliers: dict[str, float], default: float = 1.0,
    layer_col: str = "_layer",
) -> F.Column:
    """Cross-layer routing cost: ``base * multiplier(layer)``.

    Multi-layer graphs carry edges from several source layers
    (``_layer`` = filename stem on ingest, geojson.py); routing
    profiles weight them differently — e.g. a wheelchair profile
    penalizing ``crossing`` edges 3x over ``sidewalk`` edges.  This is
    the reference's callable-cost extension point (README.md:3-7 — the
    UDF-based graph interpretation that became unweaver) expressed as a
    pure Catalyst CASE expression: pass the result as ``weight=`` to
    any SparkGraph traversal; it stays in whole-stage codegen, nothing
    Python runs per row.

    ``base``: column name or Column for the base cost (e.g.
    ``"_length"``).  Unlisted layers get ``default``.
    """
    b = F.col(base) if isinstance(base, str) else base
    expr = F.lit(default)
    for name, m in sorted(multipliers.items()):
        expr = F.when(F.col(layer_col) == name, F.lit(float(m))).otherwise(expr)
    return (b.cast("double") * expr).alias("_layer_cost")


class SparkGraph:
    """A directed property graph over (nodes_df, edges_df).

    Parity surface: DiGraphDBView/DiGraphDB
    (/root/reference/entwiner/graphs/digraphdb/__init__.py:16-167).
    """

    def __init__(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        partitions: int | None = None,
        _pre_partitioned: bool = False,
    ):
        self.spark: SparkSession = edges.sparkSession
        n = partitions or int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        # Co-locate adjacency: all out-edges of a node in one partition.
        self.edges = edges if _pre_partitioned else edges.repartition(n, "_u")
        # pre-repartition handle for operators that need the edge table
        # under a DIFFERENT key (to_linegraph's left side re-keys on
        # _v): shuffling the raw input straight to the target key skips
        # a wasted pass through the _u exchange (plan-asserted in
        # test_linegraph_single_side_exchange)
        self._edges_raw = edges
        self.nodes = nodes

    # ---- cardinality (A1/A3) ------------------------------------------
    def size(self, weight: str | None = None) -> float:
        """Edge count, or sum of an edge attribute if ``weight`` given
        (parity: DiGraphDBView.size, graphs/digraphdb/__init__.py:62-66)."""
        if weight is None:
            return self.edges.count()
        return self.edges.agg(F.sum(weight)).collect()[0][0]

    def order(self) -> int:
        return self.nodes.count()

    # ---- point lookups (P2-P8) ----------------------------------------
    def get_edge(self, u: str, v: str) -> DataFrame:
        return self.edges.filter((F.col("_u") == u) & (F.col("_v") == v))

    def get_node(self, n: str) -> DataFrame:
        return self.nodes.filter(F.col("_n") == n)

    def has_node(self, n: str) -> bool:
        return bool(self.nodes.filter(F.col("_n") == n).limit(1).count())

    def node_attrs(self, n: str) -> dict:
        """Strict node lookup -> attribute dict; raises NodeNotFound on
        miss (parity: NodeTable.get_node,
        /root/reference/entwiner/geopackagenetwork/node_table.py:13-25)."""
        from entwiner_spark.exceptions import NodeNotFound

        rows = self.get_node(n).limit(1).collect()
        if not rows:
            raise NodeNotFound(n)
        d = rows[0].asDict(recursive=True)
        d.pop("_n", None)
        return d

    def edge_attrs(self, u: str, v: str) -> dict:
        """Strict edge lookup -> attribute dict; raises EdgeNotFound
        (parity: EdgeTable.get_edge, edge_table.py:136-145)."""
        from entwiner_spark.exceptions import EdgeNotFound

        rows = self.get_edge(u, v).limit(1).collect()
        if not rows:
            raise EdgeNotFound(f"({u}, {v})")
        d = rows[0].asDict(recursive=True)
        d.pop("_u", None)
        d.pop("_v", None)
        return d

    def successors(self, n: str) -> DataFrame:
        return self.edges.filter(F.col("_u") == n)

    def predecessors(self, n: str) -> DataFrame:
        return self.edges.filter(F.col("_v") == n)

    def successor_nodes(self, n: str | None = None) -> DataFrame:
        if n is None:
            return self.edges.select("_v").distinct()
        return self.edges.filter(F.col("_u") == n).select("_v")

    def predecessor_nodes(self, n: str | None = None) -> DataFrame:
        if n is None:
            return self.edges.select("_u").distinct()
        return self.edges.filter(F.col("_v") == n).select("_u")

    # ---- degrees (A2, corrected semantics) ----------------------------
    def out_degree(self) -> DataFrame:
        return self.edges.groupBy("_u").agg(
            F.count_distinct("_v").alias("out_degree")
        )

    def in_degree(self) -> DataFrame:
        return self.edges.groupBy("_v").agg(
            F.count_distinct("_u").alias("in_degree")
        )

    def neighbor_jaccard(self, min_common: int = 1) -> DataFrame:
        """Out-neighborhood Jaccard similarity for node pairs sharing at
        least ``min_common`` successors — the classic link-prediction /
        role-similarity feature.

        No all-pairs scan: candidate pairs come from the common-
        neighbor self-equi-join on the successor (wedge enumeration —
        the same join triangle counting uses), so disconnected
        neighborhoods never meet.  Returns (u1, u2, common, jaccard)
        with u1 < u2.  At 100 TB the wedge join is the cost driver —
        high-degree hubs fan out quadratically; cap or sample hub
        neighborhoods upstream if the degree distribution is heavy.
        """
        adj = self.edges.select("_u", "_v").distinct()
        a, b = adj.alias("a"), adj.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a._v") == F.col("b._v")) & (F.col("a._u") < F.col("b._u")),
            )
            .groupBy(F.col("a._u").alias("u1"), F.col("b._u").alias("u2"))
            .agg(F.count(F.lit(1)).alias("common"))
            .filter(F.col("common") >= min_common)
        )
        deg = adj.groupBy("_u").agg(F.count(F.lit(1)).alias("deg"))
        return (
            pairs.join(deg.select(F.col("_u").alias("u1"), F.col("deg").alias("_d1")), "u1")
            .join(deg.select(F.col("_u").alias("u2"), F.col("deg").alias("_d2")), "u2")
            .select(
                "u1",
                "u2",
                "common",
                F.round(
                    F.col("common")
                    / (F.col("_d1") + F.col("_d2") - F.col("common")).cast("double"),
                    6,
                ).alias("jaccard"),
            )
        )

    def adamic_adar(self, min_common: int = 1) -> DataFrame:
        """Adamic-Adar link-prediction score: sum over common successors
        w of 1/ln(in_degree(w)) — rare shared neighbors weigh more.

        Same wedge-enumeration shape as neighbor_jaccard, with the
        shared neighbor's inverse-log in-degree joined onto the wedge
        before the pair aggregation.  Neighbors with in-degree 1 are
        excluded (1/ln(1) diverges; a neighbor reachable from only one
        node cannot be shared anyway).
        """
        adj = self.edges.select("_u", "_v").distinct()
        indeg = adj.groupBy("_v").agg(F.count(F.lit(1)).alias("_wdeg"))
        a, b = adj.alias("a"), adj.alias("b")
        wedges = a.join(
            b,
            (F.col("a._v") == F.col("b._v")) & (F.col("a._u") < F.col("b._u")),
        ).select(
            F.col("a._u").alias("u1"),
            F.col("b._u").alias("u2"),
            F.col("a._v").alias("_w"),
        )
        return (
            wedges.join(
                indeg.filter(F.col("_wdeg") > 1).select(
                    F.col("_v").alias("_w"), F.col("_wdeg")
                ),
                "_w",
            )
            .groupBy("u1", "u2")
            .agg(
                F.count(F.lit(1)).alias("common"),
                F.round(F.sum(F.lit(1.0) / F.log(F.col("_wdeg"))), 6).alias("aa_score"),
            )
            .filter(F.col("common") >= min_common)
        )

    # ---- motif / pattern matching -------------------------------------
    def find(
        self,
        pattern: str,
        vertex_structs: bool = False,
        anchors: dict[str, str] | None = None,
    ) -> DataFrame:
        """GraphFrames-style motif finding via binding joins.

        Grammar (a subset of GraphFrames'): semicolon-separated edge
        terms ``(a)-[e]->(b)``; empty parens/brackets are anonymous;
        ``!(a)-[]->(b)`` negates (the edge must NOT exist — both
        endpoints must be bound by positive terms, the edge unnamed).

        >>> g.find("(a)-[e]->(b); (b)-[e2]->(c)")        # 2-hop paths
        >>> g.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")  # open wedges

        Returns one STRING column per named vertex (the node id) and
        one STRUCT column per named edge (the full edge row — access
        attrs as ``F.col("e.w")``).  The core plan is edge-only;
        ``vertex_structs=True`` (GraphFrames-shaped output) replaces
        each vertex id column with a struct of the full node row — one
        extra equi-join with the node table per named vertex, AQE
        broadcasts it when small.

        ``anchors={"a": "7"}`` pins named vertices to fixed node ids
        (GraphFrames' filter-on-id idiom as a first-class argument).
        Each anchor is applied as an equality filter the moment its
        vertex is first bound — BEFORE later joins — so an anchored
        traversal scans one neighborhood, not the whole edge table,
        and Catalyst pushes the literal predicate into the scan.

        Plan shape: each positive term is one equi-join of the edge
        table on the shared bound vertices (wedge-join discipline —
        same as neighbor_jaccard/triangle_count), each negated term one
        LEFT ANTI join.  Every non-first positive term MUST share a
        bound vertex with earlier terms: a disconnected pattern would
        be a cross product and is rejected — at 100 TB that plan is a
        bug, not a feature.  AQE handles skewed join keys; hub-degree
        fan-out is the cost driver exactly as in the wedge operators.
        """
        import re

        term_re = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")
        terms = []
        for raw in pattern.split(";"):
            t = raw.strip()
            if not t:
                continue
            m = term_re.match(t)
            if not m:
                raise ValueError(
                    f"unparseable motif term {t!r}; expected "
                    "'(a)-[e]->(b)' or '!(a)-[]->(b)'"
                )
            neg, u, e, v = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
            if neg and e:
                raise ValueError(
                    f"negated term {t!r} cannot bind an edge name: a "
                    "non-existent edge has no attributes"
                )
            terms.append((neg, u or None, e or None, v or None))
        if not any(not neg for neg, *_ in terms):
            raise ValueError("pattern needs at least one positive term")
        anchors = dict(anchors or {})
        named = {n for _, u, _, v in terms for n in (u, v) if n}
        unknown = set(anchors) - named
        if unknown:
            raise ValueError(
                f"anchors for unbound vertex names: {sorted(unknown)}; "
                f"pattern binds {sorted(named)}"
            )

        cur: DataFrame | None = None
        bound: list[str] = []  # vertex names in first-appearance order
        edge_names: list[str] = []
        for i, (neg, u, e, v) in enumerate(terms):
            uc, vc, ec = f"__u{i}", f"__v{i}", f"__e{i}"
            t = self.edges.select(
                F.col("_u").alias(uc),
                F.col("_v").alias(vc),
                *([F.struct("*").alias(ec)] if e else []),
            )
            if neg:
                if cur is None or u not in bound or v not in bound:
                    raise ValueError(
                        f"negated term !({u})-[]->({v}) requires both "
                        "endpoints bound by earlier positive terms"
                    )
                cur = cur.join(
                    t,
                    (F.col(u) == F.col(uc)) & (F.col(v) == F.col(vc)),
                    "left_anti",
                )
                continue
            if u and v and u == v:
                t = t.filter(F.col(uc) == F.col(vc))
            if cur is None:
                cur = t
            else:
                conds = []
                if u in bound:
                    conds.append(F.col(u) == F.col(uc))
                if v in bound:
                    conds.append(F.col(v) == F.col(vc))
                if not conds:
                    raise ValueError(
                        f"term ({u})-[{e or ''}]->({v}) shares no bound "
                        "vertex with earlier terms; a disconnected "
                        "pattern is a cross product — split the query "
                        "or bind a shared vertex"
                    )
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                cur = cur.join(t, cond)
            # install new bindings / drop anonymous columns
            renames, drops = {}, []
            for name, col in ((u, uc), (v, vc)):
                if name and name not in bound:
                    if name in edge_names:
                        # would shadow an edge-struct column -> opaque
                        # AMBIGUOUS_REFERENCE downstream
                        raise ValueError(f"duplicate element name {name!r}")
                    renames[col] = name
                    bound.append(name)
                elif col not in renames:
                    drops.append(col)
            if e:
                if e in edge_names or e in bound:
                    raise ValueError(f"duplicate element name {e!r}")
                renames[ec] = e
                edge_names.append(e)
            cur = cur.withColumnsRenamed(renames).drop(*drops)
            for name in renames.values():
                if name in anchors:
                    cur = cur.filter(F.col(name) == F.lit(anchors[name]))
        out = cur.select(*bound, *edge_names)
        if vertex_structs:
            for name in bound:
                n = self.nodes.select(
                    F.col("_n").alias(f"__k_{name}"),
                    F.struct("*").alias(f"__s_{name}"),
                )
                out = (
                    out.join(n, F.col(name) == F.col(f"__k_{name}"), "left")
                    .drop(name, f"__k_{name}")
                    .withColumnRenamed(f"__s_{name}", name)
                )
            out = out.select(*bound, *edge_names)
        return out

    # ---- spatial passthrough (graphs/digraphdb/__init__.py:84-86) -----
    def edges_dwithin(
        self, lon: float, lat: float, distance: float, sort: bool = False
    ) -> DataFrame:
        return spatial.dwithin(self.edges, lon, lat, distance, sort=sort)

    # ---- caching (S8: to_in_memory, graphs/digraphdb/__init__.py:88-93)
    def to_in_memory(self) -> "SparkGraph":
        """Cache both tables, keeping the existing _u hash partitioning
        (re-invoking the partitioning constructor would put a fresh
        shuffle on top of the cache for every downstream query)."""
        return SparkGraph(
            self.nodes.cache(), self.edges.cache(), _pre_partitioned=True
        )

    # ---- routing: Pregel-style SSSP -----------------------------------

    #: below this edge count, iterative algorithms collect the edge
    #: list and run driver-side — per-iteration job-scheduling overhead
    #: dwarfs the work for small graphs (the reference's entire scale
    #: envelope fits here; the Pregel path is for graphs that don't).
    LOCAL_THRESHOLD = 100_000

    #: separate (higher) bound for driver-side LABEL tables: a relabel
    #: row is two short strings (~100 B), so 500k rows is ~50 MB — a
    #: cheap collect that replaces O(log depth) distributed self-joins.
    #: Edge lists hit LOCAL_THRESHOLD long before labels hit this.
    RELABEL_LOCAL_THRESHOLD = 500_000

    #: SCC strategy="auto" selector (r9 verdict task #3): coloring
    #: passes run first and SAMPLE the condensation peel rate — after
    #: SCC_PROBE_PASSES passes, estimated remaining passes =
    #: remaining_nodes / nodes_peeled_last_pass; at or above
    #: SCC_SWITCH_DEPTH the remainder switches to recursive FW-BW.
    #: Why sample the peel sequence instead of a subgraph: node/edge
    #: sampling provably destroys the single bridge edges that MAKE a
    #: condensation deep (a p-rate sample keeps each bridge with
    #: probability ~p², so a 100-deep chain samples as depth ~1),
    #: while the first few coloring passes peel real SCCs — paid-for
    #: progress — and their peel rate IS the depth statistic.  The
    #: threshold comes from the measured r9 crossover (PLANS.md):
    #: fwbw levels ~ 2·log2(depth) at ~3x per-level cost vs coloring's
    #: one pass per chain SCC, so fwbw wins once depth > ~6·log2(depth)
    #: — break-even ≈ 30; probed estimates overshoot on irregular SCC
    #: sizes, which only costs a constant (fwbw stays correct).
    SCC_PROBE_PASSES = 4
    SCC_SWITCH_DEPTH = 32

    def _edge_count(self) -> int:
        if not hasattr(self, "_cached_edge_count"):
            self._cached_edge_count = self.edges.count()
        return self._cached_edge_count

    @staticmethod
    def _triples_key(weight):
        """Cache key for a probed triple list: hop counts and named
        columns are stable keys; arbitrary Column expressions are not
        hashable/comparable, so they bypass the cache."""
        if weight is None:
            return "\x00hop"
        if isinstance(weight, str):
            return ("col", weight)
        return None

    def _probe_local_triples(self, weight) -> list | None:
        """ONE bounded job replacing the auto-dispatch's count()-then-
        collect() pair: fetch at most LOCAL_THRESHOLD+1 ``(_u,_v,_w)``
        rows via limit().  A local-sized edge table comes back whole
        (the exact count is cached as a byproduct); a larger one
        returns None and the too-big verdict is remembered so later
        dispatches cost nothing.  Probing ``_edges_raw`` (the
        pre-repartition handle) matters at scale: a limit over the
        repartitioned plan would execute the full map side of the _u
        exchange, while the raw scan short-circuits after ~one split.
        """
        if getattr(self, "_nonlocal_verdict", False):
            return None
        cnt = getattr(self, "_cached_edge_count", None)
        if cnt is not None and cnt > self.LOCAL_THRESHOLD:
            return None
        key = self._triples_key(weight)
        cache = self.__dict__.setdefault("_triples_cache", {})
        if key is not None and key in cache:
            return cache[key]
        w = self._weight_col(weight)
        rows = (
            self._edges_raw.select("_u", "_v", w.alias("_w"))
            .limit(self.LOCAL_THRESHOLD + 1)
            .collect()
        )
        if len(rows) > self.LOCAL_THRESHOLD:
            self._nonlocal_verdict = True
            return None
        self._cached_edge_count = len(rows)
        triples = [(r["_u"], r["_v"], r["_w"]) for r in rows]
        if key is not None:
            cache[key] = triples
        return triples

    def _invalidate_size_caches(self) -> None:
        """Drop memoized size/triple state after an in-place edge swap
        (mutable nx views) so dispatch and local twins never read a
        stale snapshot."""
        for attr in ("_cached_edge_count", "_nonlocal_verdict", "_triples_cache"):
            self.__dict__.pop(attr, None)

    def _use_local(self, strategy: str, weight=None) -> bool:
        """Dispatch gate.  For ``auto`` this runs the bounded triple
        probe (one job) instead of a full count, and the probed rows
        are cached so the local twin's _collect_triples re-uses them —
        the count job disappears from every auto-dispatched local
        operator."""
        if strategy == "local":
            return True
        if strategy == "pregel":
            return False
        if strategy != "auto":
            # "fwbw" is valid ONLY for strongly_connected_components,
            # which dispatches before reaching here; anything else
            # must fail loudly rather than silently picking a path
            raise ValueError(
                f"unknown strategy {strategy!r}: expected auto|local|pregel"
            )
        cnt = getattr(self, "_cached_edge_count", None)
        if cnt is not None:
            return cnt <= self.LOCAL_THRESHOLD
        return self._probe_local_triples(weight) is not None

    def _id_type(self) -> T.DataType:
        """Node-id datatype, derived from the nodes table — every
        result/seed schema that carries a node id uses this instead of
        a hardcoded StringType so a ``relabel_ids()`` graph (8-byte
        long keys) runs the same operators unchanged (reference
        TODO.md "(Re-)Defining node and edge keys")."""
        return self.nodes.schema["_n"].dataType

    @staticmethod
    def _weight_col(weight):
        """Edge-cost resolution (SURVEY.md §2.13): an attribute name, a
        Column expression (the reference's callable-cost analogue —
        e.g. built from pyspark.sql.functions or a pandas_udf), or
        None for hop counts."""
        if weight is None:
            return F.lit(1.0)
        if isinstance(weight, str):
            return F.col(weight).cast("double")
        return weight.cast("double")

    def _collect_triples(self, weight) -> list[tuple[str, str, float]]:
        # serve from the dispatch probe's stash when it matches — the
        # auto path then costs exactly one driver job end to end
        key = self._triples_key(weight)
        cache = self.__dict__.setdefault("_triples_cache", {})
        if key is not None and key in cache:
            return cache[key]
        w = self._weight_col(weight)
        triples = [
            (r["_u"], r["_v"], r["_w"])
            for r in self.edges.select("_u", "_v", w.alias("_w")).collect()
        ]
        if key is not None and len(triples) <= self.LOCAL_THRESHOLD:
            cache[key] = triples
        return triples

    def _local_sssp(self, source: str, weight: str | None) -> DataFrame:
        """Driver-side Dijkstra — identical additions to the Pregel
        path (dist[u] + w along the shortest path), so results are
        bit-equal."""
        import heapq

        adj: dict[str, list[tuple[str, float]]] = {}
        for u, v, w in self._collect_triples(weight):
            adj.setdefault(u, []).append((v, w))
        dist: dict[str, float] = {source: 0.0}
        pq = [(0.0, source)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        return self.spark.createDataFrame(list(dist.items()), schema)

    # ---- public message-passing primitives (§2.11 extension surface) --
    def _edge_triplet_base(self) -> DataFrame:
        """``(_u, _v, edge struct)`` projection of the edge table —
        the per-superstep join base.  ``pregel`` persists ONE instance
        across all rounds (cache, not checkpoint: a checkpoint would
        erase the plan's hashpartitioning(_u) and force a re-shuffle
        of the big side every round — the SSSP adjacency discipline)."""
        attr_cols = [c for c in self.edges.columns if c not in ("_u", "_v")]
        edge_struct = (
            F.struct(*[F.col(c) for c in attr_cols])
            if attr_cols
            else F.struct(F.lit(True).alias("_none"))
        )
        return self.edges.select("_u", "_v", edge_struct.alias("edge"))

    def aggregate_messages(
        self,
        agg,
        *,
        msg_to_dst=None,
        msg_to_src=None,
        state: DataFrame | None = None,
        uses=None,
        _base: DataFrame | None = None,
    ) -> DataFrame:
        """One message-passing superstep over the edge set: returns
        ``(_n, <agg columns>)`` — the GraphFrames ``aggregateMessages``
        shape, the public equivalent of the reference's "any algorithm
        over the adjacency protocol" extension point (ref
        graphs/digraphdb/__init__.py:16-93, README.md:66-74).

        ``msg_to_dst`` / ``msg_to_src`` are Column expressions over
        the triplet structs ``src`` / ``dst`` (the node-state columns
        of the edge's endpoints) and ``edge`` (the edge attribute
        columns); each generates one message per edge, delivered to
        the edge's destination / source node.  ``agg`` is a dict
        ``{out_col: aggregate Column over F.col("msg")}`` (a bare
        Column means ``{"agg": ...}``).  Nodes receiving no messages
        are ABSENT from the result — left-join it back onto the state
        to carry defaults (``pregel`` does this for you).

        Scale shape: state is joined onto the ``_u``-partitioned edge
        table (src side reuses the construction-time partitioning with
        no extra exchange; dst side shuffles on ``_v`` only when a
        message expression actually references ``dst``), then ONE
        partially-aggregated groupBy on the recipient id — so each
        superstep is at most two shuffles of ``|V|``-scale rows, never
        an edge-table rewrite.  Which triplet sides are joined is
        sniffed from the expression strings; pass ``uses`` (iterable
        of ``"src"``/``"dst"``) to override the sniff.
        """
        if msg_to_dst is None and msg_to_src is None:
            raise ValueError("provide msg_to_dst and/or msg_to_src")
        state = state if state is not None else self.nodes
        agg = {"agg": agg} if not isinstance(agg, dict) else agg
        exprs = [str(e) for e in (msg_to_dst, msg_to_src) if e is not None]
        if uses is None:
            # sniff which triplet sides the message expressions touch
            # from their rendered form: matches field access in both
            # spellings (F.col("src.h") renders src.h, F.col("src")["h"]
            # renders src[h]) AND whole-struct references (F.col("src")
            # renders as the bare token).  \b keeps src_id/dst_key from
            # matching; an edge attr literally named src/dst still
            # triggers a spurious (harmless) state join — pass ``uses``
            # to override, and an unresolvable reference raises below
            # with that hint.
            uses = {
                s
                for s in ("src", "dst")
                if any(re.search(rf"\b{s}\b", x) for x in exprs)
            }
        else:
            uses = set(uses)
        t = _base if _base is not None else self._edge_triplet_base()
        state_attrs = [c for c in state.columns if c != "_n"]
        state_struct = (
            F.struct(*[F.col(c) for c in state_attrs])
            if state_attrs
            else F.struct(F.lit(True).alias("_none"))
        )
        # shuffle_hash hint on the (checkpointed, stats-less) state
        # side: the |V|-row state becomes the build side and shuffles
        # onto the edge table's construction-time hashpartitioning(_u)
        # — the (persisted) edge side never exchanges, and the planner
        # can't fall back to sort-merge-joining BOTH sides per
        # superstep (the iterative-loop pathology the SSSP frontier
        # loop documents)
        if "src" in uses:
            t = t.join(
                state.select(F.col("_n").alias("_u"), state_struct.alias("src"))
                .hint("shuffle_hash"),
                "_u",
            )
        if "dst" in uses:
            t = t.join(
                state.select(F.col("_n").alias("_v"), state_struct.alias("dst"))
                .hint("shuffle_hash"),
                "_v",
            )
        msgs = []
        try:
            if msg_to_dst is not None:
                msgs.append(
                    t.select(F.col("_v").alias("_n"), msg_to_dst.alias("msg"))
                )
            if msg_to_src is not None:
                msgs.append(
                    t.select(F.col("_u").alias("_n"), msg_to_src.alias("msg"))
                )
        except AnalysisException as e:
            raise AnalysisException(
                f"aggregate_messages could not resolve a message "
                f"expression against the triplet (sniffed sides: "
                f"{sorted(uses) or 'none'}).  If the expression "
                f"references src/dst in a form the sniff misses, pass "
                f"uses=('src',), ('dst',) or ('src','dst') explicitly. "
                f"Original: {e}"
            ) from e
        m = msgs[0] if len(msgs) == 1 else msgs[0].unionByName(msgs[1])
        return m.groupBy("_n").agg(*[a.alias(n) for n, a in agg.items()])

    def pregel(
        self,
        state: DataFrame,
        agg,
        update,
        *,
        msg_to_dst=None,
        msg_to_src=None,
        uses=None,
        max_iterations: int = 20,
        halt=None,
        check_every: int = 1,
        rebase_every: int = 5,
    ) -> DataFrame:
        """Iterate ``aggregate_messages`` to a fixpoint (Pregel /
        GraphFrames-Pregel shape) with the tuned checkpoint cadence
        built in; returns the final state ``(_n, <state cols>)``.

        Per round: one superstep (see ``aggregate_messages``), a left
        join of the aggregated messages back onto the state spine
        (nodes with no messages see NULL agg columns), then
        ``update(df) -> DataFrame`` — a callable receiving ``(_n,
        <state cols>, <agg cols>)`` and returning the next state with
        exactly the original state columns.  An update that declares a
        SECOND positional parameter instead receives ``update(df,
        prev)`` where ``prev`` is the CHECKPOINTED previous state:
        any per-round driver-side aggregate the update needs (e.g.
        PageRank's dangling mass) must run on ``prev``, not on ``df``
        — ``df`` embeds the un-materialized superstep, so aggregating
        it executes the full join+shuffle round twice (once for the
        aggregate, again when the new state checkpoints).  Lineage is truncated
        every round (plain ``localCheckpoint``; every ``rebase_every``
        rounds a ``rebase_checkpoint`` severs carried provenance so
        update functions that self-join the state stay flat — see
        ``rebase_checkpoint``).

        ``halt``: ``None`` (default) stops when the state stops
        changing — detected by a per-round 64-bit signature with an
        EXACT multiset confirmation on match (``FixpointProbe``), so a
        hash collision cannot end the loop early; ``False`` runs all
        ``max_iterations`` (fixed-round algorithms); a callable
        ``(old_state, new_state) -> bool`` implements custom
        tolerance-style convergence, probed every ``check_every``
        rounds.

        A size-derived ``scoped_shuffle_partitions`` wrapper around
        this loop was A/B-measured in r16 and NOT adopted: pregel
        users' per-round state is the full node spine joined against
        the triplet base (~|E| rows through every round's shuffles),
        where AQE's runtime coalescing already sizes the partitions —
        LPA/CC/kcore fixtures at 100-200k nodes timed identical with
        and without the wrapper (5.8-6.3 s LPA, 36.8/36.9 s CC), unlike
        the SSSP/CH loops whose shuffled state is a wavefront-sized
        spine.  Float-sum users (pagerank, betweenness) additionally
        must not change partial-aggregate grouping (last-ulp results).
        """
        state_cols = list(state.columns)
        agg_names = {"agg"} if not isinstance(agg, dict) else set(agg)
        clash = agg_names & set(state_cols)
        if clash:
            raise ValueError(
                f"aggregate column name(s) {sorted(clash)} collide with "
                "state columns — the update callable's joined frame "
                "would be ambiguous; rename the aggregate(s)"
            )
        try:
            params = list(inspect.signature(update).parameters.values())
            positional = [
                p
                for p in params
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            ]
            # prev-state is passed ONLY to an update taking exactly two
            # REQUIRED positional parameters: a defaulted second param
            # (def update(df, verbose=False)) or *args must not receive
            # a DataFrame silently bound to an unrelated name
            wants_prev = (
                len([p for p in positional if p.default is p.empty]) == 2
            )
        except (TypeError, ValueError):
            wants_prev = False
        # probe-fold: when the signature probe runs right after the
        # checkpoint, a lazy checkpoint lets the probe's aggregate job
        # materialize the frame — one scheduled job per round, not two
        state = state.localCheckpoint(eager=halt is not None)
        probe = FixpointProbe(*state_cols) if halt is None else None
        if probe is not None:
            probe.converged(state)
        base = self._edge_triplet_base().persist()
        try:
            for it in range(max_iterations):
                msgs = self.aggregate_messages(
                    agg,
                    msg_to_dst=msg_to_dst,
                    msg_to_src=msg_to_src,
                    state=state,
                    uses=uses,
                    _base=base,
                )
                # shuffle_hash: both sides are ~|V| rows with unknown
                # stats after checkpointing — the hint spares the planner
                # a sort-merge fallback (two sorts per round)
                joined = state.join(msgs.hint("shuffle_hash"), "_n", "left_outer")
                new_state = update(joined, state) if wants_prev else update(joined)
                if set(new_state.columns) != set(state_cols):
                    raise ValueError(
                        f"update must return state columns {state_cols}, "
                        f"got {new_state.columns}"
                    )
                new_state = new_state.select(*state_cols)
                # rounds with a signature probe fold the checkpoint
                # materialization into the probe's aggregate job
                will_probe = halt is None or (
                    halt is not False
                    and ((it + 1) % check_every == 0 or it == max_iterations - 1)
                )
                if rebase_every and (it + 1) % rebase_every == 0:
                    new_state = rebase_checkpoint(new_state, eager=not will_probe)
                else:
                    new_state = new_state.localCheckpoint(eager=not will_probe)
                done = False
                if halt is None:
                    done = probe.converged(new_state)
                elif halt is not False and (
                    (it + 1) % check_every == 0 or it == max_iterations - 1
                ):
                    done = halt(state, new_state)
                state = new_state
                if done:
                    break
        finally:
            base.unpersist()
        return state

    def shortest_path_lengths(
        self,
        source: str,
        weight: str | None = None,
        max_iterations: int | None = None,
        checkpoint_every: int = 5,
        strategy: str = "auto",
        check_every: int = 3,
        stats: dict | None = None,
    ) -> DataFrame:
        """Single-source shortest distances: DataFrame ``(_n, dist)``.

        ``stats``: pass a dict to receive per-probe telemetry —
        ``stats["rounds"]`` becomes a list of ``{"it", "frontier",
        "sec"}`` (frontier size at each convergence probe and seconds
        since the previous probe; set ``check_every=1`` for per-round
        granularity).  Costs nothing extra: the probe already counts
        the frontier.

        ``weight=None`` -> hop counts (BFS); ``max_iterations`` bounds
        the hop radius (k-hop neighborhood) — None means run to
        convergence (safety cap 200).  Equivalent of driving
        nx.dijkstra over the lazy adjacency views (SURVEY.md §3.2), as a
        distributed Bellman-Ford/Pregel loop; small graphs short-cut to
        a driver-side Dijkstra (``strategy`` = auto|pregel|local).

        ``check_every`` batches the convergence check: between checks
        the expand+merge steps stay lazy (no driver actions), so a
        D-hop convergence costs ~D/check_every jobs instead of ~2D —
        on local[*] the per-job scheduling overhead dominates small
        iterations, and on a cluster it halves the driver round-trips.
        """
        bounded = max_iterations is not None
        if weight is not None and bounded:
            if strategy == "auto":
                # truncated *weighted* iteration has Bellman-Ford-step
                # semantics only the distributed loop reproduces
                strategy = "pregel"
            elif strategy == "local":
                raise ValueError(
                    "strategy='local' cannot honor max_iterations for "
                    "weighted graphs (local Dijkstra has no k-edge "
                    "Bellman-Ford bound); use strategy='pregel' or "
                    "drop max_iterations"
                )
        if self._use_local(strategy, weight):
            out = self._local_sssp(source, weight)
            if weight is None and bounded:
                # truncated BFS == k-hop neighborhood
                out = out.filter(F.col("dist") <= float(max_iterations))
            return out
        bounded_by_caller = max_iterations is not None
        if max_iterations is None:
            max_iterations = 200
        w = self._weight_col(weight)
        # cache (not checkpoint) the projected adjacency: a checkpoint
        # erases the plan's output partitioning, so every iteration's
        # frontier join would re-shuffle the full edge table; the
        # cached plan keeps its hashpartitioning(_u) visible and the
        # big side never exchanges again
        adj = self.edges.select(F.col("_u"), F.col("_v"), w.alias("_w")).persist()
        # Size the loop's per-round shuffle from the DATA, not the
        # session constant (guide §2.2: partitions should track bytes).
        # The state spine is <=|V|<=2|E| tiny rows; at 32 session
        # partitions a 100k-node graph pays 32 map outputs + AQE
        # coalesce planning PER ROUND for partitions holding a few
        # thousand rows each (measured 200k-edge/12-round loop: 3.7 s
        # session-default vs 2.7 s size-derived).  The count also
        # prefills the adj cache, a job round 1 otherwise pays.  At
        # scale ceil(|E|/25k) exceeds the session setting and this is
        # a no-op; values are partition-invariant (min-merge).
        n_edges = adj.count()
        # Re-caching adj at the size-derived width (fewer scan tasks
        # per round when the frontier is tiny) was A/B-measured in r16
        # and NOT adopted: a graph CONSTRUCTED at the derived width is
        # ~20% faster per query (4.3 s vs 5.0 s, 12 bounded rounds at
        # 200k edges), but resizing INSIDE the operator pays a
        # cache-to-cache copy per call that eats the savings (quiet
        # medians 4.33 s resized vs 3.76 s leaving the 32-partition
        # cache alone).  The construction-time `partitions=` knob is
        # the right place for that choice.

        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        dist = self.spark.createDataFrame([(source, 0.0)], schema)
        frontier = dist

        converged = False
        if stats is not None:
            stats["rounds"] = []
            _t_probe = time.time()
        # single-source start: the frontier is exactly one row, so the
        # first window always broadcasts; probes re-decide per window
        frontier_small = True
        broadcast_frontier_rows = 2_000_000
        from entwiner_spark.session import scoped_shuffle_partitions

        with scoped_shuffle_partitions(self.spark, n_edges):
            converged = self._sssp_pregel_loop(
                adj,
                dist,
                frontier,
                max_iterations,
                check_every,
                frontier_small,
                broadcast_frontier_rows,
                stats,
            )
        dist = converged["dist"]
        converged = converged["converged"]
        adj.unpersist()
        if not converged and not bounded_by_caller:
            raise RuntimeError(
                "SSSP hit the 200-iteration safety cap without "
                "converging; pass max_iterations explicitly for a "
                "bounded (k-hop) result or raise the cap"
            )
        return dist

    def _sssp_pregel_loop(
        self,
        adj,
        dist,
        frontier,
        max_iterations: int,
        check_every: int,
        frontier_small: bool,
        broadcast_frontier_rows: int,
        stats: dict | None,
    ) -> dict:
        """Body of the distributed SSSP iteration (split out so the
        caller can scope the size-derived shuffle-partition setting
        with a try/finally around exactly the rounds that shuffle)."""
        converged = False
        if stats is not None:
            _t_probe = time.time()
        for it in range(max_iterations):
            probe = (it + 1) % check_every == 0 or it == max_iterations - 1
            # Join-strategy hint, decided from the last probed
            # frontier size.  The checkpointed frontier has UNKNOWN
            # stats, so the static planner otherwise broadcasts the
            # cached ADJACENCY — re-serializing the entire edge table
            # to every executor every round (measured ~1 s/round at
            # 200k edges; at cluster scale it would simply OOM).
            # While the frontier is small (the common wavefront case)
            # we broadcast IT: the join runs map-side over adj's
            # cached hashpartitioning(_u) with zero exchanges
            # (measured 0.2-0.4 s/round vs 1-3 s).  If a probe sees
            # the frontier above the row cap, fall back to
            # shuffle_hash built on the frontier: adj still never
            # moves, only the frontier shuffles.
            hint = "broadcast" if frontier_small else "shuffle_hash"
            # Round body deliberately built with as FEW DataFrame
            # creations as possible: at small frontiers the loop is
            # driver-bound, and each intermediate DataFrame pays a
            # py4j hop plus an eager Catalyst analysis pass — fusing
            # the rename/select steps into the join and union cut the
            # measured plan-construction time from 1.4 s to 0.8 s over
            # 12 rounds (r16, §1.5 measure-first; job time unchanged).
            msgs = frontier.hint(hint).join(adj, frontier["_n"] == F.col("_u")).select(
                F.col("_v").alias("_n"),
                (frontier["dist"] + F.col("_w")).alias("dist"),
                F.lit(True).alias("_new"),
            )
            # ONE union+groupBy both merges messages into dist AND
            # derives the improved-flag — a single shuffle per round
            # (r1 used groupBy-min on msgs PLUS a full_outer merge
            # join: two shuffles and double the stages).  Improvement
            # detection: min over pre-merge rows only (_new=false);
            # a node improved iff it had no old dist or the global
            # min beats it — ties are NOT improvements, so equal-cost
            # paths can't re-expand forever.  Map-side partial agg
            # combines messages before the exchange, so at scale the
            # shuffle carries ~|V| rows, not |msgs|.
            merged = (
                dist.withColumn("_new", F.lit(False))
                .unionByName(msgs)
                .groupBy("_n")
                .agg(
                    F.min("dist").alias("dist"),
                    F.min(F.when(~F.col("_new"), F.col("dist"))).alias("_old"),
                )
                .select(
                    "_n",
                    "dist",
                    (F.col("_old").isNull() | (F.col("dist") < F.col("_old"))).alias("_imp"),
                )
            )
            # ONE checkpoint per round materializes the merge and
            # severs lineage, keeping every iteration's plan flat.
            # Two lazier cadences were measured and REJECTED on the
            # 200k-edge stress: lazy-uncached windows recompute 2^k
            # subtrees (4x worse), and persist()-ed windows with a
            # probe-boundary checkpoint pay memory-store overhead for
            # no job savings (25% worse than eager).  On PROBE rounds
            # the checkpoint is LAZY: the probe's frontier.count()
            # scans every partition of the merge anyway, so one
            # scheduled job both materializes the round and answers
            # the probe (r17 fold; non-probe rounds stay eager).
            merged = merged.localCheckpoint(eager=not probe)
            dist = merged.select("_n", "dist")
            frontier = merged.filter(F.col("_imp")).select("_n", "dist")
            if probe:
                # convergence probe batched: an empty frontier only
                # produces empty frontiers, so probing every k-th round
                # trades ≤k-1 cheap no-op rounds for k-1 fewer driver
                # actions; bounded (k-hop) runs still expand exactly
                # max_iterations times regardless of probe cadence.
                # count() (not isEmpty) doubles as the size signal for
                # the next window's join-strategy choice — it scans a
                # just-materialized checkpoint, no shuffle.
                n_front = frontier.count()
                if stats is not None:
                    now = time.time()
                    stats["rounds"].append(
                        {
                            "it": it,
                            "frontier": n_front,
                            "sec": round(now - _t_probe, 2),
                        }
                    )
                    _t_probe = now
                frontier_small = n_front < broadcast_frontier_rows
                if n_front == 0:
                    converged = True
                    break
        return {"dist": dist, "converged": converged}

    def shortest_path(
        self,
        source: str,
        target: str,
        weight: str | None = None,
        max_iterations: int | None = None,
        strategy: str = "auto",
        via: str = "raw",
        contracted: "SparkGraph | None" = None,
        heuristic=None,
        ch=None,
    ) -> tuple[list[str], float] | None:
        """Reconstructed path + total distance, or None if unreachable.

        ``heuristic``: optional A* lower bound — a callable mapping the
        node-id Column to a Column with an ADMISSIBLE estimate of the
        remaining cost to ``target`` (never overestimates; 0 at the
        target).  For ``weight="_length"`` street graphs the natural
        choice is :func:`entwiner_spark.functions.geo.
        haversine_heuristic` (straight-line distance ≤ any path).  Two
        effects, both pure frontier algebra: settled-but-hopeless
        frontier rows (``dist + h(_n) ≥`` the best target distance
        seen so far) are dropped BEFORE the expand join — on a street
        graph that stops the wavefront expanding away from the target,
        shrinking every per-round shuffle — and the goal-stop
        sharpens to ``min(dist + h) ≥ t_dist``, which fires rounds
        earlier than the plain ``min(dist)`` test.  Exactness is
        unchanged (standard A* argument: an admissible bound can only
        exclude nodes that cannot lie on a shorter route); an
        inadmissible heuristic silently returns suboptimal routes —
        caller's contract.  Local-strategy and ``via="contracted"``
        runs ignore it (minor-node ids are edge pairs; no geometric
        bound applies — pass ``strategy="pregel"`` to force the A*
        path).

        Path reconstruction collects only O(path length) rows.  Both
        strategies assume non-negative weights (local is Dijkstra; the
        Pregel loop goal-stops once the frontier cannot improve the
        target — the standard point-to-point early exit, invalid under
        negative weights).

        ``via="contracted"`` (reference TODO.md:72 "contraction
        hierarchies", composed end-to-end per the r11 verdict): route
        on the CH-lite chain-contracted minor instead of the raw
        graph — SSSP rounds scale with the minor's hop diameter (the
        measured 8x round cut on chain-heavy street graphs), then the
        route expands back to the raw node sequence via the recorded
        shortcut interiors.  Pass ``contracted`` (a
        ``contract_chains(weight=..., keep_path=True)`` graph — the
        build-once/route-many lifecycle) or one is built on the fly.
        Both endpoints must be RETAINED nodes (junctions/hubs);
        routing from an absorbed chain interior raises — CH-lite has
        no entry/exit shortcuts (the documented escalation).  Costs
        match the raw route exactly up to float association order
        (shortcut weights fold in doubling order).

        ``via="ch"`` (the r13 escalation PAST CH-lite): FULL
        contraction hierarchies (operators/ch.py) — every node
        contracted, bidirectional upward query, any endpoint routable
        (no retained-node restriction).  Pass ``ch`` (a built
        ``ContractionHierarchy``, the build-once/route-many form) or
        one is built on the fly with ``weight``."""
        if via == "ch":
            if ch is None:
                from entwiner_spark.operators.ch import (
                    ContractionHierarchy,
                )

                ch = ContractionHierarchy.build(self, weight=weight)
            return ch.route(
                source,
                target,
                strategy=strategy,
                **(
                    {"max_iterations": max_iterations}
                    if max_iterations is not None
                    else {}
                ),
            )
        if via == "contracted":
            c = contracted
            if c is None:
                c = self.contract_chains(weight=weight, keep_path=True)
            if "_via_path" not in c.edges.columns:
                raise ValueError(
                    "via='contracted' needs a contract_chains("
                    "keep_path=True) graph (no _via_path column)"
                )
            present = {
                r["_n"]
                for r in c.nodes.filter(
                    F.col("_n").isin([source, target])
                ).collect()
            }
            missing = [n for n in (source, target) if n not in present]
            if missing:
                raise ValueError(
                    f"endpoint(s) absorbed by contraction: {missing}; "
                    "via='contracted' routes between retained nodes "
                    "(chain interiors have no entry/exit shortcuts)"
                )
            r = c.shortest_path(
                source,
                target,
                weight="w",
                max_iterations=max_iterations,
                strategy=strategy,
            )
            if r is None:
                return None
            cpath, cost = r
            return c.expand_contracted_path(cpath), cost
        if via != "raw":
            raise ValueError(
                f"via must be 'raw', 'contracted' or 'ch', got {via!r}"
            )
        if self._use_local(strategy, weight):
            import heapq

            adj: dict[str, list[tuple[str, float]]] = {}
            for u, v, w in self._collect_triples(weight):
                adj.setdefault(u, []).append((v, w))
            dist: dict[str, float] = {source: 0.0}
            pred: dict[str, str | None] = {source: None}
            pq = [(0.0, source)]
            while pq:
                d, u = heapq.heappop(pq)
                if d > dist.get(u, float("inf")):
                    continue
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < dist.get(v, float("inf")):
                        dist[v], pred[v] = nd, u
                        heapq.heappush(pq, (nd, v))
            if target not in dist:
                return None
            path, cur = [], target
            while cur is not None:
                path.append(cur)
                cur = pred[cur]
            return path[::-1], dist[target]
        bounded_by_caller = max_iterations is not None
        if max_iterations is None:
            max_iterations = 200
        w = self._weight_col(weight)
        # persist (not checkpoint): keeps hashpartitioning(_u) visible
        # so the per-round join never moves the adjacency (see
        # shortest_path_lengths for the measured rationale)
        adj = self.edges.select(F.col("_u"), F.col("_v"), w.alias("_w")).persist()
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("dist", T.DoubleType(), False),
                T.StructField("pred", self._id_type(), True),
            ]
        )
        dist = self.spark.createDataFrame([(source, 0.0, None)], schema)
        frontier = dist
        converged = False
        frontier_small = True
        broadcast_frontier_rows = 2_000_000
        t_best = None  # best target distance seen at a probe (A* prune bound)
        for it in range(max_iterations):
            probe = (it + 1) % 3 == 0 or it == max_iterations - 1
            hint = "broadcast" if frontier_small else "shuffle_hash"
            fr = frontier.select(F.col("_n").alias("_fn"), F.col("dist").alias("_fd")).hint(hint)
            msgs = fr.join(adj, F.col("_fn") == F.col("_u")).select(
                F.col("_v").alias("_n"),
                (F.col("_fd") + F.col("_w")).alias("dist"),
                F.col("_fn").alias("pred"),
            )
            # fused union+groupBy merge (one shuffle — see
            # shortest_path_lengths): struct-min over (dist, _new,
            # pred) picks the best distance and, on exact dist ties,
            # prefers the OLD row (false < true), so equal-cost
            # re-discoveries never flag as improvements and the
            # frontier can't oscillate
            merged = (
                dist.select("_n", "dist", F.lit(False).alias("_new"), "pred")
                .unionByName(msgs.select("_n", "dist", F.lit(True).alias("_new"), "pred"))
                .groupBy("_n")
                .agg(F.min(F.struct("dist", "_new", "pred")).alias("best"))
                .select(
                    "_n",
                    F.col("best.dist").alias("dist"),
                    F.col("best.pred").alias("pred"),
                    F.col("best._new").alias("_imp"),
                )
                # probe rounds: lazy — the probe aggregate below both
                # materializes the round and answers the probe (fold)
                .localCheckpoint(eager=not probe)
            )
            dist = merged.select("_n", "dist", "pred")
            frontier = merged.filter(F.col("_imp")).select("_n", "dist")
            if heuristic is not None and t_best is not None:
                # A* prune: a frontier node whose settled distance plus
                # the admissible remaining-cost bound cannot beat the
                # best known target distance will never be on a better
                # route — drop it BEFORE the expand join (the bound is
                # the last probe's t_dist; pruning against a stale
                # upper bound is conservative, never wrong)
                frontier = frontier.filter(
                    F.col("dist") + heuristic(F.col("_n")) < F.lit(t_best)
                )
            if probe:
                # one aggregate over the just-materialized checkpoint
                # yields the emptiness check, the broadcast-size
                # signal, AND the goal-stopping test: with
                # non-negative weights, once every frontier distance
                # is >= the target's settled distance, no remaining
                # expansion can improve the target — stop instead of
                # flooding the rest of the graph (point-to-point
                # routes touch a neighborhood, not the whole network)
                fkey = (
                    F.col("dist") + heuristic(F.col("_n"))
                    if heuristic is not None
                    else F.col("dist")
                )
                st = merged.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_imp"), 1)), F.lit(0)
                    ).alias("n_front"),
                    # with a heuristic this is min(dist + h): the A*
                    # goal-stop fires as soon as no frontier f-value
                    # can undercut the target — rounds earlier than
                    # the plain min(dist) test
                    F.min(F.when(F.col("_imp"), fkey)).alias("f_min"),
                    F.min(F.when(F.col("_n") == target, F.col("dist"))).alias(
                        "t_dist"
                    ),
                ).collect()[0]
                frontier_small = st["n_front"] < broadcast_frontier_rows
                t_best = st["t_dist"]
                if st["n_front"] == 0 or (
                    st["t_dist"] is not None and st["f_min"] >= st["t_dist"]
                ):
                    converged = True
                    break
        adj.unpersist()
        if not converged and not bounded_by_caller:
            # mirror shortest_path_lengths: a silently truncated path
            # is worse than an error (ADVICE.md r1)
            raise RuntimeError(
                "shortest_path hit the 200-iteration safety cap "
                "without converging; pass max_iterations explicitly "
                "to accept a bounded (possibly suboptimal) result"
            )

        return self._reconstruct_path(dist, target)

    def _reconstruct_path(
        self, dist: DataFrame, target: str
    ) -> tuple[list[str], float] | None:
        """Walk the predecessor forest back from ``target`` in O(log L)
        jobs, not O(L) driver round-trips: binary-lifting ancestor
        closure.  Ancestors of ``target`` in the predecessor forest ==
        exactly the path nodes; grow the known-ancestor set with jump
        pointers of doubling power (1, 2, 4, ... hops), so a
        10,000-hop route needs ~14 rounds instead of 10,000 point
        lookups.  ``dist`` must have columns (_n, dist, pred)."""
        dist = dist.localCheckpoint(eager=True)
        t_rows = dist.filter(F.col("_n") == target).limit(1).collect()
        if not t_rows:
            return None
        anc = self.spark.createDataFrame(
            [(target,)], T.StructType([T.StructField("_n", self._id_type(), False)])
        )
        jump = dist.select("_n", "pred")  # power-1 pointers
        n_anc = 1
        for _ in range(40):  # 2^40 hops >> any real path
            ext = (
                anc.join(jump, "_n")
                .select(F.col("pred").alias("_n"))
                .filter(F.col("_n").isNotNull())
            )
            # lazy + count fold (one job materializes and probes)
            anc = anc.unionByName(ext).distinct().localCheckpoint(eager=False)
            new_n = anc.count()
            if new_n == n_anc:
                break
            n_anc = new_n
            # square the jump table: power 2^k -> 2^(k+1)
            jump = (
                jump.alias("a")
                .join(jump.alias("b"), F.col("a.pred") == F.col("b._n"), "left_outer")
                .select(F.col("a._n").alias("_n"), F.col("b.pred").alias("pred"))
                .localCheckpoint(eager=True)
            )
        rows = dist.join(anc, "_n").collect()  # O(path length) rows
        by_node = {r["_n"]: r for r in rows}
        total = by_node[target]["dist"]
        path, cur = [], target
        while cur is not None:
            path.append(cur)
            cur = by_node[cur]["pred"]
        return path[::-1], total

    def k_shortest_paths(
        self,
        source,
        target,
        k: int = 3,
        weight: str | None = None,
        strategy: str = "auto",
        via: str = "raw",
        contracted: "SparkGraph | None" = None,
    ) -> list[tuple[list, float]]:
        """k shortest LOOPLESS paths, best first — Yen's algorithm
        (the public 1971 construction; reference has no alternatives
        feature, this is the next thing a routing user asks for after
        point-to-point, r12-verdict task #6).  Returns up to ``k``
        ``(path, cost)`` pairs; fewer when the graph has fewer
        distinct simple routes.

        Each spur iteration re-runs ``shortest_path`` on a subgraph
        with the root prefix's nodes blocked and the previously-used
        continuation edges removed — both path-sized driver lists
        applied as one ``isin`` filter plus one broadcast anti-join,
        so every spur query keeps the full distributed machinery
        (including A*-style pruning when the caller's strategy
        enables it).  Cost: O(k · |path|) SSSP runs — alternatives
        are a per-route operation; at network scale run it
        ``via="contracted"`` (below) or on a relabeled graph.

        ``via="contracted"``: Yen runs ON the chain-contracted minor
        (build once via ``contracted=`` or on the fly), then each
        alternative expands back to raw nodes — valid because loopless
        raw paths between retained endpoints map 1:1 onto minor paths
        (a path cannot partially enter a chain and back out without
        revisiting its entry node).  Parallel-chain alternatives that
        share the SAME minor node sequence collapse to one route
        (node-path uniqueness, standard Yen semantics).
        """
        if k < 1:
            return []
        if via == "contracted":
            c = contracted
            if c is None:
                c = self.contract_chains(weight=weight, keep_path=True)
            if "_via_path" not in c.edges.columns:
                raise ValueError(
                    "via='contracted' needs a contract_chains("
                    "keep_path=True) graph (no _via_path column)"
                )
            present = {
                r["_n"]
                for r in c.nodes.filter(
                    F.col("_n").isin([source, target])
                ).collect()
            }
            missing = [n for n in (source, target) if n not in present]
            if missing:
                raise ValueError(
                    f"endpoint(s) absorbed by contraction: {missing}; "
                    "via='contracted' routes between retained nodes"
                )
            minor = c.k_shortest_paths(
                source, target, k=k, weight="w", strategy=strategy
            )
            return [
                (c.expand_contracted_path(p), cost) for p, cost in minor
            ]
        if via != "raw":
            raise ValueError(f"via must be 'raw' or 'contracted', got {via!r}")
        if self._use_local(strategy, weight):
            # one collect, then pure-Python Yen: k·|path| in-memory
            # Dijkstras instead of k·|path| Spark jobs (the stress
            # gate measured 202 s -> sub-second on a 3,600-node grid)
            return self._k_shortest_local(source, target, k, weight)
        first = self.shortest_path(
            source, target, weight=weight, strategy=strategy
        )
        if first is None:
            return []
        import heapq

        wcol = self._weight_col(weight)
        base = self.edges.select("_u", "_v", wcol.alias("_w"))
        idt = self._id_type()
        pair_schema = T.StructType(
            [T.StructField("_u", idt, False), T.StructField("_v", idt, False)]
        )

        def pair_weights(path):
            """Min parallel weight per consecutive pair (one filtered
            collect, path-sized — a shortest path never rides a
            non-min parallel edge)."""
            wanted = set(zip(path, path[1:]))
            out: dict = {}
            for r in base.filter(
                F.col("_u").isin(list(path)) & F.col("_v").isin(list(path))
            ).collect():
                kk = (r["_u"], r["_v"])
                if kk in wanted and (kk not in out or r["_w"] < out[kk]):
                    out[kk] = r["_w"]
            return out

        A: list[tuple[list, float]] = [first]
        B: list[tuple[float, tuple]] = []
        seen = {tuple(first[0])}
        from concurrent.futures import ThreadPoolExecutor

        while len(A) < k:
            prev = A[-1][0]
            pw = pair_weights(prev)
            prefix = [0.0]
            for a, b in zip(prev, prev[1:]):
                prefix.append(prefix[-1] + pw[(a, b)])

            def _spur(i):
                spur = prev[i]
                root = prev[: i + 1]
                removed = {
                    (p[i], p[i + 1])
                    for p, _c in A
                    if len(p) > i + 1 and p[: i + 1] == root
                }
                blocked = list(dict.fromkeys(root[:-1]))
                sub = base
                if blocked:
                    sub = sub.filter(
                        ~F.col("_u").isin(blocked)
                        & ~F.col("_v").isin(blocked)
                    )
                if removed:
                    rem = self.spark.createDataFrame(
                        sorted(removed), pair_schema
                    )
                    sub = sub.join(
                        F.broadcast(rem), ["_u", "_v"], "left_anti"
                    )
                # sub derives from the already-_u-partitioned edge
                # table via filter / broadcast anti-join, both of
                # which preserve the hash partitioning — skip the
                # constructor's repartition (one full edge shuffle
                # per spur otherwise; r13 ADVICE)
                g_sub = SparkGraph(self.nodes, sub, _pre_partitioned=True)
                return g_sub.shortest_path(
                    spur, target, weight="_w", strategy=strategy
                )

            # one Yen iteration's spur searches are independent (each
            # reads only A and prev, fixed before the loop) — overlap
            # them (guide §2.6); candidates are processed in spur-index
            # order afterwards, so seen/heap behavior — and the k
            # result routes — are identical to the serial loop
            with ThreadPoolExecutor(max_workers=3) as pool:
                spur_results = list(pool.map(_spur, range(len(prev) - 1)))
            for i, r in enumerate(spur_results):
                if r is None:
                    continue
                spath, scost = r
                cand = tuple(prev[: i]) + tuple(spath)
                if cand in seen:
                    continue
                seen.add(cand)
                heapq.heappush(B, (prefix[i] + scost, cand))
            if not B:
                break
            cost, key = heapq.heappop(B)
            A.append((list(key), cost))
        return A

    def _k_shortest_local(self, source, target, k, weight):
        """Driver-local Yen twin: same loopless/spur/tie semantics as
        the distributed path (candidates ordered by (cost, node
        tuple); parallel edges collapse to their min), over one
        collected adjacency."""
        import heapq

        emap: dict = {}
        for u, v, w in self._collect_triples(weight):
            kk = (u, v)
            if kk not in emap or w < emap[kk]:
                emap[kk] = w
        adj: dict = {}
        for (u, v), w in emap.items():
            adj.setdefault(u, []).append((v, w))

        def dijkstra(src, blocked, removed):
            dist = {src: 0.0}
            pred = {src: None}
            pq = [(0.0, src)]
            while pq:
                d, u = heapq.heappop(pq)
                if d > dist.get(u, float("inf")):
                    continue
                if u == target:
                    break
                for v, w in adj.get(u, []):
                    if v in blocked or (u, v) in removed:
                        continue
                    nd = d + w
                    if nd < dist.get(v, float("inf")):
                        dist[v], pred[v] = nd, u
                        heapq.heappush(pq, (nd, v))
            if target not in dist:
                return None
            path, cur = [], target
            while cur is not None:
                path.append(cur)
                cur = pred[cur]
            return path[::-1], dist[target]

        first = dijkstra(source, frozenset(), frozenset())
        if first is None:
            return []
        A: list[tuple[list, float]] = [first]
        B: list[tuple[float, tuple]] = []
        seen = {tuple(first[0])}
        while len(A) < k:
            prev = A[-1][0]
            prefix = [0.0]
            for a, b in zip(prev, prev[1:]):
                prefix.append(prefix[-1] + emap[(a, b)])
            for i in range(len(prev) - 1):
                spur = prev[i]
                root = prev[: i + 1]
                removed = {
                    (p[i], p[i + 1])
                    for p, _c in A
                    if len(p) > i + 1 and p[: i + 1] == root
                }
                blocked = set(root[:-1])
                r = dijkstra(spur, blocked, removed)
                if r is None:
                    continue
                spath, scost = r
                cand = tuple(root[:-1]) + tuple(spath)
                if cand in seen:
                    continue
                seen.add(cand)
                heapq.heappush(B, (prefix[i] + scost, cand))
            if not B:
                break
            cost, key = heapq.heappop(B)
            A.append((list(key), cost))
        return A

    def connected_components(
        self, max_iterations: int = 50, strategy: str = "auto"
    ) -> DataFrame:
        """Weakly connected components: ``(_n, component)`` with
        component = min node id reachable over undirected edges.

        Distributed path: alternating large-star/small-star edge
        rewiring — O(log^2 n) alternations independent of both graph
        diameter AND node-id order, so high-diameter road networks
        (the reference's domain) converge in ~15 rounds, not
        thousands.  Small graphs use driver-side union-find (same
        min-label semantics).
        """
        if self._use_local(strategy):
            parent: dict[str, str] = {
                r["_n"]: r["_n"] for r in self.nodes.select("_n").collect()
            }

            def find(x: str) -> str:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for u, v, _ in self._collect_triples(None):
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
            # min label per component (the union order above keeps the
            # min root, but a second pass is cheap and unconditional)
            comp_min: dict[str, str] = {}
            for n in parent:
                r = find(n)
                comp_min[r] = min(comp_min.get(r, n), n)
            schema = T.StructType(
                [
                    T.StructField("_n", self._id_type(), False),
                    T.StructField("component", self._id_type(), False),
                ]
            )
            rows = [(n, comp_min[find(n)]) for n in parent]
            return self.spark.createDataFrame(rows, schema)
        # ---- alternating large-star / small-star (Kiveris et al.,
        # "Connected Components in MapReduce and Beyond") ----
        # Canonical undirected pair set; each round rewires edges
        # toward per-neighborhood minima.  Converges in O(log^2 n)
        # alternations REGARDLESS of the id order (simulation:
        # 100k-node chain with adversarial random ids -> 14 rounds;
        # one-hop min-label propagation needs O(diameter) = 100k).
        edges = (
            self.edges.select(
                F.least("_u", "_v").alias("a"), F.greatest("_u", "_v").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        all_nodes = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
        )
        probe = FixpointProbe("a", "b")
        converged = False
        for it in range(max_iterations):
            sym = edges.unionByName(
                edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            # large-star(u): m = min(nbrs ∪ u); link every strictly
            # larger neighbor v to m  ->  canonical (m, v) since m<=u<v
            mins = (
                sym.groupBy("a")
                .agg(F.min("b").alias("mv"))
                .select("a", F.least("a", "mv").alias("m"))
            )
            large = (
                sym.join(mins, "a")
                .filter((F.col("b") > F.col("a")) & (F.col("b") != F.col("m")))
                .select(F.col("m").alias("a"), F.col("b"))
                .distinct()
            )
            # small-star(b): over canonical pairs grouped by the larger
            # endpoint, link every smaller neighbor (and b itself) to
            # the neighborhood min
            sm = large.groupBy("b").agg(F.min("a").alias("m"))
            small = (
                large.join(sm, "b")
                .filter(F.col("a") != F.col("m"))
                .select(F.col("m").alias("a"), F.col("a").alias("b"))
                .unionByName(sm.select(F.col("m").alias("a"), F.col("b")))
                .distinct()
                # lazy: the probe's aggregate job right below both
                # materializes the round and answers the probe (r17
                # fold — one scheduled job per alternation, not two)
                .localCheckpoint(eager=False)
            )
            edges = small
            if probe.converged(edges):
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_iterations} alternations; raise max_iterations"
            )
        # fixpoint state is a forest of stars centered at component
        # minima: label = min(self, min neighbor); isolated nodes self
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        nbr_min = sym.groupBy("a").agg(F.min("b").alias("mv"))
        return (
            all_nodes.join(nbr_min, all_nodes["_n"] == nbr_min["a"], "left_outer")
            .select(
                "_n",
                F.least(F.col("_n"), F.coalesce(F.col("mv"), F.col("_n"))).alias(
                    "component"
                ),
            )
        )

    def _chain_fold(
        self,
        lab: DataFrame,
        base_ptr: DataFrame,
        keys: list[str],
        max_rounds: int,
    ) -> tuple[DataFrame, int]:
        """Min-fold ``lab`` along functional-ancestor chains.

        ``base_ptr`` is a functional sub-relation of the edge set (one
        predecessor per node: ``p(n) = min incoming _u``, per key).
        Pointer doubling squares ``p`` while folding the running min
        of the CURRENT labels over the visited span — ``a(n) <-
        min(a(n), a(p(n))); p(n) <- p(p(n))`` — so after O(log chain)
        rounds every node holds the min label over all its functional
        ancestors, and ``lab'(n) = min(lab(n), a(n))``.  Every
        functional ancestor is a real ancestor, so the fold is always
        SOUND for min-over-ancestors semantics; callers use it as an
        accelerator and never rely on it for convergence detection.
        Returns ``(folded lab, rounds used)``.
        """
        nk = ["_n", *keys]
        fptr = (
            base_ptr.join(
                lab.select(
                    F.col("_n").alias("p"), *keys, F.col("lab").alias("a")
                ),
                ["p", *keys],
                "left",
            )
            .select(
                "_n", *keys, "p", F.coalesce("a", "p").alias("a")
            )
            .localCheckpoint(eager=True)
        )
        # fold convergence is "a stable" by design (the fold is an
        # accelerator; the caller's relax loop is the exact fixpoint)
        # — keys included in the signature so per-key relations can't
        # cross-cancel
        probe = FixpointProbe("_n", *keys, "a")
        for _rounds in range(1, max_rounds + 1):
            hop = fptr.select(
                F.col("_n").alias("p"),
                *[F.col(k) for k in keys],
                F.col("p").alias("pp"),
                F.col("a").alias("pa"),
            )
            fptr = rebase_checkpoint(
                fptr.join(hop, ["p", *keys], "left")
                .select(
                    "_n",
                    *keys,
                    F.coalesce("pp", "p").alias("p"),
                    F.least("a", F.coalesce("pa", "a")).alias("a"),
                ),
                # probe-fold: converged()'s aggregate materializes the
                # rebase before the next round's self-join
                eager=False,
            )
            if probe.converged(fptr):
                break
        else:
            raise RuntimeError(
                "min-label chain seed did not converge; raise max_iterations"
            )
        folded = (
            lab.join(fptr.select(*nk, "a"), nk, "left")
            .select(
                *nk,
                F.least("lab", F.coalesce("a", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        return folded, _rounds

    def _min_reach_labels(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        keys: list[str],
        max_rounds: int,
        stats: list | None = None,
        init_lab: DataFrame | None = None,
    ) -> DataFrame:
        """Min node-id over ``{n} ∪ ancestors(n)`` for every node, via
        the given edge relation (optionally per key column — ancestors
        then only follow edges carrying the same key).

        ``init_lab`` (``(_n, *keys, lab)``) replaces the identity seed:
        the fixpoint then computes ``min over {init(a) : a ∈
        ancestors*(n) ∪ {n}}``.  The caller owns the semantics — every
        init label must itself be the id of a node present in the same
        key class (the phase-2 jump follows labels as node ids), and
        exactness of "min member id" results needs ``init(n) >= true
        min`` with equality at the minimum member (e.g. labels that
        are ids of nodes in the same component — the fwbw WCC re-key
        seeds from the fw/bw reach tables this way, skipping most of
        a from-scratch seed phase).

        Two phases, the MSF pointer-jump discipline
        (minimum_spanning_forest) applied to reachability:

        1. FUNCTIONAL-CHAIN SEED (list-ranking doubling): each node
           picks ONE predecessor ``p(n) = min incoming _u`` — a
           functional graph — then squares pointers while folding the
           running min: ``a(n) <- min(a(n), a(p(n))); p(n) <-
           p(p(n))``.  O(log chain) rounds cover a 2^k-long ancestor
           chain, so a cycle of ANY id orientation seeds its true min
           in O(log len) — this is what plain value-jumping
           (``c(c(n))``) cannot do when ids increase toward the
           target: the min then creeps one hop per round because no
           intermediate node ever improves (measured: the r6 SCC
           backward pass degenerated to +1 node/round on the cycle
           stress).  Every chain node is a genuine ancestor, so the
           seed is always SOUND (never below the true min).
        2. RELAX+JUMP FIXPOINT: ``lab(n) <- min(lab(n), lab(u) for
           u->n, lab(lab(n)))`` to a signature-stable fixpoint.  Any
           fixpoint of the edge-relax operator equals the true min
           (induction along a witness path), so phase 1 is purely an
           accelerator and correctness never depends on it.
        """
        nk = ["_n", *keys]
        # phase 1: functional pred pointer (min _u per node), folded
        # over identity labels — a(n) = min id among 1..2^k functional
        # ancestors, exactly the list-ranking seed described above
        base_ptr = (
            edges.groupBy(F.col("_v").alias("_n"), *[F.col(k) for k in keys])
            .agg(F.min("_u").alias("p"))
            .localCheckpoint(eager=True)
        )
        lab = (
            nodes.select(*nk, F.col("_n").alias("lab"))
            if init_lab is None
            else init_lab.select(*nk, "lab")
        ).localCheckpoint(eager=True)
        lab, _seed_rounds = self._chain_fold(lab, base_ptr, keys, max_rounds)
        # phase 2: exact fixpoint (seed usually leaves 0-2 rounds);
        # load-bearing convergence -> exact-confirmed probe.  When the
        # one-hop relax keeps moving labels past round 4 the fixpoint
        # is CREEPING — a label arriving on a functional cycle from a
        # cross-edge travels one hop per relax round (the seed only
        # covered ids present at round 0, and the lab-graph jump can't
        # shortcut until the cycle's own min improves; measured: the
        # fwbw mid-scale adversary, 50 bridge-chained 1000-cycles,
        # blew a 400-round cap).  Re-running the chain fold on the
        # CURRENT labels re-saturates every functional chain in O(log
        # chain) rounds, so creep is bounded at 4 one-hop rounds per
        # cross-SCC edge on the label's witness path.  Folds are pure
        # accelerators (functional ancestors are real ancestors) and
        # are never probed: convergence is decided only on relax
        # rounds, whose fixpoint is exact by the induction argument.
        probe = FixpointProbe("_n", *keys, "lab")
        _folds = 0
        for _fix_rounds in range(1, max_rounds + 1):
            relax = edges.join(
                lab.select(
                    F.col("_n").alias("_u"), *keys, "lab"
                ),
                ["_u", *keys] if keys else ["_u"],
            ).select(F.col("_v").alias("_n"), *keys, "lab")
            jump = lab.join(
                lab.select(
                    F.col("_n").alias("lab"), *keys, F.col("lab").alias("ll")
                ),
                ["lab", *keys],
            ).select("_n", *keys, F.col("ll").alias("lab"))
            lab = rebase_checkpoint(
                lab.unionByName(relax)
                .unionByName(jump)
                .groupBy(*nk)
                .agg(F.min("lab").alias("lab")),
                # probe-fold: converged() materializes before the next
                # round's double reference (relax + jump self-join)
                eager=False,
            )
            if probe.converged(lab):
                break
            if _fix_rounds % 4 == 0:
                lab, _ = self._chain_fold(lab, base_ptr, keys, max_rounds)
                _folds += 1
        else:
            raise RuntimeError(
                "min-label fixpoint did not converge; raise max_iterations"
            )
        if stats is not None:
            # per-loop telemetry: rounds to seed-convergence and to the
            # exact fixpoint — the evidence behind the O(log) claim
            stats.append(
                {"seed": _seed_rounds, "fix": _fix_rounds, "folds": _folds}
            )
        return lab

    def _scc_fwbw(
        self, max_levels: int = 50, stats: dict | None = None
    ) -> DataFrame:
        """Data-parallel recursive FW-BW SCC (Fleischer-Hendrickson-
        Pinar 2000 divide-and-conquer, Slota et al. 2014 "Simple
        parallel algorithms for SCC" — the escalation queued by the
        r8 condensation-depth analysis, PLANS.md): per level, every
        active partition independently picks a pseudo-random pivot,
        computes reachable-from-pivot (FW) and reaching-pivot (BW)
        sets, peels FW∩BW as one SCC, and splits the remainder into
        FW\\BW / BW\\FW / rest — an SCC never spans two of those, so
        the split is a sound refinement and ALL partitions advance in
        the SAME DataFrame pass (the partition id is just a key
        column; recursion depth becomes loop levels, not driver
        recursion).

        Why this beats the coloring path on deep condensations: with
        min-id coloring the global minimum floods an entire
        condensation CHAIN, so a chain of k bridge-linked SCCs peels
        one per outer pass (the measured XL adversary: 10 bridges ->
        10 passes).  Here the RANDOM pivot splits a chain near its
        middle on average — both halves recurse in parallel — giving
        expected O(log k) levels (quickselect argument), and each
        level's FW/BW runs on the pointer-doubled
        ``_min_reach_labels`` (O(log diameter) rounds) applied to a
        pivot-relabeled id space: pivot -> "0", everything else ->
        "1"+id, so min-ancestor-label == "0" IS pivot-reachability
        and the per-key (per-partition) machinery is reused
        unchanged.

        After each peel the remainder is re-keyed by WEAK component
        (one symmetrized min-label pass, Hong et al. 2013): SCCs the
        pivot can't see would otherwise pile into one "rest" partition
        and peel one per level; per-WCC keys give every independent
        piece its own pivot at the next level.

        ``stats``: pass a dict to receive ``stats["levels"]`` — per
        level ``{"parts", "trimmed", "scc_nodes", "reach", "wcc"}``
        with the reach/wcc entries the usual seed/fix round counts
        (reach covers BOTH directions: fw and bw run as one pass
        keyed by a direction column).
        """
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("component", self._id_type(), False),
            ]
        )
        edges = (
            self.edges.select("_u", "_v")
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
            .select(F.lit("").alias("part"), "_u", "_v")
            .localCheckpoint(eager=True)
        )
        rem = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
            .select(F.lit("").alias("part"), "_n")
            .localCheckpoint(eager=True)
        )
        if stats is not None:
            stats["levels"] = []
        finished: list[DataFrame] = []
        done = rem.limit(1).count() == 0
        for level in range(max_levels):
            if done:
                break
            lstats: dict = {"trimmed": 0}
            # ---- per-part trim: zero in- or out-degree WITHIN the
            # part means a singleton SCC; drain iteratively so DAG-ish
            # partitions never reach the FW/BW machinery
            for _ in range(10 * max_levels):
                # a node survives trim iff it has BOTH an in- and an
                # out-edge within its part (intersect dedups both sides)
                both = edges.select("part", F.col("_v").alias("_n")).intersect(
                    edges.select("part", F.col("_u").alias("_n"))
                )
                # lazy + count fold: one job materializes and probes
                trivial = rem.join(
                    both, ["part", "_n"], "left_anti"
                ).localCheckpoint(eager=False)
                n_triv = trivial.count()
                if n_triv == 0:
                    break
                lstats["trimmed"] += n_triv
                finished.append(
                    trivial.select("_n", F.col("_n").alias("component"))
                )
                rem = rem.join(
                    trivial, ["part", "_n"], "left_anti"
                ).localCheckpoint(eager=True)
                edges = (
                    edges.join(
                        trivial.select("part", F.col("_n").alias("_u")),
                        ["part", "_u"],
                        "left_anti",
                    )
                    .join(
                        trivial.select("part", F.col("_n").alias("_v")),
                        ["part", "_v"],
                        "left_anti",
                    )
                    .localCheckpoint(eager=True)
                )
            done = rem.limit(1).count() == 0
            if done:
                if stats is not None:
                    lstats["parts"] = 0
                    lstats["scc_nodes"] = 0
                    stats["levels"].append(lstats)
                break
            # ---- pseudo-random pivot per part (deterministic: level-
            # salted hash argmin, so reruns reproduce and an adversary
            # ordering of node ids cannot force worst-case splits)
            pivots = rem.groupBy("part").agg(
                F.min_by("_n", F.xxhash64("_n", F.lit(level))).alias("pivot")
            )
            m = (
                rem.join(pivots, "part")
                .select(
                    "part",
                    "_n",
                    F.when(F.col("_n") == F.col("pivot"), F.lit("0"))
                    .otherwise(F.concat(F.lit("1"), F.col("_n")))
                    .alias("rid"),
                )
                .localCheckpoint(eager=True)
            )
            er = (
                edges.join(
                    m.select(
                        "part", F.col("_n").alias("_u"), F.col("rid").alias("_ru")
                    ),
                    ["part", "_u"],
                )
                .join(
                    m.select(
                        "part", F.col("_n").alias("_v"), F.col("rid").alias("_rv")
                    ),
                    ["part", "_v"],
                )
                .select("part", F.col("_ru").alias("_u"), F.col("_rv").alias("_v"))
                .localCheckpoint(eager=True)
            )
            # FW and BW run as ONE keyed min-label pass (direction is
            # just another key column, like the partition id): total
            # reach rounds per level = max(fw, bw) instead of fw + bw,
            # and every per-round fixed cost (checkpoint + probe) is
            # paid once for both directions
            spine = m.select(F.col("rid").alias("_n"), "part")
            er2 = er.select("part", "_u", "_v", F.lit("f").alias("dir")).unionByName(
                er.select(
                    "part",
                    F.col("_v").alias("_u"),
                    F.col("_u").alias("_v"),
                    F.lit("b").alias("dir"),
                )
            )
            reach = self._min_reach_labels(
                spine.select(
                    "_n", "part", F.explode(F.array(F.lit("f"), F.lit("b"))).alias("dir")
                ),
                er2,
                keys=["part", "dir"],
                max_rounds=10 * max_levels,
                stats=None if stats is None else lstats.setdefault("reach", []),
            )
            flags = (
                m.join(
                    reach.filter(F.col("dir") == "f").select(
                        F.col("_n").alias("rid"), "part", F.col("lab").alias("fl")
                    ),
                    ["part", "rid"],
                )
                .join(
                    reach.filter(F.col("dir") == "b").select(
                        F.col("_n").alias("rid"), "part", F.col("lab").alias("bl")
                    ),
                    ["part", "rid"],
                )
                .select(
                    "part",
                    "_n",
                    (F.col("fl") == F.lit("0")).alias("in_fw"),
                    (F.col("bl") == F.lit("0")).alias("in_bw"),
                    "fl",
                    "bl",
                )
                .localCheckpoint(eager=True)
            )
            scc = flags.filter(F.col("in_fw") & F.col("in_bw"))
            comp = scc.groupBy("part").agg(F.min("_n").alias("component"))
            finished.append(scc.join(comp, "part").select("_n", "component"))
            # WCC seed from the reach tables (the r9-verdict constant
            # cut): an F node's directed DESCENDANTS all land in F too
            # (a descendant in SCC/B would give the node a path to the
            # pivot), so its dir="b" reach label — min descendant rid —
            # is the id of a same-tpart, weakly-connected node: a sound
            # and near-saturated WCC seed.  Symmetrically a B node's
            # ancestors all land in B, so dir="f" seeds it.  R gets
            # identity (its reach mins may name B/F nodes).  Seeds are
            # >= the true WCC min with equality at the min member, so
            # the fixpoint is exact (docstring of _min_reach_labels);
            # the pivot rid "0" cannot appear in F's bl / B's fl (it
            # would put the node in the peeled SCC) — guarded anyway.
            tagged = flags.filter(~(F.col("in_fw") & F.col("in_bw"))).select(
                "part",
                "_n",
                F.concat(
                    "part",
                    F.when(F.col("in_fw"), F.lit("F"))
                    .when(F.col("in_bw"), F.lit("B"))
                    .otherwise(F.lit("R")),
                ).alias("tpart"),
                F.when(
                    F.col("in_fw") & (F.col("bl") != F.lit("0")),
                    F.expr("substring(bl, 2)"),
                )
                .when(
                    F.col("in_bw") & (F.col("fl") != F.lit("0")),
                    F.expr("substring(fl, 2)"),
                )
                .otherwise(F.col("_n"))
                .alias("_wseed"),
            )
            if tagged.limit(1).count() == 0:
                # every surviving node peeled — skip the WCC pass and
                # the rest/edge rebuilds (each a multi-round loop on
                # empty frames)
                if stats is not None:
                    lstats["parts"] = pivots.count()
                    lstats["scc_nodes"] = scc.count()
                    stats["levels"].append(lstats)
                done = True
                break
            # ---- WCC refinement (Hong et al. 2013 "On fast parallel
            # detection of SCCs"): an SCC is always inside one weakly-
            # connected piece, and without this step every SCC
            # UNREACHABLE from the pivot lands in the single R
            # partition — a graph of k independent SCCs then peels one
            # per level (pivot's own) instead of splitting.  One
            # symmetrized min-label pass per level keys each surviving
            # node by its weak component, so the next level runs one
            # pivot PER WCC and independent SCCs all advance at once.
            surv_e = (
                edges.join(
                    tagged.select(
                        "part", F.col("_n").alias("_u"), F.col("tpart").alias("pu")
                    ),
                    ["part", "_u"],
                )
                .join(
                    tagged.select(
                        "part", F.col("_n").alias("_v"), F.col("tpart").alias("pv")
                    ),
                    ["part", "_v"],
                )
                .filter(F.col("pu") == F.col("pv"))
                .select(F.col("pu").alias("tpart"), "_u", "_v")
                .localCheckpoint(eager=True)
            )
            sym = surv_e.unionByName(
                surv_e.select(
                    "tpart", F.col("_v").alias("_u"), F.col("_u").alias("_v")
                )
            )
            wcc = self._min_reach_labels(
                tagged.select("_n", "tpart"),
                sym,
                keys=["tpart"],
                max_rounds=10 * max_levels,
                stats=None if stats is None else lstats.setdefault("wcc", []),
                init_lab=tagged.select(
                    "_n", "tpart", F.col("_wseed").alias("lab")
                ),
            )
            rest = (
                tagged.join(wcc, ["_n", "tpart"])
                .select(
                    "part",
                    "_n",
                    F.concat("tpart", F.lit("#"), "lab").alias("npart"),
                )
                .localCheckpoint(eager=True)
            )
            if stats is not None:
                lstats["parts"] = pivots.count()
                lstats["scc_nodes"] = scc.count()
                stats["levels"].append(lstats)
            # surv_e already keeps only same-tag edges, and the WCC
            # re-key puts both endpoints of every surviving edge in
            # the same npart — one endpoint join relabels the edge set
            edges = (
                surv_e.join(
                    rest.select(
                        F.col("_n").alias("_u"), F.col("npart").alias("np")
                    ),
                    "_u",
                )
                .select(F.col("np").alias("part"), "_u", "_v")
                .localCheckpoint(eager=True)
            )
            rem = rest.select(F.col("npart").alias("part"), "_n").localCheckpoint(
                eager=True
            )
            # rem is never empty here: the empty-tagged early exit above
            # fired otherwise, and rest == tagged row-for-row (wcc covers
            # every tagged node), so no end-of-level count is needed
        else:
            raise RuntimeError(
                "scc (fwbw) did not finish within max_levels splits"
            )
        if not finished:  # empty graph
            return self.spark.createDataFrame([], schema)
        out = finished[0]
        for part in finished[1:]:
            out = out.unionByName(part)
        return out

    def strongly_connected_components(
        self,
        max_iterations: int = 50,
        strategy: str = "auto",
        stats: dict | None = None,
    ) -> DataFrame:
        """Strongly connected components of the DIRECTED graph:
        ``(_n, component)``.  ``stats``: pass a dict to receive
        per-pass telemetry — ``stats["fw"]`` / ``stats["bw"]`` list
        ``{"seed", "fix"}`` round counts for each forward/backward
        min-label propagation (the O(log diameter) evidence).
        Component = min node id (string
        order, matching connected_components) among mutually
        reachable nodes.

        Distributed path is FW-BW coloring (Orzan 2004; Slota et al.
        2014 "BFS and Coloring-Based Parallel Algorithms for SCC"):
        each outer round (1) propagates the minimum reachable label
        FORWARD to a fixpoint — POINTER-DOUBLED: one edge relax plus a
        jump through the current best ancestor per round, so rounds
        are O(log diameter) not O(diameter) (signature-based
        convergence, localCheckpoint lineage truncation), (2) nodes
        whose color is their own id are SCC roots — and for c(n)=r
        every n->..->r path is provably monochrome (any intermediate x
        has c(x)<=r by r's reachability, and c(x)=c'<r would force
        c(r)<=c'<r, contradicting rootness), so (3) r's SCC is exactly
        the color-r nodes that reach r BACKWARD through color-r nodes,
        found by a reverse membership propagation that never leaves
        the color class.  Finished SCCs peel off; EVERY current color
        root peels its SCC each round (the min remaining id is always
        one), so outer rounds are bounded by the longest root chain —
        O(log n) expected on web/social topologies, and each inner
        hop is a partitioned hash join, never an all-pairs closure.

        Each outer round starts with a TRIM prepass (Slota et al.
        2014): nodes with zero in- or out-degree in the remaining
        subgraph are singleton SCCs and peel iteratively via cheap
        degree anti-joins — so a condensation that is a long chain of
        trivial SCCs (the FW-BW worst case: one root per round) drains
        through trim instead of consuming ``max_iterations`` FW-BW
        rounds, and ``max_iterations`` effectively bounds only the
        NONTRIVIAL condensation depth.  Small graphs (every reference
        workload) use driver-side iterative Kosaraju with identical
        min-label output.

        ``strategy="fwbw"`` selects the recursive-FW-BW path
        (``_scc_fwbw``): random-pivot divide-and-conquer with all
        partitions advancing per DataFrame pass — expected O(log)
        levels even on deep condensation CHAINS, where this coloring
        path peels one chain SCC per outer round (the r8 XL
        adversary).  Identical output on every graph (property-
        tested); prefer it when the condensation is deep, the
        coloring path when many independent SCCs peel in one pass.

        ``strategy="auto"`` on distributed-scale graphs picks between
        them by MEASURING: coloring runs first, and after
        ``SCC_PROBE_PASSES`` passes the peel rate estimates the
        remaining condensation depth (remaining nodes / nodes peeled
        last pass); at ``SCC_SWITCH_DEPTH`` or deeper the remainder
        — a strictly smaller subgraph, with everything peeled so far
        kept — finishes on the recursive-FW-BW path.  The probe
        passes are never wasted (each peels real SCCs), and subgraph
        sampling cannot replace them: a sampled graph loses the
        bridge edges that make a condensation deep (see the class
        constants).  ``stats["switched_to_fwbw"]`` records the
        decision; ``stats["fwbw"]`` nests the second phase's levels.
        """
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("component", self._id_type(), False),
            ]
        )
        if strategy == "fwbw":
            return self._scc_fwbw(max_levels=max_iterations, stats=stats)
        if self._use_local(strategy):
            adj: dict[str, list[str]] = {}
            radj: dict[str, list[str]] = {}
            for r in self.nodes.select("_n").collect():
                adj.setdefault(r["_n"], [])
                radj.setdefault(r["_n"], [])
            for u, v, _ in self._collect_triples(None):
                adj.setdefault(u, []).append(v)
                radj.setdefault(v, []).append(u)
                adj.setdefault(v, [])
                radj.setdefault(u, [])
            # pass 1: iterative DFS finish order
            order: list[str] = []
            seen: set[str] = set()
            for s in adj:
                if s in seen:
                    continue
                seen.add(s)
                stack: list[tuple[str, object]] = [(s, iter(adj[s]))]
                while stack:
                    n, it = stack[-1]
                    nxt = next(it, None)
                    if nxt is None:
                        order.append(n)
                        stack.pop()
                    elif nxt not in seen:
                        seen.add(nxt)
                        stack.append((nxt, iter(adj[nxt])))
            # pass 2: reverse-graph sweeps in reverse finish order
            comp: dict[str, str] = {}
            for s in reversed(order):
                if s in comp:
                    continue
                members = [s]
                comp[s] = s
                dfs = [s]
                while dfs:
                    n = dfs.pop()
                    for m in radj.get(n, []):
                        if m not in comp:
                            comp[m] = s
                            members.append(m)
                            dfs.append(m)
                label = min(members)
                for m in members:
                    comp[m] = label
            return self.spark.createDataFrame(
                [(n, comp[n]) for n in comp], schema
            )

        edges = (
            self.edges.select("_u", "_v")
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        remaining = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        finished: list[DataFrame] = []
        done = remaining.limit(1).count() == 0
        for _outer in range(max_iterations):
            if done:
                break
            # ---- trim: iteratively peel trivial SCCs (zero in- or
            # zero out-degree in the remaining subgraph).  Pure
            # optimization — bounded, and any leftovers fall through
            # to FW-BW untouched.
            for _ in range(10 * max_iterations):
                has_in = edges.select(F.col("_v").alias("_n")).distinct()
                has_out = edges.select(F.col("_u").alias("_n")).distinct()
                trivial = (
                    remaining.join(has_in, "_n", "left_anti")
                    .unionByName(remaining.join(has_out, "_n", "left_anti"))
                    .distinct()
                    # lazy + count fold: one job materializes and probes
                    .localCheckpoint(eager=False)
                )
                if trivial.count() == 0:
                    break
                finished.append(
                    trivial.select("_n", F.col("_n").alias("component"))
                )
                remaining = remaining.join(
                    trivial, "_n", "left_anti"
                ).localCheckpoint(eager=True)
                edges = (
                    edges.join(
                        trivial.select(F.col("_n").alias("_u")),
                        "_u",
                        "left_anti",
                    )
                    .join(
                        trivial.select(F.col("_n").alias("_v")),
                        "_v",
                        "left_anti",
                    )
                    .localCheckpoint(eager=True)
                )
            done = remaining.limit(1).count() == 0
            if done:
                break
            # ---- forward min-label propagation (pointer-doubled via
            # _min_reach_labels: functional-chain seed + exact
            # fixpoint — O(log diameter) rounds on chain/cycle
            # topologies instead of one hop per round) ----
            color = self._min_reach_labels(
                remaining,
                edges,
                keys=[],
                max_rounds=10 * max_iterations,
                stats=None if stats is None else stats.setdefault("fw", []),
            ).select("_n", F.col("lab").alias("c"))
            # ---- backward membership within the color class ----
            # n belongs to root r's SCC iff r is reachable from n
            # through color-r nodes (the monochrome theorem in the
            # docstring).  Since every class node's id is >= its color
            # label and ids are unique, that holds iff
            #     d(n) := min id of n's class-DESCENDANTS == c(n),
            # which is the same min-ancestor-label computation on the
            # REVERSED monochrome subgraph, keyed by class — so it
            # reuses _min_reach_labels (and its doubling) unchanged,
            # where the old frontier-growing pass paid one reverse hop
            # per SCC-diameter step (the other half of the
            # cycle-stress wall).
            mono = (
                edges.join(color.withColumnRenamed("_n", "_u"), "_u")
                .withColumnRenamed("c", "cu")
                .join(
                    color.select(
                        F.col("_n").alias("_v"), F.col("c").alias("cv")
                    ),
                    "_v",
                )
                .filter(F.col("cu") == F.col("cv"))
                .select(
                    F.col("_v").alias("_u"),
                    F.col("_u").alias("_v"),
                    F.col("cu").alias("c"),
                )
                .localCheckpoint(eager=True)
            )
            desc = self._min_reach_labels(
                color,
                mono,
                keys=["c"],
                max_rounds=10 * max_iterations,
                stats=None if stats is None else stats.setdefault("bw", []),
            )
            member = (
                desc.filter(F.col("lab") == F.col("c"))
                .select("_n", "c")
                .localCheckpoint(eager=True)
            )
            finished.append(member.select("_n", F.col("c").alias("component")))
            # lazy: the end-of-pass completion probe below (count in
            # both branches) materializes this checkpoint in its job
            remaining = remaining.join(
                member.select("_n"), "_n", "left_anti"
            ).localCheckpoint(eager=False)
            edges = (
                edges.join(
                    member.select(F.col("_n").alias("_u")), "_u", "left_anti"
                )
                .join(member.select(F.col("_n").alias("_v")), "_v", "left_anti")
                .localCheckpoint(eager=True)
            )
            # probe completion HERE so a graph whose peel depth equals
            # max_iterations finishes instead of tripping the for-else
            if strategy == "auto":
                # ---- peel-rate depth probe (class-constant docs):
                # estimate remaining passes from this pass's peel rate;
                # deep-chain condensations switch to recursive FW-BW
                n_rem = remaining.count()
                done = n_rem == 0
                if not done and _outer + 1 >= self.SCC_PROBE_PASSES:
                    peeled = member.count()
                    est = n_rem / max(peeled, 1)
                    if est >= self.SCC_SWITCH_DEPTH:
                        if stats is not None:
                            stats["switched_to_fwbw"] = {
                                "after_pass": _outer + 1,
                                "est_remaining_depth": round(est, 1),
                            }
                        sub = SparkGraph(remaining, edges)
                        finished.append(
                            sub._scc_fwbw(
                                max_levels=max_iterations,
                                stats=None
                                if stats is None
                                else stats.setdefault("fwbw", {}),
                            )
                        )
                        done = True
            else:
                # full count (not limit(1)): the probe doubles as the
                # lazy checkpoint's materialization above
                done = remaining.count() == 0
            if done:
                break
        else:
            raise RuntimeError(
                "scc did not finish within max_iterations peeling rounds"
            )
        if not finished:  # empty graph
            return self.spark.createDataFrame([], schema)
        out = finished[0]
        for part in finished[1:]:
            out = out.unionByName(part)
        return out

    def condensation(
        self,
        max_iterations: int = 50,
        strategy: str = "auto",
    ) -> DataFrame:
        """Condensation DAG edge list: distinct ``(c_u, c_v)`` pairs
        of SCC labels with at least one original edge crossing them —
        ``networkx.condensation`` as a DataFrame (the canonical
        follow-on to SCC: cycle-collapsed dependency/flow analysis on
        the resulting DAG; reference scope: graph-view traversal,
        entwiner/graphs/digraphdb.py).  Nodes are labeled by
        ``strongly_connected_components`` (min-id labels, any
        ``strategy`` incl. ``fwbw``), then the edge table joins the
        label map on each endpoint and keeps distinct cross-component
        pairs.  Scale shape: the |V|-row label map joins the edge
        table twice on its construction-time ``_u`` partitioning
        (broadcast when small), then one distinct on the (usually
        tiny) component-pair projection — the edge payload never
        widens beyond two label columns.
        """
        lab = self.strongly_connected_components(
            max_iterations=max_iterations, strategy=strategy
        )
        return self._condensation_edges(lab)

    def _condensation_edges(self, lab: DataFrame) -> DataFrame:
        """Distinct cross-component (c_u, c_v) pairs from an SCC label
        map — the condensation() body, shared with
        condensation_levels so the labels are computed once."""
        return (
            self.edges.select("_u", "_v")
            .join(
                lab.select(
                    F.col("_n").alias("_u"), F.col("component").alias("c_u")
                ),
                "_u",
            )
            .join(
                lab.select(
                    F.col("_n").alias("_v"), F.col("component").alias("c_v")
                ),
                "_v",
            )
            .filter(F.col("c_u") != F.col("c_v"))
            .select("c_u", "c_v")
            .distinct()
        )

    def condensation_levels(
        self,
        max_iterations: int = 50,
        strategy: str = "auto",
    ) -> DataFrame:
        """Topological level of every SCC in the condensation DAG:
        ``(component, level)`` with level = longest-path distance from
        a DAG root (Kahn wave index, via ``topological_levels`` on the
        condensation).  ``max(level)`` is the condensation DEPTH — the
        exact statistic behind the ``strategy="auto"`` SCC selector
        (class constants ``SCC_PROBE_PASSES``/``SCC_SWITCH_DEPTH``):
        the online selector estimates it from the coloring peel rate
        because it cannot afford this full computation first, but a
        workload that re-runs SCC on a stable topology can compute it
        once here and pin ``strategy=`` explicitly from then on
        (depth below ~30 -> coloring/pregel, deeper -> fwbw, per the
        measured r9 crossover in PLANS.md).

        Scale shape: one SCC pass + the label joins of
        ``condensation`` + Kahn peeling on the (usually tiny)
        condensation DAG — the DAG frame is |SCC| rows, so the peel
        rounds run on the reduced graph, never the raw edges.
        """
        lab = self.strongly_connected_components(
            max_iterations=max_iterations, strategy=strategy
        )
        ce = self._condensation_edges(lab)
        comps = lab.select(F.col("component").alias("_n")).distinct()
        dag = SparkGraph(
            comps,
            ce.select(F.col("c_u").alias("_u"), F.col("c_v").alias("_v")),
        )
        return dag.topological_levels(
            max_iterations=max(max_iterations, 1000)
        ).select(F.col("_n").alias("component"), "level")

    def kcore(
        self, k: int, max_iterations: int = 100, strategy: str = "auto"
    ) -> DataFrame:
        """k-core decomposition membership: ``(_n, core_degree)`` for
        every node of the maximal subgraph (over undirected distinct
        edges, self-loops dropped) in which all degrees are >= k, with
        core_degree = the node's degree WITHIN that subgraph.

        Distributed path: iterative peeling — degree per node of the
        surviving symmetric edge set (one partial-aggregated groupBy),
        drop nodes below k via two left-semi prunes, localCheckpoint
        per round to truncate lineage.  Each round removes at least
        one node or converges, so rounds <= peel depth (the graph
        degeneracy ordering length), never O(nodes) in practice:
        cores collapse in waves.  Small graphs use the same peel
        driver-side.
        """
        if k < 1:
            raise ValueError("kcore requires k >= 1")
        if self._use_local(strategy):
            ue = set()
            for u, v, _ in self._collect_triples(None):
                if u != v:
                    ue.add((min(u, v), max(u, v)))
            alive = {n for pair in ue for n in pair}
            while True:
                deg: dict[str, int] = {}
                for a, b in ue:
                    if a in alive and b in alive:
                        deg[a] = deg.get(a, 0) + 1
                        deg[b] = deg.get(b, 0) + 1
                new = {n for n in alive if deg.get(n, 0) >= k}
                if new == alive:
                    break
                alive = new
            schema = T.StructType(
                [
                    T.StructField("_n", self._id_type(), False),
                    T.StructField("core_degree", T.LongType(), False),
                ]
            )
            rows = [(n, deg[n]) for n in sorted(alive)]
            return self.spark.createDataFrame(rows, schema)
        ue = (
            self.edges.select(
                F.least("_u", "_v").alias("a"), F.greatest("_u", "_v").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # lazy: round 1's alive.count() probe materializes it (fold)
        sym = ue.unionByName(
            ue.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint(eager=False)
        prev_alive = None
        deg = None
        for _ in range(max_iterations):
            deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("core_degree"))
            alive = deg.filter(F.col("core_degree") >= k).select("a")
            n_alive = alive.count()
            if n_alive == prev_alive:
                break
            prev_alive = n_alive
            if n_alive == 0:
                break
            sym = (
                sym.join(alive, "a", "left_semi")
                .join(alive.select(F.col("a").alias("b")), "b", "left_semi")
                # lazy: next round's alive.count() probe materializes
                # this checkpoint in the same scheduled job (fold)
                .localCheckpoint(eager=False)
            )
        else:
            raise RuntimeError(
                f"kcore did not converge within {max_iterations} peel rounds"
            )
        return deg.filter(F.col("core_degree") >= k).select(
            F.col("a").alias("_n"), F.col("core_degree").cast("long")
        )

    def label_propagation(
        self, iterations: int = 4, strategy: str = "auto"
    ) -> DataFrame:
        """Community detection by synchronous label propagation
        (Raghavan et al. 2007), made DETERMINISTIC: every node
        simultaneously adopts the most frequent label among its
        undirected neighbors, ties broken by minimum label string,
        for a FIXED number of iterations (async/random-order LPA is
        run-dependent, which would make results unverifiable).
        Returns ``(_n, label)``.

        ``strategy``: the standard auto/local/pregel split (r15
        CHECK_TIMES watch item — LPA's many-tiny-rounds shape pays
        ~3 scheduler jobs per round, which dominates under
        LOCAL_THRESHOLD; the local twin runs the identical
        synchronous update driver-side).

        Rides the public ``pregel`` primitive (r8 VERDICT task #6 —
        one tuned loop instead of four): per round ONE superstep
        (labels join the symmetric edge table on its construction-time
        ``_u`` partitioning, each neighbor's label delivered as a
        message) and ONE partially-aggregated ``mode(msg, true)`` per
        node — Spark's deterministic mode breaks frequency ties by
        LOWEST value, exactly the count-desc/min-label rule, so the
        former per-node top-1 window (a second full shuffle + sort per
        round) disappears.  Isolated nodes keep their label via the
        NULL-agg coalesce in update.
        """
        if self._use_local(strategy):
            from collections import Counter

            pairs = {
                (min(r["_u"], r["_v"]), max(r["_u"], r["_v"]))
                for r in self.edges.select("_u", "_v").collect()
                if r["_u"] != r["_v"]
            }
            node_ids = [r["_n"] for r in self.nodes.select("_n").collect()]
            adj: dict = {}
            for u, v in pairs:
                adj.setdefault(u, []).append(v)
                adj.setdefault(v, []).append(u)
            labels = {n: n for n in node_ids}
            for _ in range(iterations):
                new = {}
                for n in node_ids:
                    # endpoints absent from the nodes table send no
                    # message (matches the superstep's state join)
                    neigh = [m for m in adj.get(n, ()) if m in labels]
                    if not neigh:
                        new[n] = labels[n]
                        continue
                    counts = Counter(labels[m] for m in neigh)
                    new[n] = min(
                        counts.items(), key=lambda kv: (-kv[1], kv[0])
                    )[0]
                labels = new
            idt = self.nodes.schema["_n"].dataType
            return self.spark.createDataFrame(
                sorted(labels.items()),
                T.StructType(
                    [
                        T.StructField("_n", idt, False),
                        T.StructField("label", idt, True),
                    ]
                ),
            )
        ue = (
            self.edges.select(
                F.least("_u", "_v").alias("_u"), F.greatest("_u", "_v").alias("_v")
            )
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
        )
        sym = ue.unionByName(
            ue.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
        return SparkGraph(self.nodes, sym).pregel(
            self.nodes.select("_n", F.col("_n").alias("label")),
            {"win": F.mode("msg", True)},
            lambda df: df.select(
                "_n", F.coalesce("win", "label").alias("label")
            ),
            msg_to_dst=F.col("src.label"),
            max_iterations=iterations,
            halt=False,
        )

    def pagerank(
        self,
        alpha: float = 0.85,
        max_iterations: int = 20,
        tol: float = 1e-6,
        strategy: str = "auto",
        personalized: list[str] | None = None,
    ) -> DataFrame:
        """PageRank over the directed edge set: ``(_n, rank)``.

        Parity with the reference's "centrality metrics" claim
        (/root/reference/README.md:67) — implemented as iterative
        DataFrame message passing; small graphs run the same formula
        driver-side.

        ``personalized`` restricts the teleport (and dangling-mass
        redistribution) to the given source set — personalized
        PageRank, the standard graph-ML relevance/recommendation
        feature: ranks measure proximity to the sources instead of
        global importance.
        """
        S = set(personalized) if personalized else None
        k = len(S) if S else None
        if self._use_local(strategy):
            triples = self._collect_triples(None)
            node_ids = [r["_n"] for r in self.nodes.select("_n").collect()]
            n_nodes = len(node_ids)
            out_deg: dict[str, int] = {}
            for u, _, _ in triples:
                out_deg[u] = out_deg.get(u, 0) + 1
            if S is None:
                ranks = {n: 1.0 / n_nodes for n in node_ids}
            else:
                ranks = {n: (1.0 / k if n in S else 0.0) for n in node_ids}
            for _ in range(max_iterations):
                contribs: dict[str, float] = {}
                for u, v, _ in triples:
                    # edges whose source is absent from the nodes table
                    # contribute nothing (matches the distributed join)
                    if u in ranks:
                        contribs[v] = contribs.get(v, 0.0) + ranks[u] / out_deg[u]
                dangling = sum(r for n, r in ranks.items() if n not in out_deg)
                if S is None:
                    new_ranks = {
                        n: (1 - alpha) / n_nodes
                        + alpha * (contribs.get(n, 0.0) + dangling / n_nodes)
                        for n in node_ids
                    }
                else:
                    new_ranks = {
                        n: (
                            (1 - alpha) / k
                            + alpha * (contribs.get(n, 0.0) + dangling / k)
                            if n in S
                            else alpha * contribs.get(n, 0.0)
                        )
                        for n in node_ids
                    }
                delta = sum(abs(new_ranks[n] - ranks[n]) for n in node_ids)
                ranks = new_ranks
                if delta < tol:
                    break
            schema = T.StructType(
                [
                    T.StructField("_n", self._id_type(), False),
                    T.StructField("rank", T.DoubleType(), False),
                ]
            )
            return self.spark.createDataFrame(list(ranks.items()), schema)
        # Distributed branch rides the public pregel primitive: state
        # (_n, rank, deg), message rank/deg along each out-edge, sum
        # aggregation, and an update that folds the per-round dangling
        # mass (one single-row aggregate on the current state).  Same
        # plan shape as the hand-rolled loop it replaced: one state->
        # edges join on the construction-time _u partitioning + one
        # partial-agg groupBy per round.
        n_nodes = self.nodes.count()
        out = self.edges.groupBy("_u").agg(
            F.count(F.lit(1)).cast("double").alias("deg")
        )
        if S is None:
            rank0 = F.lit(1.0 / n_nodes)
        else:
            rank0 = (
                F.when(F.col("_n").isin(*S), F.lit(1.0 / k)).otherwise(F.lit(0.0))
            )
        state0 = self.nodes.select("_n", rank0.alias("rank")).join(
            out.withColumnRenamed("_u", "_n"), "_n", "left_outer"
        ).select("_n", "rank", F.coalesce("deg", F.lit(0.0)).alias("deg"))

        def update(df: DataFrame, prev: DataFrame) -> DataFrame:
            # dangling mass redistributed uniformly (or to the sources),
            # computed from the CHECKPOINTED previous state (deg is
            # static and rank in `df` IS prev's rank) — aggregating on
            # `df` would execute the whole un-materialized superstep a
            # second time per round (r8 ADVICE, ~2x per-round cost)
            dangling = (
                prev.filter(F.col("deg") == 0.0).agg(F.sum("rank")).collect()[0][0]
                or 0.0
            )
            c = F.coalesce(F.col("agg"), F.lit(0.0))
            if S is None:
                rank_expr = F.lit((1 - alpha) / n_nodes) + F.lit(alpha) * (
                    c + F.lit(dangling / n_nodes)
                )
            else:
                rank_expr = F.when(
                    F.col("_n").isin(*S),
                    F.lit((1 - alpha) / k)
                    + F.lit(alpha) * (c + F.lit(dangling / k)),
                ).otherwise(F.lit(alpha) * c)
            return df.select("_n", rank_expr.alias("rank"), "deg")

        def halt(old: DataFrame, new: DataFrame) -> bool:
            delta = (
                new.alias("a")
                .join(old.alias("b"), "_n")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            return delta is not None and delta < tol

        return self.pregel(
            state0,
            F.sum("msg"),
            update,
            msg_to_dst=F.col("src.rank") / F.col("src.deg"),
            max_iterations=max_iterations,
            halt=False if tol <= 0.0 else halt,
        ).select("_n", "rank")

    def triangle_count(self) -> DataFrame:
        """Directed triangles (u -> v -> w -> u) as one row per
        distinct triangle: ``(a, b, c)`` with a = lexicographic min.

        Motif-style 3-way self-join; each hop shuffles on the join key
        and AQE picks broadcast when the edge set is small.
        """
        e1 = self.edges.select(F.col("_u").alias("a"), F.col("_v").alias("b"))
        e2 = self.edges.select(F.col("_u").alias("b"), F.col("_v").alias("c"))
        e3 = self.edges.select(F.col("_u").alias("c"), F.col("_v").alias("a"))
        tri = (
            e1.join(e2, "b")
            .join(e3, ["c", "a"])
            .filter(
                (F.col("a") < F.col("b"))
                & (F.col("a") < F.col("c"))
                & (F.col("b") != F.col("c"))  # excludes self-loop degenerates
            )
        )
        return tri.select("a", "b", "c").distinct()

    def clustering_coefficient(self) -> DataFrame:
        """Local clustering coefficient per node (undirected
        interpretation, the standard graph-ML feature): 2T(n) /
        (deg(n)·(deg(n)−1)), where T(n) counts undirected triangles
        through ``n``.

        Plan: canonicalize edges to (min, max) pairs, enumerate each
        triangle exactly once via the ordered wedge join (x<y<z), then
        per-node counts.  Same wedge discipline as triangle_count —
        never all-pairs; hub fan-out is the cost driver.  Returns
        (_n, degree, triangles, clustering_coef).
        """
        und = (
            self.edges.select(
                F.least("_u", "_v").alias("x"), F.greatest("_u", "_v").alias("y")
            )
            .filter(F.col("x") != F.col("y"))
            .distinct()
        )
        sym = und.select(F.col("x").alias("n"), F.col("y").alias("m")).unionByName(
            und.select(F.col("y").alias("n"), F.col("x").alias("m"))
        )
        deg = sym.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
        tri = (
            und.alias("e1")
            .join(und.alias("e2"), F.col("e2.x") == F.col("e1.y"))
            .join(
                und.alias("e3"),
                (F.col("e3.x") == F.col("e1.x"))
                & (F.col("e3.y") == F.col("e2.y")),
            )
            .select(
                F.col("e1.x").alias("a"),
                F.col("e1.y").alias("b"),
                F.col("e2.y").alias("c"),
            )
        )
        tri_n = (
            tri.select(F.col("a").alias("n"))
            .unionByName(tri.select(F.col("b").alias("n")))
            .unionByName(tri.select(F.col("c").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("triangles"))
        )
        t = F.coalesce(F.col("triangles"), F.lit(0))
        return (
            deg.join(tri_n, "n", "left")
            .select(
                F.col("n").alias("_n"),
                "degree",
                t.cast("long").alias("triangles"),
                F.round(
                    F.when(
                        F.col("degree") >= 2,
                        2.0 * t / (F.col("degree") * (F.col("degree") - 1)),
                    ).otherwise(0.0),
                    6,
                ).alias("clustering_coef"),
            )
        )

    def closeness(self, weight=None, strategy: str = "auto") -> DataFrame:
        """Closeness-style centrality: per source node, the sum of
        shortest-path distances to its reachable set and the reach
        count (parity with the reference's "centrality metrics" claim,
        README.md:67).

        Small graphs: driver-side Dijkstra per source.  Large graphs:
        this is |V| SSSP runs — run per-landmark sampling instead
        (call shortest_path_lengths for a landmark subset).
        """
        if not self._use_local(strategy, weight):
            raise ValueError(
                "exact all-pairs closeness is O(V) SSSP runs; at scale "
                "sample landmarks via shortest_path_lengths instead"
            )
        import heapq

        adj: dict[str, list[tuple[str, float]]] = {}
        for u, v, w in self._collect_triples(weight):
            adj.setdefault(u, []).append((v, w))
        sources = [r["_n"] for r in self.nodes.select("_n").collect()]
        rows = []
        for s in sources:
            dist = {s: 0.0}
            pq = [(0.0, s)]
            while pq:
                d, u = heapq.heappop(pq)
                if d > dist.get(u, float("inf")):
                    continue
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < dist.get(v, float("inf")):
                        dist[v] = nd
                        heapq.heappush(pq, (nd, v))
            reach = len(dist) - 1
            total = sum(dist.values())
            rows.append((s, float(total), reach))
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("total_dist", T.DoubleType(), False),
                T.StructField("n_reachable", T.IntegerType(), False),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def harmonic_centrality(self, weight=None, strategy: str = "auto") -> DataFrame:
        """Harmonic centrality: per source node, ``sum(1/d(s, m))``
        over its reachable set (the closeness variant that handles
        disconnected graphs gracefully — unreachable nodes contribute
        0 instead of poisoning the mean).

        Same execution contract as :meth:`closeness`: exact all-pairs
        is |V| SSSP runs, so it is local-only by design and raises at
        scale pointing at the landmark escalation
        (:meth:`closeness_landmarks` rankings are the sampled
        substitute).  Output rounded to 6 dp so the DuckDB oracle's
        different summation order cannot shift the value.
        """
        if not self._use_local(strategy, weight):
            raise ValueError(
                "exact all-pairs harmonic centrality is O(V) SSSP runs; "
                "at scale sample landmarks via closeness_landmarks"
            )
        import heapq

        adj: dict[str, list[tuple[str, float]]] = {}
        for u, v, w in self._collect_triples(weight):
            adj.setdefault(u, []).append((v, w))
        rows = []
        for s in [r["_n"] for r in self.nodes.select("_n").collect()]:
            dist = {s: 0.0}
            pq = [(0.0, s)]
            while pq:
                d, u = heapq.heappop(pq)
                if d > dist.get(u, float("inf")):
                    continue
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < dist.get(v, float("inf")):
                        dist[v] = nd
                        heapq.heappush(pq, (nd, v))
            h = sum(1.0 / d for m, d in dist.items() if m != s and d > 0)
            rows.append((s, float(h)))
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("harmonic", T.DoubleType(), False),
            ]
        )
        # round JVM-side: Python round() half-evens and can disagree
        # with the oracle engines at a decimal half boundary (the e12
        # class documented in catalog.py's preamble)
        return self.spark.createDataFrame(rows, schema).select(
            "_n", F.round("harmonic", 6).alias("harmonic")
        )

    def topological_levels(
        self, max_iterations: int = 1000, strategy: str = "auto"
    ) -> DataFrame:
        """Topological layering of a DAG: ``(_n, level)`` with level =
        longest-path distance from any root (zero-in-degree node) —
        the wave index of Kahn's algorithm, i.e. the earliest parallel
        scheduling round in which the node's dependencies are all met
        (dependency-graph scheduling / feature-DAG materialization
        order).  Raises ValueError on a cyclic graph.

        Distributed path: Kahn peeling — each round the zero-in-degree
        frontier (one left-anti join against surviving edge targets)
        takes the current level and its outgoing edges drop out
        (left-semi prune + localCheckpoint).  Rounds = DAG depth, each
        a partitioned join — same peel discipline as kcore; at 100 TB
        depth, not node count, is the wall-clock driver.  Small graphs
        use driver-side Kahn with identical levels.
        """
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("level", T.LongType(), False),
            ]
        )
        if self._use_local(strategy):
            adj: dict[str, list[str]] = {}
            indeg: dict[str, int] = {}
            for r in self.nodes.select("_n").collect():
                adj.setdefault(r["_n"], [])
                indeg.setdefault(r["_n"], 0)
            for u, v, _ in self._collect_triples(None):
                if u == v:
                    raise ValueError("graph has a cycle (self-loop); "
                                     "topological levels undefined")
                adj.setdefault(u, []).append(v)
                indeg[v] = indeg.get(v, 0) + 1
                indeg.setdefault(u, 0)
            level = {}
            frontier = sorted(n for n, d in indeg.items() if d == 0)
            lv = 0
            while frontier:
                nxt = []
                for n in frontier:
                    level[n] = lv
                    for m in adj.get(n, []):
                        indeg[m] -= 1
                        if indeg[m] == 0:
                            nxt.append(m)
                frontier = sorted(nxt)
                lv += 1
            if len(level) != len(indeg):
                raise ValueError("graph has a cycle; topological levels "
                                 "undefined")
            return self.spark.createDataFrame(list(level.items()), schema)

        edges = (
            self.edges.select("_u", "_v")
            .distinct()
            .localCheckpoint(eager=True)
        )
        remaining = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        parts: list[DataFrame] = []
        done = remaining.limit(1).count() == 0
        for lv in range(max_iterations):
            if done:
                break
            # lazy + count fold: one job materializes and probes
            frontier = remaining.join(
                edges.select(F.col("_v").alias("_n")).distinct(),
                "_n",
                "left_anti",
            ).localCheckpoint(eager=False)
            if frontier.count() == 0:
                raise ValueError(
                    "graph has a cycle; topological levels undefined"
                )
            parts.append(frontier.select("_n", F.lit(lv).cast("long").alias("level")))
            remaining = remaining.join(frontier, "_n", "left_anti").localCheckpoint(
                eager=False
            )
            edges = edges.join(
                frontier.withColumnRenamed("_n", "_u"), "_u", "left_anti"
            ).localCheckpoint(eager=True)
            # probe completion HERE so a depth-N DAG finishes with
            # max_iterations == N instead of tripping the for-else;
            # the full count also materializes the lazy checkpoint
            done = remaining.count() == 0
            if done:
                break
        else:
            raise RuntimeError(
                "topological_levels did not finish; raise max_iterations"
            )
        if not parts:  # empty graph
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def diameter_lower_bound(self, weight=None, strategy: str = "auto") -> DataFrame:
        """Double-sweep diameter lower bound (Magnien-Latapy-Habib,
        adapted to digraphs): forward SSSP from the min-id pivot, take
        the farthest reached node f (max dist, min-id tiebreak), then
        BACKWARD SSSP into f (SSSP on the reversed edges) — the max
        distance found is a valid shortest-path length, hence a lower
        bound on the directed diameter over reachable pairs.  TWO SSSP
        runs total regardless of |V| (vs |V| runs for the exact
        diameter), which is why this is the standard scale diagnostic
        before picking traversal iteration budgets.

        Returns one row ``(pivot, far_node, diameter_lb)``.  The only
        driver-side values are the pivot id, the argmax row, and the
        final max — all metadata-sized.
        """
        schema = T.StructType(
            [
                T.StructField("pivot", self._id_type(), False),
                T.StructField("far_node", self._id_type(), False),
                T.StructField("diameter_lb", T.DoubleType(), False),
            ]
        )
        pivot = self.nodes.agg(F.min("_n").alias("p")).collect()[0]["p"]
        if pivot is None:  # empty graph
            return self.spark.createDataFrame([], schema)
        d1 = self.shortest_path_lengths(pivot, weight=weight, strategy=strategy)
        far = d1.orderBy(F.col("dist").desc(), "_n").limit(1).collect()[0]["_n"]
        rev = SparkGraph(
            self.nodes,
            self.edges.select(
                F.col("_v").alias("_u"),
                F.col("_u").alias("_v"),
                *[c for c in self.edges.columns if c not in ("_u", "_v")],
            ),
        )
        d2 = rev.shortest_path_lengths(far, weight=weight, strategy=strategy)
        lb = d2.agg(F.max("dist")).collect()[0][0]
        return self.spark.createDataFrame([(pivot, far, float(lb))], schema)

    def _local_neighborhood_function(
        self, max_hops: int, stats: dict | None = None
    ) -> DataFrame:
        """Driver-side exact twin of ``neighborhood_function(
        method="exact")`` — per-node truncated BFS over the collected
        distinct edge set; identical pair counts by construction (same
        dedup, same self-loop exclusion, same ≤max_hops truncation).
        Small graphs only (the _use_local gate): the distributed exact
        path costs ~3 driver actions per hop, which dominates at
        catalog scale."""
        from collections import deque

        adj: dict[str, set] = {}
        nodes = {r["_n"] for r in self.nodes.select("_n").collect()}
        for r in self.edges.select("_u", "_v").collect():
            u, v = r["_u"], r["_v"]
            if u != v:
                # endpoints join the node set only from NON-self-loop
                # rows — the distributed path filters self-loops before
                # unioning endpoints, so a node appearing only as a
                # self-loop endpoint (and absent from self.nodes) must
                # not be counted here either (ADVICE r11)
                nodes.add(u)
                nodes.add(v)
                adj.setdefault(u, set()).add(v)
        counts = [0] * (max_hops + 1)
        for s in nodes:
            dist = {s: 0}
            q = deque([s])
            while q:
                u = q.popleft()
                if dist[u] == max_hops:
                    continue
                for m in adj.get(u, ()):
                    if m not in dist:
                        dist[m] = dist[u] + 1
                        q.append(m)
            hist = [0] * (max_hops + 1)
            for d in dist.values():
                hist[d] += 1
            run = 0
            for h in range(max_hops + 1):
                run += hist[h]
                counts[h] += run
        if stats is not None:
            # exact counts: a hop adding zero pairs is a true monotone
            # fixpoint (an empty global frontier stays empty)
            stats["saturated"] = max_hops >= 1 and counts[-1] == counts[-2]
        schema = T.StructType(
            [
                T.StructField("hop", T.LongType(), False),
                T.StructField("n_pairs", T.LongType(), False),
            ]
        )
        return self.spark.createDataFrame(
            [(h, int(counts[h])) for h in range(max_hops + 1)], schema
        )

    def neighborhood_function(
        self,
        max_hops: int = 8,
        method: str = "hll",
        lgk: int = 12,
        strategy: str = "auto",
        stats: dict | None = None,
    ) -> DataFrame:
        """ANF — the approximate neighborhood function (Palmer,
        Gibbons, Faloutsos 2002, "ANF: a fast and scalable tool for
        data mining in massive graphs"; HyperANF, Boldi-Rosa-Vigna
        2011): for each ``hop`` 0..max_hops the number of ordered
        pairs ``(u, v)`` with directed distance(u→v) <= hop.  N(h)
        saturating is how effective diameter / average distance are
        estimated at scales where the |V|-SSSP exact centralities
        (closeness/harmonic) rightly raise (the r9-verdict stretch:
        the scalable answer built on the e11 HLL sketch machinery).

        ``method="hll"``: every node carries a HyperLogLog sketch of
        its h-ball (``hll_sketch_agg`` on its own id, then per round
        ``hll_union_agg`` over itself + out-neighbors' sketches — one
        partial-aggregated groupBy per hop).  State is |V| × ~2^lgk
        bytes, pairs NEVER materialize; rounds = max_hops, each a
        key-local shuffle.  Estimates carry HLL error (~1.04/√2^lgk
        rsd per ball, lgk=12 → ~1.6%); small balls sit in the
        sketch's exact sparse mode.  Stops early (and fills the
        remaining hops with the saturated value — N is monotone) once
        the sketch state reaches an exact-confirmed fixpoint.

        ``method="exact"``: distinct-pair BFS expansion — O(pairs)
        state, the small-graph/harness twin the bounded-error catalog
        contract (g_anf) checks the sketches against.

        Returns ``(hop, n_pairs)`` (long; the HLL estimate is the
        sketch's integer estimate).

        ``strategy``: ``auto`` (default) short-cuts the EXACT method
        to the driver-side BFS twin below the local threshold (the
        established closeness/SSSP pattern — identical counts, ~3
        fewer driver actions per hop); ``pregel`` forces the
        distributed loop; the HLL path is always distributed (its
        whole point is the scale regime).
        """
        if method == "exact" and self._use_local(strategy):
            return self._local_neighborhood_function(max_hops, stats=stats)
        schema = T.StructType(
            [
                T.StructField("hop", T.LongType(), False),
                T.StructField("n_pairs", T.LongType(), False),
            ]
        )
        edges = (
            self.edges.select("_u", "_v")
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nodes = (
            self.nodes.select("_n")
            .unionByName(edges.select(F.col("_u").alias("_n")))
            .unionByName(edges.select(F.col("_v").alias("_n")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        counts: list[int] = []
        _saturated = False
        if method == "exact":
            # lazy + count folds throughout this loop: each count
            # materializes the checkpoint it probes in one job
            pairs = nodes.select(
                F.col("_n").alias("s"), F.col("_n").alias("d")
            ).localCheckpoint(eager=False)
            counts.append(pairs.count())
            for _h in range(max_hops):
                nxt = pairs.join(
                    edges.withColumnRenamed("_u", "d"), "d"
                ).select("s", F.col("_v").alias("d"))
                pairs = rebase_checkpoint(
                    pairs.unionByName(nxt).distinct(), eager=False
                )
                n = pairs.count()
                if n == counts[-1]:  # saturated: N is monotone
                    _saturated = True
                    break
                counts.append(n)
        elif method == "hll":
            state = nodes.groupBy("_n").agg(
                F.hll_sketch_agg("_n", F.lit(lgk)).alias("sk")
            ).localCheckpoint(eager=False)
            probe = FixpointProbe("_n", "sk")
            est = F.sum(F.hll_sketch_estimate("sk"))
            # seed the signature and take the hop-0 estimate in the
            # same single action (converged_with: probe + statistic
            # fused — one job per round, was two)
            _, row = probe.converged_with(state, est=est)
            counts.append(row["est"] or 0)  # empty graph: SUM is NULL
            for _h in range(max_hops):
                msgs = edges.join(
                    state.withColumnRenamed("_n", "_v"), "_v"
                ).select(F.col("_u").alias("_n"), "sk")
                state = rebase_checkpoint(
                    state.unionByName(msgs)
                    .groupBy("_n")
                    .agg(F.hll_union_agg("sk").alias("sk")),
                    eager=False,
                )
                done, row = probe.converged_with(state, est=est)
                if done:  # balls saturated (exact-confirmed fixpoint)
                    _saturated = True
                    break
                counts.append(row["est"] or 0)
        else:
            raise ValueError(
                f"method must be 'hll' or 'exact', got {method!r}"
            )
        if stats is not None:
            # loop-derived truth (exact break / probe-confirmed sketch
            # fixpoint) — NOT tail-value equality, which can collide on
            # float estimate sums while the true curve still grows
            stats["saturated"] = _saturated
        # fill the saturated tail: N(h) = N(h_sat) for h > h_sat
        rows = [
            (h, int(counts[min(h, len(counts) - 1)]))
            for h in range(max_hops + 1)
        ]
        return self.spark.createDataFrame(rows, schema)

    def effective_diameter(
        self,
        q: float = 0.9,
        max_hops: int = 16,
        method: str = "hll",
        lgk: int = 12,
    ) -> DataFrame:
        """Effective diameter + average distance from the
        neighborhood-function curve (the ANF consumers those sketches
        exist for — Palmer et al. 2002 §4; HyperANF §5 uses the same
        interpolation).  Runs ``neighborhood_function`` (distributed;
        per-node HLL ball sketches, pairs never materialize), then
        derives driver-side from the ≤ ``max_hops+1``-row curve:

        - ``effective_diameter``: the smallest ``h`` with
          ``N(h) >= q·N(max_hops)``, linearly interpolated between
          ``h-1`` and ``h`` (HyperANF convention; 0.0 when the q-mass
          is met at hop 0);
        - ``avg_distance``: Σ h·(N(h)−N(h−1)) / (N(∞)−N(0)) — the mean
          directed distance over reachable ordered pairs ``u ≠ v``
          (distance-0 self pairs excluded from both sums);
        - ``n_reachable_pairs`` = N(∞)−N(0); ``saturated`` = whether
          the curve reached its monotone fixpoint within ``max_hops``
          (if false, N(max_hops) underestimates N(∞) and both stats
          are lower bounds — raise ``max_hops``).

        Exact equality vs the BFS twin on fixtures is pytest-pinned;
        the catalog's ``g_eff_diameter`` wraps it in the a2b
        bounded-error contract against a recursive-CTE oracle.
        """
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q!r}")
        nf_stats: dict = {}
        curve = self.neighborhood_function(
            max_hops=max_hops, method=method, lgk=lgk, stats=nf_stats
        ).orderBy("hop")
        n = [r["n_pairs"] for r in curve.collect()]  # max_hops+1 rows
        # the true curve is monotone but HLL estimates can dip between
        # hops; a running max keeps the interpolation search in-range
        # and the per-hop mass Σ h·(N(h)−N(h−1)) non-negative
        for i in range(1, len(n)):
            if n[i] < n[i - 1]:
                n[i] = n[i - 1]
        n_inf, n0 = n[-1], n[0]
        # loop-derived: the exact break / probe-confirmed sketch
        # fixpoint, not tail-value equality (float estimate sums can
        # collide while the true curve still grows)
        saturated = bool(nf_stats.get("saturated"))
        target = q * n_inf
        eff = 0.0
        if n0 < target:
            h = next(i for i, v in enumerate(n) if v >= target)
            eff = h - 1 + (target - n[h - 1]) / (n[h] - n[h - 1])
        reach = n_inf - n0
        dist_sum = sum(h * (n[h] - n[h - 1]) for h in range(1, len(n)))
        avg = (dist_sum / reach) if reach > 0 else 0.0
        schema = T.StructType(
            [
                T.StructField("effective_diameter", T.DoubleType(), False),
                T.StructField("avg_distance", T.DoubleType(), False),
                T.StructField("n_reachable_pairs", T.LongType(), False),
                T.StructField("saturated", T.BooleanType(), False),
            ]
        )
        return self.spark.createDataFrame(
            [(float(eff), float(avg), int(reach), bool(saturated))], schema
        )

    def ktruss(
        self, k: int, max_iterations: int = 100, strategy: str = "auto"
    ) -> DataFrame:
        """k-truss subgraph over the undirected distinct edges: the
        maximal subgraph in which every edge closes at least ``k-2``
        triangles (edge "support") — the cohesive-community cousin of
        k-core that ignores degree-inflating hubs.  Returns surviving
        edges ``(u, v, support)`` with u < v and support measured in
        the final subgraph.

        Distributed path: iterative peel — per round each triangle is
        enumerated ONCE via the degree-oriented wedge join (edges point
        low-(degree,id) -> high, wedges fan out only from the low end,
        so wedge volume is sum-of-C(outdeg,2) with outdeg ~ O(sqrt(m))
        instead of sum-of-deg — hub skew capped), then exploded to its
        three edges and counted; edges below ``k-2`` drop,
        localCheckpoint truncates lineage; rounds are bounded by the
        peel depth exactly like kcore.  Small graphs run the same peel
        driver-side.
        """
        if k < 3:
            raise ValueError(f"k must be >= 3 for a k-truss, got {k}")
        und = (
            self.edges.select(
                F.least("_u", "_v").alias("a"), F.greatest("_u", "_v").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        if self._use_local(strategy):
            edges = {(r["a"], r["b"]) for r in und.collect()}
            while True:
                nbrs: dict[str, set] = {}
                for a, b in edges:
                    nbrs.setdefault(a, set()).add(b)
                    nbrs.setdefault(b, set()).add(a)
                sup = {
                    (a, b): len(nbrs[a] & nbrs[b]) for a, b in edges
                }
                keep = {e for e in edges if sup[e] >= k - 2}
                if keep == edges:
                    break
                edges = keep
            schema = T.StructType(
                [
                    T.StructField("u", self._id_type(), False),
                    T.StructField("v", self._id_type(), False),
                    T.StructField("support", T.LongType(), False),
                ]
            )
            return self.spark.createDataFrame(
                [(a, b, sup[(a, b)]) for a, b in edges], schema
            )

        # lazy + count fold (one job materializes and probes)
        live = und.localCheckpoint(eager=False)
        n_live = live.count()
        for _ in range(max_iterations):
            # degree-(re)oriented triangle enumeration on the current
            # subgraph: each triangle found exactly once from its
            # lowest-(degree,id) corner, then charged to all 3 edges
            sym = live.unionByName(
                live.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
            ed = live.join(
                deg.select(F.col("a"), F.col("d").alias("da")), "a"
            ).join(
                deg.select(F.col("a").alias("b"), F.col("d").alias("db")), "b"
            )
            lower_is_a = F.struct(F.col("da"), F.col("a")) < F.struct(
                F.col("db"), F.col("b")
            )
            oriented = ed.select(
                F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("src"),
                F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("dst"),
                F.when(lower_is_a, F.col("db")).otherwise(F.col("da")).alias("dd"),
            )
            w1 = oriented.select(
                "src", F.col("dst").alias("y"), F.col("dd").alias("dy")
            )
            w2 = oriented.select(
                "src", F.col("dst").alias("z"), F.col("dd").alias("dz")
            )
            tri = (
                w1.join(w2, "src")
                .filter(F.struct("dy", "y") < F.struct("dz", "z"))
                .join(
                    oriented.select(
                        F.col("src").alias("y"), F.col("dst").alias("z")
                    ),
                    ["y", "z"],
                )
                .select(F.col("src").alias("x"), "y", "z")
            )
            sup = (
                tri.select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.least("x", "y").alias("a"),
                                F.greatest("x", "y").alias("b"),
                            ),
                            F.struct(
                                F.least("x", "z").alias("a"),
                                F.greatest("x", "z").alias("b"),
                            ),
                            F.struct(
                                F.least("y", "z").alias("a"),
                                F.greatest("y", "z").alias("b"),
                            ),
                        )
                    ).alias("e")
                )
                .select("e.a", "e.b")
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("support"))
            )
            scored = live.join(sup, ["a", "b"], "left_outer").select(
                "a", "b", F.coalesce("support", F.lit(0)).alias("support")
            )
            keep = scored.filter(F.col("support") >= k - 2).localCheckpoint(
                eager=False
            )
            n_keep = keep.count()
            if n_keep == n_live:
                return keep.select(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("support").cast("long").alias("support"),
                )
            if n_keep == 0:
                schema = T.StructType(
                    [
                        T.StructField("u", self._id_type(), False),
                        T.StructField("v", self._id_type(), False),
                        T.StructField("support", T.LongType(), False),
                    ]
                )
                return self.spark.createDataFrame([], schema)
            # keep is already checkpointed; reuse it (one copy per round)
            live = keep.select("a", "b")
            n_live = n_keep
        raise RuntimeError(
            "ktruss did not converge within max_iterations; raise it"
        )

    def minimum_spanning_forest(
        self, weight: str = "w", max_rounds: int = 40, strategy: str = "auto"
    ) -> DataFrame:
        """Minimum spanning forest over the UNDIRECTED view of the
        edges (Borůvka): each round every component picks its minimum
        outgoing edge — ties broken by (weight, u, v) so the result is
        deterministic even with equal weights — the picked edges join
        the forest, components contract, repeat.  Components halve (or
        better) per round, so O(log n) rounds; each is one join +
        min-struct agg + a pointer-jumping relabel (the pick relation
        is a pseudoforest whose only cycles are mutual-min 2-cycles,
        so hooking the larger label under the smaller and squaring
        pointers converges in O(log depth) self-joins — no nested CC
        run), never anything quadratic.  Returns forest edges
        ``(u, v, w)`` with u < v.

        Small graphs use driver-side Kruskal with the same tiebreak,
        so both paths emit identical forests.
        """
        und = (
            self.edges.select(
                F.least("_u", "_v").alias("u"),
                F.greatest("_u", "_v").alias("v"),
                self._weight_col(weight).alias("w"),
            )
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.min("w").alias("w"))
        )
        if self._use_local(strategy, weight):
            parent: dict[str, str] = {}

            def find(x: str) -> str:
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            forest = []
            for r in sorted(
                und.collect(), key=lambda r: (r["w"], r["u"], r["v"])
            ):
                ru, rv = find(r["u"]), find(r["v"])
                if ru != rv:
                    parent[ru] = rv
                    forest.append((r["u"], r["v"], float(r["w"])))
            schema = T.StructType(
                [
                    T.StructField("u", self._id_type(), False),
                    T.StructField("v", self._id_type(), False),
                    T.StructField("w", T.DoubleType(), False),
                ]
            )
            return self.spark.createDataFrame(forest, schema)

        comp = (
            und.select(F.col("u").alias("_n"))
            .unionByName(und.select(F.col("v").alias("_n")))
            .distinct()
            .select("_n", F.col("_n").alias("c"))
            .localCheckpoint(eager=True)
        )
        live = und.localCheckpoint(eager=True)
        picked: list[DataFrame] = []
        for _ in range(max_rounds):
            lab = (
                live.join(
                    comp.select(F.col("_n").alias("u"), F.col("c").alias("cu")),
                    "u",
                )
                .join(
                    comp.select(F.col("_n").alias("v"), F.col("c").alias("cv")),
                    "v",
                )
                .filter(F.col("cu") != F.col("cv"))
                # lazy + count fold (one job materializes and probes)
                .localCheckpoint(eager=False)
            )
            if lab.count() == 0:
                break
            # min outgoing edge per component, deterministic tiebreak;
            # carry the OTHER endpoint's component so the pick doubles
            # as the contraction pointer
            cand = lab.select(
                F.col("cu").alias("comp"), "u", "v", "w",
                F.col("cv").alias("other"),
            ).unionByName(
                lab.select(
                    F.col("cv").alias("comp"), "u", "v", "w",
                    F.col("cu").alias("other"),
                )
            )
            selc = (
                cand.groupBy("comp")
                .agg(F.min(F.struct("w", "u", "v", "other")).alias("m"))
                # lazy: the n_active count below materializes it before
                # sel (and everything else) references it
                .localCheckpoint(eager=False)
            )
            n_active = selc.count()
            sel = selc.select(
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
                F.col("m.w").alias("w"),
            ).distinct()
            picked.append(sel.localCheckpoint(eager=True))
            # contract: every active component points at its pick's
            # other endpoint.  The pick relation is a pseudoforest
            # whose only cycles are mutual-min 2-cycles (strict
            # (w,u,v) total order), so no full CC run is needed.
            # Size-adaptive like every iterative op here: label tables
            # under LOCAL_THRESHOLD relabel via ONE collect +
            # union-find (per-round job overhead dwarfs the work);
            # larger ones hook the larger label under the smaller and
            # square pointers — O(log depth) self-joins.
            if n_active <= self.RELABEL_LOCAL_THRESHOLD:
                pairs = selc.select(
                    F.col("comp").alias("c"), F.col("m.other").alias("p")
                ).collect()
                parent: dict[str, str] = {}

                def _find(x: str) -> str:
                    parent.setdefault(x, x)
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for r in pairs:
                    rc, rp = _find(r["c"]), _find(r["p"])
                    if rc != rp:
                        # deterministic root: smaller label wins
                        if rc < rp:
                            parent[rp] = rc
                        else:
                            parent[rc] = rp
                ptr = self.spark.createDataFrame(
                    [(x, _find(x)) for x in parent],
                    T.StructType(
                        [
                            T.StructField("c", self._id_type(), False),
                            T.StructField("p", self._id_type(), False),
                        ]
                    ),
                )
            else:
                ptr = selc.select(
                    F.col("comp").alias("c"), F.col("m.other").alias("p")
                )
                ptr = (
                    ptr.alias("x")
                    .join(
                        ptr.select(
                            F.col("c").alias("p"), F.col("p").alias("pp")
                        ),
                        "p",
                    )
                    .select(
                        "c",
                        F.when(
                            F.col("pp") == F.col("c"), F.least("c", "p")
                        ).otherwise(F.col("p")).alias("p"),
                    )
                    .localCheckpoint(eager=True)
                )
                for _ in range(max_rounds):
                    j = (
                        ptr.join(
                            ptr.select(
                                F.col("c").alias("p"), F.col("p").alias("pp")
                            ),
                            "p",
                        )
                        .select(
                            "c",
                            F.col("pp").alias("p"),
                            (F.col("p") != F.col("pp")).alias("_moved"),
                        )
                        # lazy + count fold (one job per doubling round)
                        .localCheckpoint(eager=False)
                    )
                    ptr = j.select("c", "p")
                    if j.filter(F.col("_moved")).count() == 0:
                        break
                else:
                    raise RuntimeError(
                        "minimum_spanning_forest relabel did not converge"
                    )
            comp = (
                comp.join(
                    ptr.select(F.col("c"), F.col("p").alias("c2")),
                    "c",
                    "left",
                )
                .select("_n", F.coalesce("c2", "c").alias("c"))
                .localCheckpoint(eager=True)
            )
            live = lab.select("u", "v", "w").localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                "minimum_spanning_forest did not converge; raise max_rounds"
            )
        if not picked:
            schema = T.StructType(
                [
                    T.StructField("u", self._id_type(), False),
                    T.StructField("v", self._id_type(), False),
                    T.StructField("w", T.DoubleType(), False),
                ]
            )
            return self.spark.createDataFrame([], schema)
        out = picked[0]
        for p in picked[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def random_walks(self, length: int = 3) -> DataFrame:
        """Deterministic "random" walks from every node — the
        DeepWalk/node2vec corpus-generation stage made reproducible:
        at step t from node u on the walk started at s, the next hop
        is the out-neighbor ranked ``stable_hash32(s|t|u) mod
        out_deg(u)`` in sorted-neighbor order.  Walks stop early at
        sinks.  Returns ``(start, step, node)`` including step 0.

        Scale shape: the ranked adjacency (neighbor rank + out-degree
        via one window over ``_u``) is computed once; each step is ONE
        equi-join on the current node selecting exactly one neighbor
        row per live walk (the rank filter is part of the join), so
        a length-L corpus costs L partitioned joins over |V| walk
        rows — never a per-walk driver loop, and no RNG state (the
        hash IS the sampler, which is what makes the walk corpus
        verifiable and resumable).
        """
        from entwiner_spark.functions.text import stable_hash32

        if length < 1:
            raise ValueError("length must be >= 1")
        w = Window.partitionBy("_u").orderBy("_v")
        adj = (
            self.edges.select("_u", "_v")
            .distinct()
            .select(
                "_u",
                "_v",
                F.row_number().over(w).alias("_rk"),
                F.count(F.lit(1)).over(Window.partitionBy("_u")).alias("_deg"),
            )
            .localCheckpoint(eager=True)
        )
        cur = self.nodes.select(
            F.col("_n").alias("start"), F.col("_n").alias("node")
        )
        parts = [cur.select("start", F.lit(0).cast("int").alias("step"), "node")]
        for t in range(1, length + 1):
            h = stable_hash32(
                F.concat(
                    F.col("start"), F.lit(f"|{t}|"), F.col("node")
                )
            )
            nxt = (
                cur.join(adj, cur["node"] == adj["_u"])
                .filter(F.col("_rk") == h % F.col("_deg") + 1)
                .select("start", F.col("_v").alias("node"))
            )
            parts.append(
                nxt.select("start", F.lit(t).cast("int").alias("step"), "node")
            )
            cur = nxt
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def node2vec_walks(
        self, length: int = 3, p: float = 2.0, q: float = 0.5
    ) -> DataFrame:
        """Deterministic node2vec walks (Grover & Leskovec 2016): the
        2nd-order biased walk where the next hop x from cur (given the
        previous node) is weighted 1/p if x == prev (return), 1 if x
        neighbors prev (BFS-ish), 1/q otherwise (DFS-ish) — realized
        as a deterministic ROULETTE: candidates ordered by id
        accumulate weight, and the hash fraction
        ``stable_hash32(start|t|cur)/2^32`` of the total picks the
        first crossing.  Step 1 (no prev) is uniform.  With the
        default p=2, q=1/2 the weights are {0.5, 1, 2} — exact binary
        doubles, so cumulative sums and the threshold compare are
        bit-identical in any engine (the property that makes the walk
        corpus verifiable).

        Scale shape per step: one equi-join for candidates, one LEFT
        join flagging prev-neighborship, one per-walk window cumsum,
        one min-agg picking the crossing — all partitioned on the
        walk id; no RNG state, no driver loops.  Returns
        ``(start, step, node)``.
        """
        from entwiner_spark.functions.text import stable_hash32

        if length < 1:
            raise ValueError("length must be >= 1")
        if p <= 0 or q <= 0:
            raise ValueError("p and q must be positive")
        adj = (
            self.edges.select("_u", "_v").distinct().localCheckpoint(eager=True)
        )
        cur = self.nodes.select(
            F.col("_n").alias("start"),
            F.lit(None).cast("string").alias("prev"),
            F.col("_n").alias("node"),
        )
        parts = [cur.select("start", F.lit(0).cast("int").alias("step"), "node")]
        wwin = (
            Window.partitionBy("start")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        twin = Window.partitionBy("start")
        for t in range(1, length + 1):
            cand = cur.join(
                adj.withColumnRenamed("_u", "node"), "node"
            ).select("start", "prev", "node", F.col("_v").alias("x"))
            nbr = adj.select(
                F.col("_u").alias("prev"), F.col("_v").alias("x"), F.lit(1).alias("_nb")
            )
            cand = cand.join(nbr, ["prev", "x"], "left_outer")
            w = (
                F.when(F.col("prev").isNull(), F.lit(1.0))
                .when(F.col("x") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("_nb").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
            )
            frac = stable_hash32(
                F.concat(F.col("start"), F.lit(f"|{t}|"), F.col("node"))
            ) / F.lit(4294967296.0)
            scored = cand.select(
                "start",
                "node",
                "x",
                F.sum(w).over(wwin).alias("_cum"),
                (frac * F.sum(w).over(twin)).alias("_thr"),
            )
            nxt = (
                scored.filter(F.col("_cum") > F.col("_thr"))
                .groupBy("start")
                .agg(F.min("x").alias("_x"), F.first("node").alias("_pv"))
                .select(
                    "start",
                    F.col("_pv").alias("prev"),
                    F.col("_x").alias("node"),
                )
                .localCheckpoint(eager=True)
            )
            parts.append(
                nxt.select("start", F.lit(t).cast("int").alias("step"), "node")
            )
            cur = nxt
        out = parts[0]
        for pt in parts[1:]:
            out = out.unionByName(pt)
        return out

    def isochrone(
        self,
        source,
        budget: float,
        weight=None,
        strategy: str = "auto",
        ch=None,
        max_iterations: int | None = None,
    ) -> DataFrame:
        """Accessibility set: every node reachable from ``source``
        within ``budget`` total cost — THE sidewalk-network analysis
        the reference exists for (how far can a wheelchair user travel
        in N minutes?).  Returns ``(_n, dist)``.

        ``ch``: a prebuilt :class:`~entwiner_spark.operators.ch.
        ContractionHierarchy` over the SAME weight — the one-to-all
        sweep then runs as PHAST (upward cone + down-edges-only
        fixpoint; rounds bounded by hierarchy height, not graph
        diameter — the r14-measured 1.66× that widens with scale)
        instead of raw pregel SSSP.  Build once, query many origins:
        the city-scale isochrone service shape.

        With ``ch``, the metric is the HIERARCHY's build weight.  Pass
        ``weight`` alongside ``ch`` to assert they agree: the artifact
        is validated against THIS graph under that weight
        (:meth:`~entwiner_spark.operators.ch.ContractionHierarchy.
        check_fresh`), so a hierarchy built on a different weight
        column or a since-mutated edge table raises instead of
        returning a wrong accessibility set.  ``weight=None`` with
        ``ch`` skips the check (the build weight is not re-stated, so
        there is no claim to verify) — the artifact is trusted as-is."""
        if ch is not None:
            if weight is not None:
                ch.check_fresh(self, weight)
            d = ch.sssp(source, strategy=strategy)
        else:
            d = self.shortest_path_lengths(
                source,
                weight=weight,
                strategy=strategy,
                max_iterations=max_iterations,
            )
        return d.filter(F.col("dist") <= float(budget))

    def closeness_landmarks(
        self,
        n_landmarks: int = 16,
        weight=None,
        strategy: str = "auto",
        landmarks: list | None = None,
        contracted=None,
    ) -> DataFrame:
        """Approximate closeness at scale: SSSP from a deterministic
        landmark sample instead of every node (the documented
        escalation from exact ``closeness``).

        Landmarks default to the k minimum-md5(id) nodes — a
        deterministic DISTRIBUTED sample (TakeOrderedAndProject; only
        k ids reach the driver), stable across runs and partitionings;
        pass ``landmarks=[...]`` to pin known hubs instead.  Returns
        per node: sum of distances FROM the
        landmarks that reach it, how many did, and the normalized
        ``avg_dist`` (compare rankings with avg_dist — raw sums are not
        comparable across nodes reached by different landmark counts).
        On a symmetric graph with all nodes as landmarks this equals
        exact closeness.

        Use this only when the graph is too big for ``closeness`` (k
        SSSP runs instead of V); below LOCAL_THRESHOLD exact closeness
        is both cheaper and correct.  Small landmark counts rank
        coarsely — quality grows with k.

        ``contracted``: a prebuilt ContractionHierarchy over the same
        weight — the k sweeps run as ONE batched PHAST
        (:meth:`~entwiner_spark.operators.ch.ContractionHierarchy.
        sssp_multi`, rounds amortized across landmarks and bounded by
        hierarchy height) instead of k sequential pregel SSSPs.
        """
        all_d = self._landmark_dists(
            n_landmarks, weight, strategy, landmarks, contracted
        )
        return all_d.groupBy("_n").agg(
            F.sum("_d").alias("total_dist"),
            F.count(F.lit(1)).alias("n_landmarks"),
        ).withColumn("avg_dist", F.col("total_dist") / F.col("n_landmarks"))

    def harmonic_landmarks(
        self,
        n_landmarks: int = 16,
        weight=None,
        strategy: str = "auto",
        landmarks: list | None = None,
        contracted=None,
    ) -> DataFrame:
        """Landmark-sampled harmonic centrality — the same escalation
        as :meth:`closeness_landmarks` for the disconnect-tolerant
        variant (where sampling matters MOST: harmonic exists because
        real graphs are disconnected, and disconnected graphs are the
        ones too big to run |V| SSSPs on).  Per node: sum of 1/d over
        the landmarks reaching it (self rows excluded — d=0 carries no
        harmonic mass, matching exact ``harmonic``), the reaching
        count, and the count-normalized ``avg_inv`` for cross-node
        ranking.  ``contracted``: see :meth:`closeness_landmarks`."""
        all_d = self._landmark_dists(
            n_landmarks, weight, strategy, landmarks, contracted
        )
        inv = all_d.filter(F.col("_d") > 0).select(
            "_n", (F.lit(1.0) / F.col("_d")).alias("_i")
        )
        return inv.groupBy("_n").agg(
            F.sum("_i").alias("total_inv"),
            F.count(F.lit(1)).alias("n_landmarks"),
        ).withColumn("avg_inv", F.col("total_inv") / F.col("n_landmarks"))

    def _landmark_dists(
        self, n_landmarks, weight, strategy, landmarks=None, contracted=None
    ) -> DataFrame:
        """Shared landmark machinery: deterministic distributed
        landmark sample, one SSSP each, ONE union of narrow (_n, _d)
        frames.  Plan depth is constant in k (a k-deep full_outer join
        chain grows the lineage linearly and chokes Catalyst at k=64;
        this shape is one shuffle regardless of k).  Each SSSP result
        is checkpoint-truncated so the union's children are leaf
        scans, not k iterative plans.

        Default sampler (r12-verdict task #7 — replaces the old
        collect-all-ids stride): the k MINIMUM-md5(_n) nodes via
        ``orderBy(md5).limit(k)`` — Catalyst plans it as
        TakeOrderedAndProject (per-partition top-k, k rows to the
        driver), so selection is deterministic, uniform-ish (md5 is
        the samp2 hash-Bernoulli idiom) and billion-node safe: only k
        ids ever leave the executors.

        ``landmarks``: explicit landmark ids (known hubs) — validated
        (ADVICE r12): duplicates are dropped (each would double-count
        in total_dist/n_landmarks) and ids absent from the graph
        raise (a typo would otherwise seed a phantom self-row at
        dist 0 and silently pollute the centrality output)."""
        if landmarks is None:
            landmarks = [
                r["_n"]
                for r in self.nodes.select("_n")
                .orderBy(F.md5(F.col("_n").cast("string")), "_n")
                .limit(n_landmarks)
                .collect()
            ]
        else:
            landmarks = list(dict.fromkeys(landmarks))  # dedupe, keep order
            present = {
                r["_n"]
                for r in self.nodes.filter(
                    F.col("_n").isin(landmarks)
                ).select("_n").collect()
            }
            unknown = [lm for lm in landmarks if lm not in present]
            if unknown:
                raise ValueError(
                    f"landmarks not in graph: {unknown[:5]}"
                    f"{'...' if len(unknown) > 5 else ''} — explicit "
                    "landmark ids must name existing nodes (a missing "
                    "id would seed a phantom dist-0 self-row)"
                )
        if contracted is not None:
            # ONE batched PHAST over the hierarchy: every landmark's
            # one-to-all sweep shares the round loop (state keyed
            # (src, _n)), rounds bounded by hierarchy height instead
            # of k × graph diameter
            return contracted.sssp_multi(
                landmarks, strategy=strategy
            ).select("_n", F.col("dist").alias("_d"))
        # per-landmark SSSPs are independent — overlap them (guide
        # §2.6; one landmark's tail rounds leave the scheduler idle for
        # the next one's frontier expansion).  Parts union in landmark
        # order, so the assembled frame matches the serial loop.  The
        # scoped shuffle conf concurrent loops touch derives the same
        # data-sized value and only affects partition counts of
        # partition-invariant min-merges.
        from concurrent.futures import ThreadPoolExecutor
        from functools import reduce

        def _one(lm):
            d = self.shortest_path_lengths(lm, weight=weight, strategy=strategy)
            return d.select("_n", F.col("dist").alias("_d")).localCheckpoint(
                eager=False
            )

        # overlap only when the SSSPs actually run the distributed
        # loop: the driver-local twin is GIL-bound Python where threads
        # add overhead without overlap (A/B: 59.8/61.0 s threaded vs
        # 57.6/58.5 s serial on the all-landmarks local-twin test)
        workers = 1 if self._use_local(strategy, weight) else 3
        with ThreadPoolExecutor(max_workers=min(workers, max(1, len(landmarks)))) as pool:
            parts = list(pool.map(_one, landmarks))
        return reduce(lambda a, b: a.unionByName(b), parts)

    def betweenness(
        self,
        sources: list[str] | None = None,
        weight=None,
        strategy: str = "auto",
    ) -> DataFrame:
        """Betweenness centrality: ``(_n, betweenness)`` — the last
        centrality the reference's "centrality metrics" claim
        (/root/reference/README.md:67) covers that this engine lacked.

        ``sources=None`` -> exact (Brandes from every node);
        ``sources=[...]`` -> the standard sampled-source approximation
        (sum of pair dependencies restricted to those sources — scale
        knob: error shrinks as k grows, cost is k SSSP+accumulation
        passes instead of V).

        Local path: textbook Brandes (dependency accumulation).
        Distributed path (unweighted only): per source, a BFS forward
        phase tracking (dist, sigma), then level-synchronous backward
        dependency accumulation — O(depth) joins per source, so keep
        ``sources`` small at scale (that's the sampling design point).
        """
        if self._use_local(strategy, weight):
            return self._betweenness_local(sources, weight)
        if weight is not None:
            raise ValueError(
                "distributed betweenness supports unweighted graphs "
                "only; pass strategy='local' or weight=None"
            )
        return self._betweenness_pregel(sources)

    def _betweenness_local(self, sources, weight) -> DataFrame:
        import heapq

        adj: dict[str, list[tuple[str, float]]] = {}
        nodes: set[str] = {r["_n"] for r in self.nodes.select("_n").collect()}
        for u, v, w in self._collect_triples(weight):
            adj.setdefault(u, []).append((v, w))
            nodes.add(u)
            nodes.add(v)
        bc = {n: 0.0 for n in nodes}
        for s in sources if sources is not None else sorted(nodes):
            # forward: Dijkstra with path counting
            dist: dict[str, float] = {s: 0.0}
            sigma: dict[str, float] = {s: 1.0}
            preds: dict[str, list[str]] = {n: [] for n in nodes}
            order: list[str] = []
            seen: set[str] = set()
            pq = [(0.0, s)]
            while pq:
                d, u = heapq.heappop(pq)
                if u in seen:
                    continue
                seen.add(u)
                order.append(u)
                for v, w in adj.get(u, []):
                    nd = d + w
                    old = dist.get(v)
                    if old is None or nd < old:
                        dist[v] = nd
                        sigma[v] = sigma[u]
                        preds[v] = [u]
                        heapq.heappush(pq, (nd, v))
                    elif nd == old:
                        sigma[v] += sigma[u]
                        preds[v].append(u)
            # backward: dependency accumulation
            delta = {n: 0.0 for n in order}
            for wn in reversed(order):
                for p in preds[wn]:
                    delta[p] += sigma[p] / sigma[wn] * (1.0 + delta[wn])
                if wn != s:
                    bc[wn] += delta[wn]
        schema = T.StructType(
            [
                T.StructField("_n", self._id_type(), False),
                T.StructField("betweenness", T.DoubleType(), False),
            ]
        )
        return self.spark.createDataFrame(sorted(bc.items()), schema)

    def _betweenness_pregel(self, sources) -> DataFrame:
        """Distributed Brandes, one source at a time: BFS forward pass
        accumulating (level, sigma), then backward sweep by descending
        level.  Each phase is a handful of joins per level over tables
        partitioned on the node key."""
        if sources is None:
            raise ValueError(
                "exact distributed betweenness is |V| full passes; "
                "pass a sampled `sources` list at scale"
            )
        # eager: several per-source threads reference adj concurrently
        # below, and a lazy checkpoint computed simultaneously by two
        # first actions would run its plan twice
        adj = self.edges.select("_u", "_v").localCheckpoint(eager=True)

        def _one_source(s):
            lvl = self.spark.createDataFrame(
                [(s, 0, 1.0)],
                T.StructType(
                    [
                        T.StructField("_n", self._id_type(), False),
                        T.StructField("level", T.IntegerType(), False),
                        T.StructField("sigma", T.DoubleType(), False),
                    ]
                ),
            )
            frontier = lvl
            depth = 0
            # forward BFS: sigma(v) = sum of sigma over parents one
            # level up (level-synchronous => counts are final per level)
            while True:
                nxt = (
                    frontier.join(adj, frontier["_n"] == adj["_u"])
                    .join(lvl.select(F.col("_n").alias("_seen")),
                          F.col("_v") == F.col("_seen"), "left_anti")
                    .groupBy(F.col("_v").alias("_m"))
                    .agg(F.sum("sigma").alias("sigma"))
                    .select(
                        F.col("_m").alias("_n"),
                        F.lit(depth + 1).alias("level"),
                        F.col("sigma"),
                    )
                    # lazy + count fold (one job materializes and probes)
                    .localCheckpoint(eager=False)
                )
                if nxt.count() == 0:
                    break
                lvl = lvl.unionByName(nxt).localCheckpoint(eager=False)
                frontier = nxt
                depth += 1
            # backward: delta accumulates from deepest level up.  An
            # edge u->v is on a shortest-path DAG iff level(v) ==
            # level(u)+1.
            sp_edges = (
                adj.join(lvl.select(F.col("_n").alias("_u"),
                                    F.col("level").alias("lu"),
                                    F.col("sigma").alias("su")), "_u")
                .join(lvl.select(F.col("_n").alias("_v"),
                                 F.col("level").alias("lv"),
                                 F.col("sigma").alias("sv")), "_v")
                .filter(F.col("lv") == F.col("lu") + 1)
                .select("_u", "_v", "su", "sv", "lu")
                .localCheckpoint(eager=True)
            )
            delta = lvl.select("_n", F.lit(0.0).alias("delta"))
            for lev in range(depth - 1, -1, -1):
                contrib = (
                    sp_edges.filter(F.col("lu") == lev)
                    .join(delta.select(F.col("_n").alias("_v"),
                                       F.col("delta").alias("dv")), "_v")
                    .groupBy("_u")
                    .agg(
                        F.sum(
                            F.col("su") / F.col("sv") * (F.lit(1.0) + F.col("dv"))
                        ).alias("dnew")
                    )
                )
                delta = (
                    delta.alias("d")
                    .join(contrib.alias("c"), delta["_n"] == contrib["_u"], "left_outer")
                    .select(
                        F.col("d._n").alias("_n"),
                        (F.col("d.delta") + F.coalesce(F.col("c.dnew"), F.lit(0.0))).alias(
                            "delta"
                        ),
                    )
                )
                if (depth - 1 - lev) % 4 == 3:
                    delta = delta.localCheckpoint(eager=True)
            part = delta.filter(F.col("_n") != s).select(
                "_n", F.col("delta").alias("bc")
            )
            return part.localCheckpoint(eager=False)

        # per-source Brandes passes are independent — overlap them
        # (guide §2.6: a source's tail levels leave the scheduler idle
        # for the next source's BFS).  Parts are unioned in the given
        # source order, so the assembled frame is the same as the
        # serial loop's.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(3, max(1, len(sources)))) as pool:
            parts = list(pool.map(_one_source, sources))
        total: DataFrame | None = None
        for part in parts:
            total = part if total is None else total.unionByName(part)
        out = total.groupBy("_n").agg(F.sum("bc").alias("betweenness"))
        # include zero-score nodes so the schema matches the local path
        return (
            self.nodes.select("_n")
            .join(out, "_n", "left_outer")
            .select("_n", F.coalesce(F.col("betweenness"), F.lit(0.0)).alias("betweenness"))
        )

    # ---- interop (TODO.md:37-39 parity) -------------------------------
    def to_linegraph(
        self,
        weight: str | None = None,
        turn_cost=None,
        allow_uturn: bool = True,
        sep: str = "|",
        coords_col: str | None = None,
        banned_turns: DataFrame | None = None,
        via_splits: DataFrame | None = None,
    ) -> "SparkGraph":
        """Graph-minor / maneuver-graph derivation (reference
        TODO.md:62-70: "Deriving a minor (edges --> nodes) ... graph
        of maneuvers" — a roadmap item the reference never built).
        Every edge ``(u, v)`` becomes a NODE of the minor with id
        ``u<sep>v`` (its attributes carried over, endpoints kept as
        ``_edge_u``/``_edge_v``); every adjacent edge pair
        ``(u→v, v→w)`` becomes an EDGE ``u|v → v|w`` of the minor.

        Minor edge weight = ``weight(e2) + turn_cost(e1, e2)``, so a
        shortest path over the minor from edge ``a`` to edge ``b``
        costs ``w(a) + Σ minor-edge weights`` = (sum of traversed edge
        weights) + (sum of per-maneuver turn penalties): turn
        restrictions become expressible as plain SSSP over the minor —
        no weight ⇒ hop semantics (each maneuver costs 1).

        ``turn_cost``: optional callable ``(e1, e2) -> Column`` where
        ``e1``/``e2`` map an attribute name to that side's Column
        (e.g. ``lambda e1, e2: F.when(F.abs(turn_angle_deg(
        e1("coordinates"), e2("coordinates"))) > 150, 1e6)
        .otherwise(0.0)``).  ``allow_uturn=False`` drops the
        ``(u→v, v→u)`` reversal pairs entirely (the common maneuver-
        model choice) instead of pricing them.

        ``via_splits``: exact via-WAY restriction handling by stateful
        edge splitting (r15-verdict task #2; the design sketched in
        ``sources/osm.banned_turn_pairs``) — a ``(rel_id, kind, seq,
        _u, _v)`` frame (:func:`~entwiner_spark.sources.osm.
        via_way_splits`).  Per restriction the via chain's minor nodes
        are DUPLICATED into a shadow copy (ids suffixed
        ``<sep>r<rel_id>``): the from-way approach's arc onto the
        chain is redirected into the shadow, shadow arcs mirror the
        chain, departures off the chain return to ORIGINAL minor
        nodes, and the shadow's exit onto the to way at the chain end
        does not exist.  Traffic entering the via way from any other
        entrance keeps the original unrestricted maneuvers — the
        sequence ban is exact, unlike the exit-pair approximation.
        All patch frames are restriction-sized and broadcast; the big
        edge table is only ever probed with equi-joins.

        Assumes a SIMPLE digraph — distinct ``(u, v)`` pairs, the
        reference's own ``edges_uv_index`` invariant (SURVEY §1.1);
        parallel edges would emit duplicate minor-node ids.

        Plan shape (scale): ONE self-join, each |E|-row side shuffled
        exactly once — the left side goes from the RAW input straight
        to hash(_v) (skipping a wasted pass through the constructor's
        _u exchange), the right side keeps the constructor's hash(_u)
        partitioning (free when the graph is cached/in-memory); no
        explode, no driver loop, and the pair fan-out per node is
        in-degree × out-degree (bounded by the same skew the adjacency
        itself has — AQE skew-join handles hot intersections).
        """
        eid = lambda u, v: F.concat_ws(sep, u, v)  # noqa: E731
        base = self.edges
        attrs = [c for c in base.columns if c not in ("_u", "_v")]
        lnodes = base.select(
            eid(F.col("_u"), F.col("_v")).alias("_n"),
            F.col("_u").alias("_edge_u"),
            F.col("_v").alias("_edge_v"),
            *attrs,
        )
        vchain = ventry = vexits = None
        if via_splits is not None:
            if "only" not in via_splits.columns:  # pre-r16 frames
                via_splits = via_splits.withColumn(
                    "only", F.lit(False)
                )
            vchain = via_splits.filter(F.col("kind") == "via").select(
                "rel_id",
                "seq",
                F.col("_u").alias("_cu"),
                F.col("_v").alias("_cv"),
                "only",
            )
            ventry = (
                via_splits.filter(F.col("kind") == "from")
                .select(
                    "rel_id",
                    F.col("_u").alias("_fu"),
                    F.col("_v").alias("_fv"),
                    "only",
                )
                .join(
                    F.broadcast(
                        vchain.filter(F.col("seq") == 0).select(
                            "rel_id", "_cu", "_cv"
                        )
                    ),
                    "rel_id",
                )
            )
            vexits = via_splits.filter(F.col("kind") == "to").select(
                F.col("rel_id").alias("_xrel"),
                F.col("_u").alias("_tu"),
                F.col("_v").alias("_tv"),
            )
        j = self._edges_raw.alias("e1").join(
            base.alias("e2"), F.col("e1._v") == F.col("e2._u")
        )
        if not allow_uturn:
            j = j.filter(F.col("e2._v") != F.col("e1._u"))
        if ventry is not None:
            # the approach's original arc onto the chain head is
            # REDIRECTED into the shadow copy (added below) — remove
            # the unrestricted original
            j = j.join(
                F.broadcast(ventry.filter(~F.col("only"))),
                (F.col("e1._u") == F.col("_fu"))
                & (F.col("e1._v") == F.col("_fv"))
                & (F.col("e2._u") == F.col("_cu"))
                & (F.col("e2._v") == F.col("_cv")),
                "left_anti",
            )
            # only_*: the shadow entry is the approach's SOLE legal
            # continuation — every original departure of the from
            # edge disappears (the approach ends at the via junction
            # by construction, so this bans exactly its maneuvers
            # there)
            j = j.join(
                F.broadcast(
                    ventry.filter(F.col("only"))
                    .select("_fu", "_fv")
                    .distinct()
                ),
                (F.col("e1._u") == F.col("_fu"))
                & (F.col("e1._v") == F.col("_fv")),
                "left_anti",
            )
        def _ban_anti(df):
            # OSM turn restrictions (sources/osm.banned_turn_pairs):
            # a banned maneuver is a maneuver the minor graph simply
            # does not contain — an infinite turn cost, expressed as
            # a broadcast anti-join (restrictions are tiny vs |E|²
            # adjacency fan-out; no extra shuffle).  Applied to the
            # main adjacency AND to every shadow arc set (a node-via
            # ban holds inside a via-way shadow too).
            if banned_turns is None:
                return df
            ban = banned_turns.select(
                F.col("_u1").alias("__b_u1"),
                F.col("_v1").alias("__b_v1"),
                F.col("_u2").alias("__b_u2"),
                F.col("_v2").alias("__b_v2"),
            )
            return df.join(
                F.broadcast(ban),
                (F.col("e1._u") == F.col("__b_u1"))
                & (F.col("e1._v") == F.col("__b_v1"))
                & (F.col("e2._u") == F.col("__b_u2"))
                & (F.col("e2._v") == F.col("__b_v2")),
                "left_anti",
            )

        j = _ban_anti(j)
        e1 = lambda c: F.col(f"e1.{c}")  # noqa: E731
        e2 = lambda c: F.col(f"e2.{c}")  # noqa: E731
        # base cost: downstream edge weight, or 1.0 hop semantics when
        # no weight is given — ALSO under a bare turn_cost, so
        # unpenalized maneuvers still cost a hop, not 0 (review fix)
        wcol = e2(weight).cast("double") if weight is not None else F.lit(1.0)
        if turn_cost is not None:
            # degenerate geometries make turn_angle_deg NULL; coalesce
            # so one bad row prices as no-penalty instead of nulling
            # the whole maneuver weight
            wcol = wcol + F.coalesce(
                turn_cost(e1, e2).cast("double"), F.lit(0.0)
            )
        # coords_col: carry each maneuver's signed turn angle onto the
        # minor edge (``_turn_angle_deg``) so downstream classification
        # (geo.maneuver_class) and cost profiles (geo.maneuver_cost)
        # are plain CASE columns — no second self-join to recover the
        # geometry (r11-verdict task #7)
        angle_cols = []
        if coords_col is not None:
            from entwiner_spark.functions.geo import turn_angle_deg

            angle_cols = [
                turn_angle_deg(e1(coords_col), e2(coords_col)).alias(
                    "_turn_angle_deg"
                )
            ]
        ledges = j.select(
            eid(e1("_u"), e1("_v")).alias("_u"),
            eid(e2("_u"), e2("_v")).alias("_v"),
            e1("_v").alias("_via"),
            wcol.alias("w"),
            *angle_cols,
        )
        if via_splits is not None:
            sfx = F.concat(
                F.lit(sep + "r"), F.col("rel_id").cast("string")
            )
            # next chain edge per (rel, seq); NULL marks the chain end
            nxt = vchain.select(
                "rel_id",
                (F.col("seq") - 1).alias("seq"),
                F.col("_cu").alias("_nu"),
                F.col("_cv").alias("_nv"),
            )
            chain_x = vchain.join(
                F.broadcast(nxt), ["rel_id", "seq"], "left"
            )
            # shadow minor nodes: the chain edges, duplicated per
            # restriction, attrs carried like lnodes
            sh_nodes = base.join(
                F.broadcast(vchain),
                (F.col("_u") == F.col("_cu"))
                & (F.col("_v") == F.col("_cv")),
            ).select(
                F.concat(eid(F.col("_u"), F.col("_v")), sfx).alias("_n"),
                F.col("_u").alias("_edge_u"),
                F.col("_v").alias("_edge_v"),
                *attrs,
            )

            def _arc_select(df, s1, s2):
                return df.select(
                    F.concat(eid(e1("_u"), e1("_v")), s1).alias("_u"),
                    F.concat(eid(e2("_u"), e2("_v")), s2).alias("_v"),
                    e1("_v").alias("_via"),
                    wcol.alias("w"),
                    *angle_cols,
                )

            def _no_uturn(df):
                return (
                    df
                    if allow_uturn
                    else df.filter(e2("_v") != e1("_u"))
                )

            # entry + chain-internal shadow arcs share one spec shape:
            # (tail edge, head edge, tail suffix, head suffix)
            specs = ventry.select(
                F.col("_fu").alias("_au"),
                F.col("_fv").alias("_av"),
                F.col("_cu").alias("_bu"),
                F.col("_cv").alias("_bv"),
                F.lit("").alias("_s1"),
                sfx.alias("_s2"),
            ).unionByName(
                chain_x.filter(F.col("_nu").isNotNull()).select(
                    F.col("_cu").alias("_au"),
                    F.col("_cv").alias("_av"),
                    F.col("_nu").alias("_bu"),
                    F.col("_nv").alias("_bv"),
                    sfx.alias("_s1"),
                    sfx.alias("_s2"),
                )
            )
            pa_left = base.alias("e1").join(
                F.broadcast(specs),
                (e1("_u") == F.col("_au")) & (e1("_v") == F.col("_av")),
            )
            # spec-bounded (restriction-sized) at runtime even though
            # statically base-shaped — broadcast it onto the e2 probe,
            # same as the departure joins below
            pa = base.alias("e2").join(
                F.broadcast(pa_left),
                (e2("_u") == F.col("_bu"))
                & (e2("_v") == F.col("_bv")),
            )
            pa = _ban_anti(_no_uturn(pa))
            arcs_in = _arc_select(pa, F.col("_s1"), F.col("_s2"))
            # departures off the chain return to ORIGINAL minor nodes
            # (the restriction's memory ends when the via way is
            # left); the next chain edge is excluded (shadow-to-shadow
            # above), and at the chain end the to-way exits simply do
            # not exist — the exact sequence ban.  only_* inverts the
            # polarity: the shadow is PINNED to the chain (no interior
            # departures) and the chain end permits ONLY the to-way
            # exits — semi-join instead of anti-join
            pd_left = base.alias("e1").join(
                F.broadcast(chain_x.filter(~F.col("only"))),
                (e1("_u") == F.col("_cu")) & (e1("_v") == F.col("_cv")),
            )
            pdep = base.alias("e2").join(
                F.broadcast(pd_left), e2("_u") == e1("_v")
            )
            pdep = pdep.filter(
                ~F.coalesce(
                    (e2("_u") == F.col("_nu"))
                    & (e2("_v") == F.col("_nv")),
                    F.lit(False),
                )
            )
            pdep = _no_uturn(pdep).join(
                F.broadcast(vexits),
                (F.col("rel_id") == F.col("_xrel"))
                & (e2("_u") == F.col("_tu"))
                & (e2("_v") == F.col("_tv")),
                "left_anti",
            )
            pdep = _ban_anti(pdep)
            arcs_out = _arc_select(pdep, sfx, F.lit(""))
            po_left = base.alias("e1").join(
                F.broadcast(
                    chain_x.filter(
                        F.col("only") & F.col("_nu").isNull()
                    )
                ),
                (e1("_u") == F.col("_cu")) & (e1("_v") == F.col("_cv")),
            )
            ponly = base.alias("e2").join(
                F.broadcast(po_left), e2("_u") == e1("_v")
            )
            ponly = _no_uturn(ponly).join(
                F.broadcast(vexits),
                (F.col("rel_id") == F.col("_xrel"))
                & (e2("_u") == F.col("_tu"))
                & (e2("_v") == F.col("_tv")),
                "left_semi",
            )
            ponly = _ban_anti(ponly)
            arcs_only = _arc_select(ponly, sfx, F.lit(""))
            lnodes = lnodes.unionByName(sh_nodes)
            ledges = (
                ledges.unionByName(arcs_in)
                .unionByName(arcs_out)
                .unionByName(arcs_only)
            )
        return SparkGraph(lnodes, ledges)

    def _local_contract_chains(
        self, weight: str | None, keep_path: bool
    ) -> "SparkGraph":
        """Driver-side twin of ``contract_chains`` for small graphs
        (the _use_local gate): identical chain-node rules (one-way /
        two-way / parallel-edge and self-loop exclusions), identical
        outputs — shortcut (u, end, summed w, hops[, via path]) per
        head edge, pure chain cycles emitted unchanged, absorbed
        interiors dropped from nodes.  The distributed path costs
        ~2 driver actions per doubling round; below the threshold the
        whole walk is microseconds on the driver."""
        wexpr = self._weight_col(weight)
        triples = [
            (r["_u"], r["_v"], r["_w"])
            for r in self.edges.select("_u", "_v", wexpr.alias("_w")).collect()
        ]
        from collections import defaultdict

        outs, ins = defaultdict(list), defaultdict(list)
        wmap: dict[tuple[str, str], float] = {}
        for u, v, w in triples:
            outs[u].append(v)
            ins[v].append(u)
            # unique for every edge the walk follows: chain-node
            # out-edges cannot be parallel under the degree rules
            wmap[(u, v)] = w
        def _chain(n: str) -> bool:
            od, idg = len(outs[n]), len(ins[n])
            if od == 1 and idg == 1:
                return outs[n][0] != n and ins[n][0] != n
            if od == 2 and idg == 2:
                ss, ps = set(outs[n]), set(ins[n])
                return len(ss) == 2 and ss == ps and n not in ss
            return False

        chain = {n for n in set(outs) | set(ins) if _chain(n)}

        def _nxt(u: str, v: str):
            if v not in chain:
                return None
            if len(outs[v]) == 1:  # one-way (stub continuation kept)
                return (v, outs[v][0])
            other = [t for t in outs[v] if t != u]
            return (v, other[0])

        shortcuts, cycle_rest, absorbed = [], [], set()
        consumed = set()
        for u, v, w in triples:
            if u in chain:
                continue  # interior: covered by its head's walk
            end, acc, hops, mids = v, w, 1, []
            cur = _nxt(u, v)
            seen_guard = 0
            while cur is not None:
                mids.append(end)
                cu, cv = cur
                cw = wmap[(cu, cv)]
                consumed.add((cu, cv))
                acc += cw
                hops += 1
                end, cur = cv, _nxt(cu, cv)
                seen_guard += 1
                if seen_guard > len(triples):  # unreachable; safety
                    break
            shortcuts.append((u, end, float(acc), hops, mids))
        for n in chain:
            for t in outs[n]:
                if (n, t) not in consumed:
                    # pure chain-cycle edge: no head edge reaches it
                    cycle_rest.append((n, t, float(wmap[(n, t)]), 1, []))
        absorbed = {
            u for (u, _v) in consumed if u in chain
        }
        rows = shortcuts + cycle_rest
        schema = "_u string, _v string, w double, _n_hops long" + (
            ", _via_path array<string>" if keep_path else ""
        )
        edges_out = self.spark.createDataFrame(
            [r if keep_path else r[:4] for r in rows], schema
        )
        nodes_out = self.nodes.filter(
            ~F.col("_n").isin(sorted(absorbed))
            if absorbed
            else F.lit(True)
        )
        return SparkGraph(nodes_out, edges_out)

    def contract_chains(
        self,
        weight: str | None = None,
        max_rounds: int = 64,
        keep_path: bool = False,
        strategy: str = "auto",
    ) -> "SparkGraph":
        """CH-lite preprocessing (reference TODO.md:72 "contraction
        hierarchies" — roadmap, never built there): contract every
        pass-through chain node — one-way (in-degree 1, out-degree 1,
        no self loop) or two-way (in/out-degree 2 with predecessor
        set == successor set, the bidirectional street-graph shape) —
        into shortcut edges whose weight is the summed chain weight
        (``weight`` column, or hop count when None).  Degree-2
        chains are the dominant shape in sidewalk/street networks, so
        this shrinks |V| and |E| — and with them every Pregel
        iteration's shuffle — while preserving all shortest-path
        distances between RETAINED nodes exactly (interior nodes are
        absorbed; their distances are head-distance + a prefix of the
        shortcut, recoverable by expansion).

        Distributed shape: list-ranking by pointer doubling over the
        EDGE table — each edge starts with a ``nxt`` pointer to its
        chain successor (the unique out-edge of its chain-node target)
        and each round composes jumps via one eid-keyed self-join, so
        a chain of length L folds in ⌈log₂ L⌉ rounds with key-local
        shuffles only; no driver loop over nodes.  Pure chain CYCLES
        (every node degree-2 — no head edge can absorb them) are
        detected by the pending-count plateau and emitted uncontracted,
        their nodes retained.  Shortcut rows carry ``_n_hops`` (edges
        folded) so expansion/debugging can tell shortcuts from raw
        edges; ``keep_path=True`` additionally records each shortcut's
        absorbed interior nodes in order (``_via_path``, built by the
        same doubling composition) so ``expand_contracted_path`` can
        reconstruct raw routes — off by default because the arrays are
        chain-length-sized.  ``strategy``: auto (driver-local twin
        below the small-graph threshold, identical rows —
        pytest-pinned), local, or pregel (force distributed).
        """
        if self._use_local(strategy, weight):
            return self._local_contract_chains(weight, keep_path)
        wexpr = self._weight_col(weight)
        e = self.edges.select(
            "_u", "_v", wexpr.alias("_w")
        ).localCheckpoint(eager=True)
        # A "through" chain node is either shape found in real street
        # graphs:
        #  - one-way: in-degree 1 AND out-degree 1 (no self loop);
        #  - two-way: in-degree 2 AND out-degree 2 with predecessor
        #    set == successor set == {a, b}, a ≠ b ≠ v — the dominant
        #    case in bidirectional sidewalk networks, where every
        #    pass-through node carries an edge pair each way.
        # Its ``nxt`` pointer routes an incoming edge (u→v) to the
        # out-edge of v that does NOT return to u — so two-way chains
        # fold straight through in both directions independently and
        # U-turn pairs never enter a pointer cycle.
        # counts first (cheap partial-agg), THEN neighbor sets only for
        # the ≤2-degree candidates — collect_set over every node would
        # build unbounded arrays on hub nodes at scale
        outd = e.groupBy("_u").agg(F.count(F.lit(1)).alias("_od"))
        ind = e.groupBy("_v").agg(F.count(F.lit(1)).alias("_id"))
        cand = (
            outd.filter(F.col("_od") <= 2)
            .withColumnRenamed("_u", "_c")
            .join(
                ind.filter(F.col("_id") <= 2).withColumnRenamed("_v", "_c"),
                "_c",
            )
            .filter(F.col("_od") == F.col("_id"))
        )
        succs = (
            e.join(cand.select(F.col("_c").alias("_u")), "_u")
            .groupBy("_u")
            .agg(F.sort_array(F.collect_set("_v")).alias("_sset"))
        )
        preds = (
            e.join(cand.select(F.col("_c").alias("_v")), "_v")
            .groupBy("_v")
            .agg(F.sort_array(F.collect_set("_u")).alias("_pset"))
        )
        deg = (
            cand.join(succs.withColumnRenamed("_u", "_c"), "_c")
            .join(preds.withColumnRenamed("_v", "_c"), "_c")
        )
        one_way = (
            (F.col("_od") == 1)
            & (F.col("_id") == 1)
            & (F.col("_sset")[0] != F.col("_c"))
            & (F.col("_pset")[0] != F.col("_c"))
        )
        two_way = (
            (F.col("_od") == 2)
            & (F.col("_id") == 2)
            & (F.size("_sset") == 2)  # two REAL neighbors, not a
            # parallel-edge pair collapsing to one
            & (F.col("_sset") == F.col("_pset"))
            & ~F.array_contains(F.col("_sset"), F.col("_c"))
        )
        chain = deg.filter(one_way | two_way).select(
            "_c", one_way.alias("_ow")
        )
        # lossless pair key: a struct, not a separator-joined string —
        # node ids are arbitrary text, so ANY separator byte could
        # occur in an id and silently collide eids (ADVICE r11);
        # Catalyst equality-joins struct keys natively
        eid = F.struct(F.col("_u").alias("eu"), F.col("_v").alias("ev"))
        # nxt map: for each chain node v and each legal incoming
        # source ``_from``, the eid of the continuing out-edge.
        # One-way: 1 row (the unique pred → the unique out-edge, kept
        # even when it bounces back — a u→v→u stub folds to a u→u
        # self-loop shortcut, harmless under positive weights);
        # two-way: 2 of the 4 (in × out) pairs — the non-returning
        # continuations.
        cin = e.join(chain.withColumnRenamed("_c", "_v"), "_v").select(
            F.col("_v").alias("_mid"), F.col("_u").alias("_from"), "_ow"
        )
        cout = e.join(
            chain.drop("_ow").withColumnRenamed("_c", "_u"), "_u"
        ).select(
            F.col("_u").alias("_mid"),
            F.col("_v").alias("_to"),
            eid.alias("_out_eid"),
        )
        nxtmap = (
            cin.join(cout, "_mid")
            .filter(F.col("_ow") | (F.col("_to") != F.col("_from")))
            .select("_mid", "_from", "_out_eid")
        )
        interior = F.col("_int")
        state = (
            e.withColumn("_e", eid)
            .join(
                chain.select(F.col("_c").alias("_u"), F.lit(True).alias("_int")),
                "_u",
                "left",
            )
            .join(
                nxtmap.withColumnRenamed("_mid", "_v").withColumnRenamed(
                    "_from", "_u"
                ),
                ["_u", "_v"],
                "left",
            )
            .select(
                "_e",
                F.col("_u").alias("_head_u"),
                F.col("_v").alias("_orig_v"),
                F.col("_w").alias("_orig_w"),
                F.coalesce(interior, F.lit(False)).alias("_int"),
                F.col("_v").alias("_end"),
                F.col("_w").alias("_acc"),
                F.lit(1).cast("long").alias("_hops"),
                *(
                    [F.array().cast("array<string>").alias("_mids")]
                    if keep_path
                    else []
                ),
                F.col("_out_eid").alias("_nxt"),
            )
            # lazy + count fold (one job materializes and probes)
            .localCheckpoint(eager=False)
        )
        pending = state.filter(F.col("_nxt").isNotNull()).count()
        for _ in range(max_rounds):
            if pending == 0:
                break
            t = state.select(
                F.col("_e").alias("_t_e"),
                F.col("_end").alias("_t_end"),
                F.col("_acc").alias("_t_acc"),
                F.col("_hops").alias("_t_hops"),
                *([F.col("_mids").alias("_t_mids")] if keep_path else []),
                F.col("_nxt").alias("_t_nxt"),
            )
            state = rebase_checkpoint(
                state.join(t, state["_nxt"] == t["_t_e"], "left").select(
                    "_e",
                    "_head_u",
                    "_orig_v",
                    "_orig_w",
                    "_int",
                    F.coalesce("_t_end", "_end").alias("_end"),
                    F.when(
                        F.col("_t_acc").isNotNull(),
                        F.col("_acc") + F.col("_t_acc"),
                    )
                    .otherwise(F.col("_acc"))
                    .alias("_acc"),
                    F.when(
                        F.col("_t_hops").isNotNull(),
                        F.col("_hops") + F.col("_t_hops"),
                    )
                    .otherwise(F.col("_hops"))
                    .alias("_hops"),
                    *(
                        [
                            # junction node between the two folded
                            # segments = this edge's pre-merge _end
                            F.when(
                                F.col("_t_acc").isNotNull(),
                                F.concat(
                                    "_mids",
                                    F.array("_end"),
                                    "_t_mids",
                                ),
                            )
                            .otherwise(F.col("_mids"))
                            .alias("_mids")
                        ]
                        if keep_path
                        else []
                    ),
                    F.col("_t_nxt").alias("_nxt"),
                ),
                # probe-fold: the count below materializes the rebase
                # before the next round's self-join references it
                eager=False,
            )
            now = state.filter(F.col("_nxt").isNotNull()).count()
            if now == pending:  # plateau: only pure chain cycles left
                break
            pending = now
        path_cols = (
            [F.col("_mids").alias("_via_path")] if keep_path else []
        )
        shortcuts = state.filter(~F.col("_int")).select(
            F.col("_head_u").alias("_u"),
            F.col("_end").alias("_v"),
            F.col("_acc").alias("w"),
            F.col("_hops").alias("_n_hops"),
            *path_cols,
        )
        cycle_rest = state.filter(
            F.col("_int") & F.col("_nxt").isNotNull()
        ).select(
            F.col("_head_u").alias("_u"),
            F.col("_orig_v").alias("_v"),
            F.col("_orig_w").alias("w"),
            F.lit(1).cast("long").alias("_n_hops"),
            *(
                [F.array().cast("array<string>").alias("_via_path")]
                if keep_path
                else []
            ),
        )
        absorbed = state.filter(
            F.col("_int") & F.col("_nxt").isNull()
        ).select(F.col("_head_u").alias("_n")).distinct()
        new_nodes = self.nodes.join(absorbed, "_n", "left_anti")
        return SparkGraph(
            new_nodes, shortcuts.unionByName(cycle_rest)
        )

    def expand_contracted_path(self, path: list[str]) -> list[str]:
        """Expand a node path over a ``contract_chains(keep_path=True)``
        graph back to the RAW node sequence: each consecutive pair's
        minimum-weight shortcut contributes its recorded ``_via_path``
        interiors (under positive weights any minimum-weight shortcut
        lies on a true shortest path, so ties expand to a valid
        optimum).  Driver-side over one small filtered collect — the
        path is route-sized, not graph-sized."""
        if "_via_path" not in self.edges.columns:
            raise ValueError(
                "expand_contracted_path needs a graph built by "
                "contract_chains(keep_path=True) (no _via_path column)"
            )
        if len(path) < 2:
            return list(path)
        pairs = set(zip(path, path[1:]))
        # prefilter by endpoint membership (path-sized isin lists; no
        # separator-joined key — ids may contain any byte, ADVICE r11);
        # the slight superset is resolved by the exact-pair dict below
        nodes_on_path = sorted({n for p in pairs for n in p})
        best: dict[tuple[str, str], tuple[float, list[str]]] = {}
        for r in (
            self.edges.filter(
                F.col("_u").isin(nodes_on_path)
                & F.col("_v").isin(nodes_on_path)
            )
            .select("_u", "_v", "w", "_via_path")
            .collect()
        ):
            if (r["_u"], r["_v"]) not in pairs:
                continue
            k = (r["_u"], r["_v"])
            if k not in best or r["w"] < best[k][0]:
                best[k] = (r["w"], list(r["_via_path"] or []))
        out = [path[0]]
        for a, b in zip(path, path[1:]):
            if (a, b) not in best:
                raise KeyError(f"no contracted edge {a!r} -> {b!r}")
            out.extend(best[(a, b)][1])
            out.append(b)
        return out

    def relabel_ids(
        self, method: str = "hash", check_collisions: bool = True
    ) -> tuple["SparkGraph", DataFrame]:
        """Re-key node ids to 8-byte longs (reference TODO.md
        "(Re-)Defining node and edge keys": "relabel into integers or
        associate an ``_id`` column").  The scale rationale: every
        iterative operator (Pregel/SSSP/CC/SCC/kcore/ANF) shuffles the
        node key once or more per round, and this engine's natural ids
        are ``"lon, lat"`` strings (~20-25 bytes); relabeled longs cut
        the key bytes ~3x on every exchange of every round.  Returns
        ``(graph, mapping)`` where ``mapping`` is ``(_id long,
        _n original)`` — compute on the long-keyed graph, then
        ``SparkGraph.restore_ids(result, mapping, cols=[...])`` joins
        original ids back on exit (one shuffle join per restored
        column, paid once, not per round).

        ``method="hash"``: ``_id = xxhash64(_n)`` — MAP-ONLY on both
        tables (no join anywhere: edges re-key by hashing their own
        endpoint strings; the mapping table is emitted for restore,
        never consumed by the relabel), and ids are stable across runs
        and engines.  Collision policy: xxhash64 is a full 64-bit
        hash, so by the birthday bound E[collisions] ≈ n²/2^65 (~0.03
        expected at 1e9 nodes); ``check_collisions=True`` (default)
        pays ONE count-distinct aggregate over the mapping and raises
        ``ValueError`` if any two distinct node ids share a hash —
        disable only when re-relabeling a corpus already validated.

        ``method="dense"``: ``monotonically_increasing_id()`` over the
        distinct node table — collision-free by construction (unique,
        not contiguous), but edges re-key via TWO mapping joins (the
        one-time cost the hash path avoids) and ids are not stable
        across runs (partition-layout dependent).

        All node attribute columns survive on both tables; ``_n``/
        ``_u``/``_v`` swap to longs in place.
        """
        all_ids = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
        )
        if method == "hash":
            mapping = all_ids.select(
                F.xxhash64("_n").alias("_id"), "_n"
            )
            if check_collisions:
                r = mapping.agg(
                    F.count_distinct("_id").alias("ids"),
                    F.count(F.lit(1)).alias("ns"),
                ).collect()[0]
                if r["ids"] != r["ns"]:
                    raise ValueError(
                        f"xxhash64 collision: {r['ns']} node ids hash "
                        f"to {r['ids']} longs — use method='dense'"
                    )
            nodes = self.nodes.withColumn("_n", F.xxhash64("_n"))
            edges = self.edges.withColumn(
                "_u", F.xxhash64("_u")
            ).withColumn("_v", F.xxhash64("_v"))
        elif method == "dense":
            mapping = all_ids.select(
                F.monotonically_increasing_id().alias("_id"), "_n"
            ).localCheckpoint(eager=True)  # pin the non-deterministic ids
            mu = mapping.select(F.col("_n").alias("_u"), F.col("_id"))
            mv = mapping.select(F.col("_n").alias("_v"), F.col("_id"))
            nodes = (
                self.nodes.join(mapping, "_n")
                .drop("_n")
                .withColumnRenamed("_id", "_n")
            )
            edges = (
                self.edges.join(mu, "_u")
                .drop("_u")
                .withColumnRenamed("_id", "_u")
                .join(mv, "_v")
                .drop("_v")
                .withColumnRenamed("_id", "_v")
            )
        else:
            raise ValueError(
                f"method must be 'hash' or 'dense', got {method!r}"
            )
        # keep the documented column order (_n first / _u, _v first)
        nodes = nodes.select(
            "_n", *[c for c in self.nodes.columns if c != "_n"]
        )
        edges = edges.select(
            "_u", "_v", *[c for c in self.edges.columns if c not in ("_u", "_v")]
        )
        return SparkGraph(nodes, edges), mapping

    @staticmethod
    def restore_ids(df: DataFrame, mapping: DataFrame, cols: list[str]) -> DataFrame:
        """Join original node ids back onto a result computed on a
        ``relabel_ids()`` graph: each column in ``cols`` (long ids —
        e.g. ``_n``, ``component``, ``pred``) is replaced in place by
        the original id via one mapping join (left join: a NULL id —
        e.g. an unreached ``pred`` — stays NULL).  Column order is
        preserved, so a restored result compares equal to the
        string-keyed run column-for-column."""
        for c in cols:
            m = mapping.select(
                F.col("_id").alias(c), F.col("_n").alias(f"__{c}_orig")
            )
            df = (
                df.join(m, c, "left")
                .withColumn(c, F.col(f"__{c}_orig"))
                .drop(f"__{c}_orig")
            )
        return df

    def run_relabeled(
        self,
        compute,
        restore_cols: tuple[str, ...] = ("_n",),
        method: str = "hash",
    ) -> DataFrame:
        """One-line form of the relabel lifecycle: re-key to longs, run
        ``compute(long_keyed_graph) -> DataFrame``, join original ids
        back onto ``restore_cols``.  Every iterative round inside
        ``compute`` shuffles 8-byte keys instead of id strings (the
        measured 1.73× Pregel wall cut — PLANS.md r12); the two
        restore joins are paid once on exit, not per round.  For
        build-once/compute-many pipelines call :meth:`relabel_ids`
        directly and keep the mapping."""
        g, mapping = self.relabel_ids(method=method)
        return SparkGraph.restore_ids(compute(g), mapping, list(restore_cols))

    def to_networkx(self):
        """Collect to an nx.DiGraph — small graphs only (driver-side)."""
        import networkx as nx  # optional dependency

        g = nx.DiGraph()
        for row in self.nodes.collect():
            d = row.asDict()
            g.add_node(d.pop("_n"), **d)
        for row in self.edges.collect():
            d = row.asDict()
            g.add_edge(d.pop("_u"), d.pop("_v"), **d)
        return g
