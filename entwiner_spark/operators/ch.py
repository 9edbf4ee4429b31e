"""Full contraction hierarchies (reference TODO.md:70 "contraction
hierarchies" — roadmap, never built there; the r12-verdict task #3
escalation of ``contract_chains``, which only folds degree-2 chains).

Real CH contracts EVERY node in importance order, adding witness-
checked shortcuts, and answers point-to-point queries with a
bidirectional search that only ever walks "upward" in the hierarchy —
the search space shrinks from the whole graph to two tiny cones, which
is where the order-of-magnitude route speedups at continental scale
live (Geisberger et al. 2008, the public algorithm every router uses).

Distributed decomposition — the batched-IS form the PHAST/distributed
CH literature uses, expressed as DataFrame fixpoints:

* **build** — per round: (1) node priority = edge difference
  (in·out − in − out) from two cheap degree aggregates; (2) contract
  the INDEPENDENT SET of local priority minima (no two adjacent, so
  simultaneous contractions cannot interact — the standard batched
  rule; ties broken by xxhash64 then id, so the set is deterministic);
  (3) shortcuts = in-edges × out-edges of each contracted node (one
  equi-join), parallel-min'd and dominated-pruned (a direct active
  edge ≤ the shortcut is a 1-hop witness — keeping extra shortcuts is
  CORRECT, just less minimal, so the cheap witness keeps the build
  join-only); (4) survivors ∪ shortcuts become the next round's
  active graph.  Every round preserves all pairwise distances among
  still-active nodes, which is the CH exactness invariant.
* **core cutoff** — after ``max_rounds`` the remaining active nodes
  (if any) become an uncontracted CORE sharing the top rank; queries
  treat core-internal edges as upward for BOTH searches (the
  standard "core-CH" construction — exact, because nothing inside
  the core was contracted, so no shortcut is missing).
* **query** — bidirectional upward search: ONE state frame with a
  ``side`` column (fwd rows expand over rank-increasing edges,
  bwd rows walk rank-increasing edges backwards), ONE fused
  union+groupBy merge per round (the SSSP shape), and a probe that
  stops both sides once no frontier f-value can undercut the best
  meeting cost μ.  Below ``LOCAL_THRESHOLD`` search edges the query
  runs as driver-local bidirectional Dijkstra (same results,
  pytest-pinned parity).

Shortcut unpacking records the bypassed node (``mid``) per shortcut
and expands the route level-by-level on the driver — O(route length)
rows collected, never the graph.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entwiner_spark.operators.graph import rebase_checkpoint
from entwiner_spark.session import scoped_shuffle_partitions


def _scaled_shuffle(fn):
    """Scope the session's shuffle-partition count to the hierarchy's
    own size for the duration of a query method (guide §2.2): every
    round of the bidirectional / PHAST loops shuffles <= a few
    multiples of ``n_search_edges`` tiny rows, so on a 32-core local
    session a small hierarchy pays 32 map outputs + AQE planning per
    round for near-empty partitions.  All loop merges are min/count
    aggregates (partition-invariant), and at real scale the derived
    value exceeds the session setting, making this a no-op."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with scoped_shuffle_partitions(self.spark, self.n_search_edges):
            return fn(self, *args, **kwargs)

    return wrapper

#: Rank assigned to every uncontracted core node (top of hierarchy).
CORE_RANK = 1 << 62

#: Search-edge count below which route() collects and runs locally.
LOCAL_THRESHOLD = 50_000


def _min_edges(edges: DataFrame) -> DataFrame:
    """Parallel-edge min: one row per (u, v) keeping the cheapest
    weight (mid rides along in the struct-min, deterministically —
    NULL mid, i.e. an original edge, sorts FIRST on ties, so an
    equal-weight original beats a shortcut and unpacking stays
    shallow)."""
    return (
        edges.groupBy("_u", "_v")
        .agg(
            F.min(
                F.struct(
                    F.col("w"),
                    F.col("mid").isNotNull().alias("_is_sc"),
                    F.col("mid"),
                )
            ).alias("b")
        )
        .select("_u", "_v", F.col("b.w").alias("w"), F.col("b.mid").alias("mid"))
    )


class ContractionHierarchy:
    """Built artifact: ``ranks`` (_n, rank) and ``search`` — every
    original edge plus every shortcut, parallel-min'd, annotated with
    endpoint ranks.  Build once, route many (the r12 ``contracted=``
    lifecycle)."""

    def __init__(
        self,
        spark: SparkSession,
        ranks: DataFrame,
        search: DataFrame,
        n_search_edges: int,
        rounds: int,
        core_size: int,
        edge_fingerprint: str | None = None,
        customizable: bool = False,
        orig_edges: DataFrame | None = None,
    ):
        self.spark = spark
        self.ranks = ranks
        self.search = search
        self.n_search_edges = n_search_edges
        self.rounds = rounds
        self.core_size = core_size
        self.edge_fingerprint = edge_fingerprint
        self.customizable = customizable
        self.orig_edges = orig_edges
        self._local_cache: tuple | None = None

    # ------------------------------------------------------ freshness
    @staticmethod
    def _graph_fingerprint(graph, weight) -> str:
        """Order-independent digest of the canonical routable edge
        frame (self-loops dropped, parallel-min'd, weight projected) —
        ``count:bit_xor(xxhash64(u, v, w))``.  Cheap (one aggregate scan)
        and exactly the frame ``build`` contracts, so any keyed edge
        mutation (M1/M2), weight change, or added/dropped edge flips
        it."""
        w = graph._weight_col(weight)
        e = (
            graph.edges.select("_u", "_v", w.cast("double").alias("w"))
            .filter(F.col("_u") != F.col("_v"))
            .groupBy("_u", "_v")
            .agg(F.min("w").alias("w"))
        )
        row = e.select(
            F.xxhash64(
                F.col("_u").cast("string"),
                F.col("_v").cast("string"),
                F.col("w").cast("string"),
            ).alias("_h")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold: order-independent and overflow-free (ANSI-safe,
            # unlike sum over int64 hashes)
            F.expr("bit_xor(_h)").alias("h"),
        ).collect()[0]
        return f"{row['n']}:{row['h']}"

    def check_fresh(self, graph, weight: str | None = None) -> None:
        """Raise unless ``graph``'s edge table still matches the one
        this hierarchy was built from (same ``weight`` argument as the
        build).  A persisted artifact outlives the session; after a
        keyed update (operators/mutations M1/M2) it would otherwise
        silently serve STALE shortcut costs — the contract is rebuild
        (or refuse), never wrong answers."""
        if self.edge_fingerprint is None:
            raise ValueError(
                "hierarchy carries no edge fingerprint (pre-r15 "
                "artifact); rebuild to enable staleness checking"
            )
        live = self._graph_fingerprint(graph, weight)
        if live != self.edge_fingerprint:
            raise RuntimeError(
                f"stale contraction hierarchy: built from edge table "
                f"{self.edge_fingerprint} but the live graph hashes to "
                f"{live} — the edges changed since build(); rebuild "
                "the hierarchy before routing"
            )

    # ----------------------------------------------------- persistence
    _META = "_ch_meta.json"

    def save(self, store_dir: str, partitions: int | None = None) -> None:
        """Persist the artifact — search table, ranks, counters — with
        the parquet store's temp→atomic-rename publish (readers never
        observe a half-written artifact; reference build.py:44-47
        ethos: the expensive build must outlive the session,
        /root/reference/TODO.md:27-31).  Search edges land
        hash-partitioned and sorted by ``_u`` so a reloaded artifact's
        upward expansions hit parquet min/max stats, same as the graph
        store's adjacency layout."""
        import json
        import os
        import shutil
        import tempfile

        if "://" in store_dir:
            raise ValueError(
                f"{store_dir}: CH store publishes via local-FS rename; "
                "use a local path"
            )
        parent = os.path.dirname(os.path.abspath(store_dir)) or "."
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="_chstore_tmp_", dir=parent)
        try:
            n = partitions or int(
                self.spark.conf.get("spark.sql.shuffle.partitions")
            )
            (
                self.search.repartition(n, "_u")
                .sortWithinPartitions("_u")
                .write.mode("overwrite")
                .parquet(f"{tmp}/search.parquet")
            )
            (
                self.ranks.repartition(max(1, n // 4), "_n")
                .sortWithinPartitions("_n")
                .write.mode("overwrite")
                .parquet(f"{tmp}/ranks.parquet")
            )
            if self.customizable and self.orig_edges is not None:
                (
                    self.orig_edges.repartition(max(1, n // 4), "_u")
                    .sortWithinPartitions("_u")
                    .write.mode("overwrite")
                    .parquet(f"{tmp}/orig.parquet")
                )
            with open(os.path.join(tmp, self._META), "w") as fh:
                json.dump(
                    {
                        "n_search_edges": self.n_search_edges,
                        "rounds": self.rounds,
                        "core_size": self.core_size,
                        "edge_fingerprint": self.edge_fingerprint,
                        "customizable": self.customizable,
                    },
                    fh,
                )
            # replace-aside publish: the previous artifact is renamed
            # away (atomic) BEFORE the new one renames in.  A crash
            # between the two renames leaves the store path ABSENT with
            # the previous artifact intact at .old — load() recovers
            # that case by falling back to .old.  No state ever exposes
            # a half-written artifact under the store path itself.
            old = store_dir + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(store_dir):
                os.rename(store_dir, old)
            os.rename(tmp, store_dir)
            if os.path.exists(old):
                shutil.rmtree(old, ignore_errors=True)
        finally:
            if os.path.exists(tmp):
                shutil.rmtree(tmp, ignore_errors=True)

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        store_dir: str,
        graph=None,
        weight: str | None = None,
    ) -> "ContractionHierarchy":
        """Reload a ``save()``d artifact into a routable hierarchy —
        build once (hours at scale), route many, across sessions.

        Pass ``graph`` (and the build's ``weight``) to verify the
        artifact against the LIVE edge table before routing
        (:meth:`check_fresh`) — a keyed update since ``save()`` raises
        loudly instead of silently serving stale costs."""
        import json
        import os

        meta_path = os.path.join(store_dir, cls._META)
        if not os.path.exists(meta_path):
            # crash-window recovery: save() publishes via two renames
            # (store -> .old, tmp -> store); a crash between them
            # leaves the previous artifact intact at .old with no
            # store dir.  Serve that artifact rather than failing —
            # it is the last fully-published version.
            old = store_dir + ".old"
            if not os.path.exists(store_dir) and os.path.exists(
                os.path.join(old, cls._META)
            ):
                store_dir = old
                meta_path = os.path.join(store_dir, cls._META)
            else:
                raise FileNotFoundError(
                    f"{store_dir}: not a CH store (no {cls._META})"
                )
        with open(meta_path) as fh:
            meta = json.load(fh)
        search = spark.read.parquet(f"{store_dir}/search.parquet")
        ranks = spark.read.parquet(f"{store_dir}/ranks.parquet")
        customizable = bool(meta.get("customizable", False))
        orig = None
        if customizable and os.path.exists(f"{store_dir}/orig.parquet"):
            orig = spark.read.parquet(f"{store_dir}/orig.parquet")
        ch = cls(
            spark,
            ranks,
            search,
            int(meta["n_search_edges"]),
            int(meta["rounds"]),
            int(meta["core_size"]),
            meta.get("edge_fingerprint"),
            customizable=customizable,
            orig_edges=orig,
        )
        if graph is not None:
            ch.check_fresh(graph, weight)
        return ch

    # ----------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        graph,
        weight: str | None = None,
        max_rounds: int = 32,
        strategy: str = "auto",
        local_finish: int = 4096,
        customizable: bool = False,
    ) -> "ContractionHierarchy":
        """Contract ``graph`` (a SparkGraph) bottom-up.  ``weight``:
        edge-weight column (hop count when None) — must be positive.
        ``max_rounds`` bounds the driver loop; anything still active
        afterwards becomes the exact core (see module docstring).

        ``strategy``: ``auto`` builds driver-locally below the
        small-graph threshold (textbook lazy-priority-queue CH with a
        BOUNDED witness Dijkstra — better shortcut minimality, zero
        Spark rounds; contracts fully, so ``max_rounds``/core apply
        to the distributed build only) and distributed above it;
        ``local``/``pregel`` force.  Both produce the same artifact class, so route() and
        unpacking are build-agnostic; different build orders give
        different hierarchies but identical (exact) route results —
        pytest-pinned.

        ``customizable=True`` builds a RE-METRIC-ABLE hierarchy (the
        CCH shape, Dibbelt-Strasser-Wagner): witness pruning weakens
        to direct-arc dominance only, so every contraction triangle's
        closing arc survives into the search graph, and the original
        edge frame is retained — :meth:`customize` can then assign
        exact arc weights for ANY positive metric without
        recontracting (the penalty-method :meth:`alternatives`
        lifecycle).  Costs more shortcuts than a witness-pruned build
        (the standard CCH trade)."""
        if strategy == "local" or (
            strategy == "auto" and graph._edge_count() < LOCAL_THRESHOLD
        ):
            return cls._build_local(
                graph, weight, max_rounds, customizable=customizable
            )
        # scope the build loop's shuffles to the graph's size (exact
        # memoized count; see _scaled_shuffle — same rationale, but the
        # artifact doesn't exist yet so the basis is the input edges)
        with scoped_shuffle_partitions(graph.spark, graph._edge_count()):
            return cls._build_pregel(
                graph,
                weight,
                max_rounds,
                local_finish=local_finish,
                customizable=customizable,
            )

    @staticmethod
    def _contract_core(
        emap: dict,
        nodes: set,
        start_rank: int = 0,
        full_witness: bool = True,
    ) -> tuple[dict, dict]:
        """Driver-side contraction engine shared by the local build and
        the distributed build's LOCAL FINISH: classic CH (lazy priority
        queue on edge difference, witness search = Dijkstra bounded to
        the shortcut cost with a settled-node cap — capping only ADDS
        shortcuts, never loses one, so exactness is preserved).

        ``emap``: ``{(u, v): w}`` parallel-min edges, no self loops.
        Returns ``(ranks, updates)`` — ranks starting at
        ``start_rank + 1``, and ONLY the new/improved shortcut edges
        as ``{(u, v): (w, mid)}``.

        ``full_witness=False`` (customizable hierarchies): prune only
        on a dominating DIRECT arc, never on a multi-hop witness — the
        arc set then contains every contraction triangle's closing arc
        (either the shortcut or the direct arc that dominated it), the
        invariant :meth:`customize` needs to re-derive exact arc
        weights for a NEW metric (Dibbelt-Strasser-Wagner CCH
        customization; a multi-hop witness can get worse under the new
        metric, and the pruned shortcut would then be missing)."""
        import heapq

        adj: dict = {}
        radj: dict = {}
        for (u, v), w in emap.items():
            adj.setdefault(u, {})[v] = w
            radj.setdefault(v, {})[u] = w
        best = dict(emap)  # min known weight per pair (orig + shortcuts)
        updates: dict = {}
        contracted: set = set()

        def edge_diff(v):
            ins = [u for u in radj.get(v, {}) if u not in contracted]
            outs = [x for x in adj.get(v, {}) if x not in contracted]
            return len(ins) * len(outs) - len(ins) - len(outs)

        def witness(u, x, bound, skip, cap=60):
            """True iff a path u->x avoiding ``skip`` costs <= bound."""
            dist = {u: 0.0}
            pq = [(0.0, id(u), u)]
            settled = 0
            while pq and settled < cap:
                d, _i, a = heapq.heappop(pq)
                if d > dist.get(a, float("inf")):
                    continue
                settled += 1
                if a == x:
                    return d <= bound
                if d > bound:
                    return False
                for b, w in adj.get(a, {}).items():
                    if b == skip or b in contracted:
                        continue
                    nd = d + w
                    if nd < dist.get(b, float("inf")):
                        dist[b] = nd
                        heapq.heappush(pq, (nd, id(b), b))
            return dist.get(x, float("inf")) <= bound

        pq = [(edge_diff(v), str(v), v) for v in nodes]
        heapq.heapify(pq)
        ranks: dict = {}
        rank = start_rank
        while pq:
            p, _s, v = heapq.heappop(pq)
            if v in contracted:
                continue
            np = edge_diff(v)
            if np > p:  # lazy re-evaluation
                heapq.heappush(pq, (np, str(v), v))
                continue
            rank += 1
            ranks[v] = rank
            contracted.add(v)
            ins = [
                (u, w)
                for u, w in radj.get(v, {}).items()
                if u not in contracted
            ]
            outs = [
                (x, w)
                for x, w in adj.get(v, {}).items()
                if x not in contracted
            ]
            for u, w1 in ins:
                for x, w2 in outs:
                    if u == x:
                        continue
                    sw = w1 + w2
                    cur = adj.get(u, {}).get(x)
                    if cur is not None and cur <= sw:
                        continue
                    if full_witness and witness(u, x, sw, v):
                        continue
                    adj.setdefault(u, {})[x] = sw
                    radj.setdefault(x, {})[u] = sw
                    if (u, x) not in best or sw < best[(u, x)]:
                        best[(u, x)] = sw
                        updates[(u, x)] = (sw, v)
        return ranks, updates

    @classmethod
    def _build_local(
        cls, graph, weight, max_rounds, customizable: bool = False
    ) -> "ContractionHierarchy":
        """Driver-local build: collect the (small) edge table, run the
        shared contraction core, assemble the artifact."""
        spark = graph.spark
        idt = graph._id_type()
        wcol = graph._weight_col(weight)
        nodes = {r["_n"] for r in graph.nodes.select("_n").collect()}
        emap: dict = {}
        for r in (
            graph.edges.select("_u", "_v", wcol.cast("double").alias("__w"))
            .filter(F.col("_u") != F.col("_v"))
            .collect()
        ):
            u, v, w = r["_u"], r["_v"], r["__w"]
            nodes.add(u)
            nodes.add(v)
            if (u, v) not in emap or w < emap[(u, v)]:
                emap[(u, v)] = w
        ranks, updates = cls._contract_core(
            emap, nodes, full_witness=not customizable
        )
        search = {k: (w, None) for k, w in emap.items()}
        search.update(updates)
        rows = [
            (u, v, float(w), mid, ranks[u], ranks[v])
            for (u, v), (w, mid) in sorted(
                search.items(), key=lambda kv: (str(kv[0][0]), str(kv[0][1]))
            )
        ]
        schema = T.StructType(
            [
                T.StructField("_u", idt, False),
                T.StructField("_v", idt, False),
                T.StructField("w", T.DoubleType(), False),
                T.StructField("mid", idt, True),
                T.StructField("_ru", T.LongType(), False),
                T.StructField("_rv", T.LongType(), False),
            ]
        )
        search_df = spark.createDataFrame(rows, schema)
        ranks_df = spark.createDataFrame(
            sorted(ranks.items(), key=lambda kv: str(kv[0])),
            T.StructType(
                [
                    T.StructField("_n", idt, False),
                    T.StructField("rank", T.LongType(), False),
                ]
            ),
        )
        orig = None
        if customizable:
            orig = spark.createDataFrame(
                [
                    (u, v, float(w))
                    for (u, v), w in sorted(
                        emap.items(),
                        key=lambda kv: (str(kv[0][0]), str(kv[0][1])),
                    )
                ],
                T.StructType(
                    [
                        T.StructField("_u", idt, False),
                        T.StructField("_v", idt, False),
                        T.StructField("w", T.DoubleType(), False),
                    ]
                ),
            )
        return cls(
            spark,
            ranks_df,
            search_df,
            len(rows),
            len(ranks),
            0,
            cls._graph_fingerprint(graph, weight),
            customizable=customizable,
            orig_edges=orig,
        )

    @classmethod
    def _build_pregel(
        cls,
        graph,
        weight: str | None = None,
        max_rounds: int = 32,
        local_finish: int = 4096,
        customizable: bool = False,
    ) -> "ContractionHierarchy":
        """Distributed batched-IS build.  ``local_finish``: once the
        unranked remainder fits under this count, collect it and let
        the shared driver-side core contract the TOP of the hierarchy
        — the remainder is where the IS shrinks to a handful of nodes
        per round and per-round Spark latency dominates (measured: the
        25-node DAG spends most of its wall on the last 5 single-node
        rounds).  The top of a CH is small and dense by construction,
        so this is the standard hybrid; set 0 to disable (remainder
        past max_rounds then becomes the exact CORE)."""
        spark = graph.spark
        idt = graph._id_type()
        w = graph._weight_col(weight)
        active = (
            graph.edges.select(
                F.col("_u"), F.col("_v"), w.cast("double").alias("w")
            )
            .filter(F.col("_u") != F.col("_v"))  # self loops never route
            .withColumn("mid", F.lit(None).cast(idt))
        )
        active = _min_edges(active).localCheckpoint(eager=True)
        orig0 = active.select("_u", "_v", "w") if customizable else None
        # endpoints may reference nodes absent from the nodes table
        # (partial loads); every endpoint MUST get a rank or the final
        # inner rank-join would silently drop its search edges
        all_nodes = (
            graph.nodes.select("_n")
            .unionByName(active.select(F.col("_u").alias("_n")))
            .unionByName(active.select(F.col("_v").alias("_n")))
            .distinct()
        )
        rank_schema = T.StructType(
            [
                T.StructField("_n", idt, False),
                T.StructField("rank", T.LongType(), False),
            ]
        )
        search_parts = [active]
        rank_parts: list[DataFrame] = []
        import os
        import time as _time

        debug = os.environ.get("CH_BUILD_DEBUG") == "1"
        # lazy checkpoint + count fold: the count materializes the
        # checkpoint and returns the probe value in one scheduled job
        unranked = all_nodes.localCheckpoint(eager=False)
        n_left = unranked.count()
        rounds = 0
        for r in range(1, max_rounds + 1):
            if n_left == 0 or n_left <= local_finish:
                break
            rounds = r
            _t0 = _time.time()
            outd = active.groupBy("_u").agg(F.count(F.lit(1)).alias("_od"))
            ind = active.groupBy("_v").agg(F.count(F.lit(1)).alias("_id"))
            prio = (
                unranked.join(
                    outd.withColumnRenamed("_u", "_n"), "_n", "left"
                )
                .join(ind.withColumnRenamed("_v", "_n"), "_n", "left")
                .select(
                    "_n",
                    F.struct(
                        (
                            F.coalesce(F.col("_od"), F.lit(0))
                            * F.coalesce(F.col("_id"), F.lit(0))
                            - F.coalesce(F.col("_od"), F.lit(0))
                            - F.coalesce(F.col("_id"), F.lit(0))
                        ).alias("p"),
                        F.xxhash64(F.col("_n").cast("string")).alias("h"),
                        F.col("_n").alias("n"),
                    ).alias("_key"),
                )
            )
            # neighbor relation (both directions), then min neighbor key
            nbr = (
                active.select(F.col("_u").alias("_a"), F.col("_v").alias("_b"))
                .unionByName(
                    active.select(
                        F.col("_v").alias("_a"), F.col("_u").alias("_b")
                    )
                )
                .join(
                    prio.select(
                        F.col("_n").alias("_b"), F.col("_key").alias("_bkey")
                    ),
                    "_b",
                )
                .groupBy("_a")
                .agg(F.min("_bkey").alias("_minnbr"))
            )
            # EAGER checkpoints throughout: a lazy localCheckpoint here
            # nests every prior round's plan into this one and Catalyst
            # analysis goes exponential (measured: 33s rounds on a
            # 25-node graph by round 9 — the r13 build-loop lesson)
            isdf = (
                prio.join(nbr.withColumnRenamed("_a", "_n"), "_n", "left")
                .filter(
                    F.col("_minnbr").isNull()
                    | (F.col("_key") < F.col("_minnbr"))
                )
                .select("_n")
            )
            # lazy rebase + count fold (one job; the count is the
            # first and only action before isdf is re-referenced)
            isdf = rebase_checkpoint(isdf, eager=False)
            n_left -= isdf.count()
            inc = active.join(
                isdf.withColumnRenamed("_n", "_v"), "_v"
            ).select(
                F.col("_u").alias("_su"),
                F.col("_v").alias("_mid"),
                F.col("w").alias("_w1"),
            )
            out = active.join(
                isdf.withColumnRenamed("_n", "_u"), "_u"
            ).select(
                F.col("_u").alias("_mid"),
                F.col("_v").alias("_sv"),
                F.col("w").alias("_w2"),
            )
            sc = (
                inc.join(out, "_mid")
                .filter(F.col("_su") != F.col("_sv"))
                .select(
                    F.col("_su").alias("_u"),
                    F.col("_sv").alias("_v"),
                    (F.col("_w1") + F.col("_w2")).alias("w"),
                    F.col("_mid").alias("mid"),
                )
            )
            # checkpoint: the witness stage references sc three times
            # (candidates + two endpoint semi-joins) — don't recompute
            # the generation join per reference
            sc = rebase_checkpoint(_min_edges(sc))
            survivors = active.join(
                isdf.withColumnRenamed("_n", "_u"), "_u", "left_anti"
            ).join(isdf.withColumnRenamed("_n", "_v"), "_v", "left_anti")
            # witness pruning — without it grid-like graphs blow up in
            # shortcuts (the classic CH failure mode; measured: the
            # 64x64 probe ground 20+ min in round joins before the
            # 2-hop witness landed): (1) a surviving direct edge at
            # least as cheap dominates; (2) a cheaper-or-equal 2-hop
            # path through a SURVIVING mid dominates (its edges
            # outlive the round, so distance preservation holds;
            # cheap 2-hop paths through OTHER IS mids need no witness
            # — their own shortcut is generated this same round and
            # the parallel-min keeps the best).  Dropping only
            # dominated shortcuts never loses a needed one: exactness
            # untouched.
            direct = survivors.select("_u", "_v", F.col("w").alias("_wd"))
            sc = (
                sc.join(direct, ["_u", "_v"], "left")
                .filter(F.col("_wd").isNull() | (F.col("w") < F.col("_wd")))
                .drop("_wd")
            )
            if not customizable:
                # multi-hop witness: customizable builds MUST keep
                # these shortcuts — a 2-hop witness path can get worse
                # under a re-metric and the pruned shortcut would then
                # be missing (direct-arc dominance is safe: the
                # dominating arc itself survives into the search graph
                # and customize() re-relaxes its weight).
                # Restrict the 2-path enumeration to legs that can
                # matter: first leg starts at a shortcut source,
                # second leg ends at a shortcut target (two semi-joins
                # against the round-sized candidate endpoint sets)
                leg_a = survivors.join(
                    sc.select("_u").distinct(), "_u", "left_semi"
                )
                leg_b = survivors.join(
                    sc.select("_v").distinct(), "_v", "left_semi"
                )
                p2 = (
                    leg_a.select(
                        F.col("_u").alias("_pu"),
                        F.col("_v").alias("_pm"),
                        F.col("w").alias("_wa"),
                    )
                    .join(
                        leg_b.select(
                            F.col("_u").alias("_pm"),
                            F.col("_v").alias("_pv"),
                            F.col("w").alias("_wb"),
                        ),
                        "_pm",
                    )
                    .filter(F.col("_pu") != F.col("_pv"))
                    .groupBy(
                        F.col("_pu").alias("_u"), F.col("_pv").alias("_v")
                    )
                    .agg(F.min(F.col("_wa") + F.col("_wb")).alias("_w2h"))
                )
                sc = (
                    sc.join(p2, ["_u", "_v"], "left")
                    .filter(
                        F.col("_w2h").isNull()
                        | (F.col("w") < F.col("_w2h"))
                    )
                    .drop("_w2h")
                )
            active = rebase_checkpoint(
                _min_edges(
                    survivors.select("_u", "_v", "w", "mid").unionByName(sc)
                )
            )
            search_parts.append(
                active.join(
                    # only the NEW shortcuts need appending; survivors
                    # are already in earlier parts.  Re-derive them by
                    # mid∈IS (a shortcut's mid is its creation round's
                    # contracted node, unique to this round).
                    isdf.withColumnRenamed("_n", "mid"),
                    "mid",
                ).select("_u", "_v", "w", "mid")
            )
            rank_parts.append(
                isdf.select("_n", F.lit(r).cast("long").alias("rank"))
            )
            unranked = rebase_checkpoint(
                unranked.join(isdf, "_n", "left_anti")
            )
            if debug:
                print(
                    f"[ch build] round {r}: left={n_left} "
                    f"active={active.count()} {_time.time() - _t0:.1f}s",
                    flush=True,
                )
        from functools import reduce

        core_size = 0
        if n_left > 0 and n_left <= local_finish:
            # LOCAL FINISH: contract the small remainder driver-side
            # with the shared core, ranks stacked ABOVE every
            # distributed round (these are the hierarchy's top nodes)
            emap = {
                (rw["_u"], rw["_v"]): rw["w"] for rw in active.collect()
            }
            rem_nodes = {rw["_n"] for rw in unranked.collect()}
            lranks, lupdates = cls._contract_core(
                emap,
                rem_nodes,
                start_rank=rounds,
                full_witness=not customizable,
            )
            rank_parts.append(
                spark.createDataFrame(
                    sorted(lranks.items(), key=lambda kv: str(kv[0])),
                    rank_schema,
                )
            )
            if lupdates:
                search_parts.append(
                    spark.createDataFrame(
                        [
                            (u, v, float(w), mid)
                            for (u, v), (w, mid) in sorted(
                                lupdates.items(),
                                key=lambda kv: (
                                    str(kv[0][0]),
                                    str(kv[0][1]),
                                ),
                            )
                        ],
                        T.StructType(
                            [
                                T.StructField("_u", idt, False),
                                T.StructField("_v", idt, False),
                                T.StructField("w", T.DoubleType(), False),
                                T.StructField("mid", idt, True),
                            ]
                        ),
                    )
                )
        elif n_left > 0:
            # core: whatever outlasted max_rounds shares the top rank
            core_size = n_left
            rank_parts.append(
                unranked.select(
                    "_n", F.lit(CORE_RANK).cast("long").alias("rank")
                )
            )
        ranks = reduce(
            lambda a, b: a.unionByName(b),
            rank_parts,
            spark.createDataFrame([], rank_schema),
        )
        search = _min_edges(reduce(lambda a, b: a.unionByName(b), search_parts))
        ru = ranks.select(
            F.col("_n").alias("_u"), F.col("rank").alias("_ru")
        )
        rv = ranks.select(
            F.col("_n").alias("_v"), F.col("rank").alias("_rv")
        )
        search = (
            search.join(ru, "_u").join(rv, "_v").persist()
        )
        return cls(
            spark,
            ranks.localCheckpoint(eager=True),
            search,
            search.count(),
            rounds,
            core_size,
            cls._graph_fingerprint(graph, weight),
            customizable=customizable,
            orig_edges=orig0,
        )

    # ------------------------------------ customization (CCH re-metric)
    @_scaled_shuffle
    def customize(
        self,
        new_edges: DataFrame,
        strategy: str = "auto",
        checkpoint_every: int = 4,
    ) -> "ContractionHierarchy":
        """Re-derive EXACT arc weights for a NEW positive metric
        without recontracting — the customization phase of
        Customizable Contraction Hierarchies (Dibbelt, Strasser,
        Wagner 2014, public algorithm): process contraction levels
        bottom-up and relax every lower triangle
        ``w(u,x) = min(w(u,x), w(u,v) + w(v,x))`` where ``v`` is the
        lowest-ranked corner.  Requires ``build(customizable=True)``
        (witness pruning weakened to direct-arc dominance, so every
        triangle's closing arc exists in the search graph — the
        invariant that makes the relaxation complete; a multi-hop
        witness pruned under the OLD metric could be worse under the
        new one).

        ``new_edges``: ``(_u, _v, w)`` covering EVERY original edge
        (pairs are parallel-min'd; uncovered originals disconnect).
        Returns a NEW hierarchy over the same ranks whose queries are
        exact for the new metric — shortcut ``mid``s re-point at each
        triangle's argmin so unpacking stays consistent.

        Scale shape: the distributed path is one (ins ⋈ outs → relax)
        join pass per BUILD LEVEL (same-round IS nodes relax together;
        their triangles cannot interact because same-level nodes are
        never adjacent), then the dense top block (the local-finish
        remainder, small by construction) relaxes driver-side — the
        same hybrid split as the build itself."""
        if not self.customizable:
            raise ValueError(
                "customize() requires a hierarchy built with "
                "customizable=True (witness-pruned builds may lack "
                "triangle-closing arcs under a new metric)"
            )
        base = (
            new_edges.select(
                "_u", "_v", F.col("w").cast("double").alias("w")
            )
            .filter(F.col("_u") != F.col("_v"))
            .groupBy("_u", "_v")
            .agg(F.min("w").alias("w"))
        )
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        if local:
            return self._customize_local(base)
        if self.rounds > 1024:
            # a LOCAL-built hierarchy assigns every node its own rank
            # (rounds == node count), so the per-level distributed loop
            # would run one join pass PER NODE — pregel customization
            # is only sensible over pregel-built level structure
            # (rounds ≤ max_rounds, default 32)
            raise ValueError(
                f"{self.rounds} contraction levels — this hierarchy "
                "was built driver-locally (one rank per node), so "
                "per-level distributed customization would run one "
                "join per node; use strategy='local' or rebuild with "
                "build(strategy='pregel')"
            )
        return self._customize_pregel(base, checkpoint_every)

    def _customized_result(
        self, search: DataFrame, base: DataFrame
    ) -> "ContractionHierarchy":
        out = ContractionHierarchy(
            self.spark,
            self.ranks,
            search,
            self.n_search_edges,
            self.rounds,
            self.core_size,
            None,
            customizable=True,
            orig_edges=base,
        )
        return out

    def _customize_local(self, base: DataFrame) -> "ContractionHierarchy":
        """Driver twin: in-memory bottom-up triangle relaxation.
        Dynamically inserts any missing closing arc (never needed on a
        customizable build by the closure invariant, but it makes the
        local path robust to hand-built artifacts)."""
        rank = {r["_n"]: r["rank"] for r in self.ranks.collect()}
        arcs = {
            (r["_u"], r["_v"])
            for r in self.search.select("_u", "_v").collect()
        }
        w = {}
        mid = {}
        for a in arcs:
            w[a] = float("inf")
            mid[a] = None
        for r in base.collect():
            k = (r["_u"], r["_v"])
            if k in arcs:
                w[k] = r["w"]
            else:
                arcs.add(k)
                w[k], mid[k] = r["w"], None
        inn: dict = {}
        outn: dict = {}
        for u, v in arcs:
            if rank.get(u, 0) > rank.get(v, 0):
                inn.setdefault(v, set()).add(u)
            elif rank.get(u, 0) < rank.get(v, 0):
                outn.setdefault(u, set()).add(v)
            # equal ranks: core-internal arc — never part of a lower
            # triangle (nothing ranks above the core), skip
        order = sorted(
            (n for n, rk in rank.items() if rk < CORE_RANK),
            key=lambda n: (rank[n], str(n)),
        )
        for v in order:
            ins = [
                (u, w[(u, v)]) for u in inn.get(v, ()) if w[(u, v)] < float("inf")
            ]
            outs = [
                (x, w[(v, x)]) for x in outn.get(v, ()) if w[(v, x)] < float("inf")
            ]
            for u, w1 in ins:
                for x, w2 in outs:
                    if u == x:
                        continue
                    k = (u, x)
                    c = w1 + w2
                    if k not in w:
                        arcs.add(k)
                        w[k], mid[k] = c, v
                        if rank.get(u, 0) > rank.get(x, 0):
                            inn.setdefault(x, set()).add(u)
                        elif rank.get(u, 0) < rank.get(x, 0):
                            outn.setdefault(u, set()).add(x)
                    elif c < w[k]:
                        w[k], mid[k] = c, v
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("_u", idt, False),
                T.StructField("_v", idt, False),
                T.StructField("w", T.DoubleType(), False),
                T.StructField("mid", idt, True),
                T.StructField("_ru", T.LongType(), False),
                T.StructField("_rv", T.LongType(), False),
            ]
        )
        rows = [
            (u, v, w[(u, v)], mid[(u, v)], rank[u], rank[v])
            for (u, v) in sorted(arcs, key=lambda p: (str(p[0]), str(p[1])))
            if w[(u, v)] < float("inf")
        ]
        return self._customized_result(
            self.spark.createDataFrame(rows, schema), base
        )

    def _customize_pregel(
        self, base: DataFrame, checkpoint_every: int
    ) -> "ContractionHierarchy":
        """Distributed customization: one relax pass per distributed
        build level (ranks 1..rounds are per-round independent sets),
        then the dense top block (ranks above ``rounds`` — the
        local-finish remainder plus core) relaxes driver-side."""
        idt = self.ranks.schema["_n"].dataType
        arcs = (
            self.search.select("_u", "_v", "_ru", "_rv")
            .join(base, ["_u", "_v"], "left")
            .select(
                "_u",
                "_v",
                F.coalesce("w", F.lit(float("inf"))).alias("w"),
                F.lit(None).cast(idt).alias("mid"),
                "_ru",
                "_rv",
            )
            .localCheckpoint(eager=True)
        )
        for lvl in range(1, self.rounds + 1):
            ins = arcs.filter(
                (F.col("_rv") == lvl) & (F.col("_ru") > lvl)
            ).select(
                F.col("_u").alias("_tu"),
                F.col("_v").alias("_via"),
                F.col("w").alias("_w1"),
            )
            outs = arcs.filter(
                (F.col("_ru") == lvl) & (F.col("_rv") > lvl)
            ).select(
                F.col("_u").alias("_via"),
                F.col("_v").alias("_tx"),
                F.col("w").alias("_w2"),
            )
            cand = (
                ins.join(outs, "_via")
                .filter(F.col("_tu") != F.col("_tx"))
                .groupBy(
                    F.col("_tu").alias("_u"), F.col("_tx").alias("_v")
                )
                .agg(
                    F.min(
                        F.struct(
                            (F.col("_w1") + F.col("_w2")).alias("wc"),
                            F.col("_via").alias("m"),
                        )
                    ).alias("b")
                )
                .select(
                    "_u",
                    "_v",
                    F.col("b.wc").alias("_wc"),
                    F.col("b.m").alias("_m"),
                )
            )
            arcs = (
                arcs.join(cand, ["_u", "_v"], "left")
                .select(
                    "_u",
                    "_v",
                    F.when(
                        F.col("_wc").isNotNull()
                        & (F.col("_wc") < F.col("w")),
                        F.col("_wc"),
                    )
                    .otherwise(F.col("w"))
                    .alias("w"),
                    F.when(
                        F.col("_wc").isNotNull()
                        & (F.col("_wc") < F.col("w")),
                        F.col("_m"),
                    )
                    .otherwise(F.col("mid"))
                    .alias("mid"),
                    "_ru",
                    "_rv",
                )
            )
            if lvl % checkpoint_every == 0 or lvl == self.rounds:
                arcs = rebase_checkpoint(arcs)
        # top block: both endpoints above the distributed rounds
        top_pred = (F.col("_ru") > self.rounds) & (
            F.col("_rv") > self.rounds
        )
        top_rows = arcs.filter(top_pred).collect()
        rank = {
            r["_n"]: r["rank"]
            for r in self.ranks.filter(
                F.col("rank") > self.rounds
            ).collect()
        }
        w = {}
        mid = {}
        inn: dict = {}
        outn: dict = {}
        for r in top_rows:
            k = (r["_u"], r["_v"])
            w[k], mid[k] = r["w"], r["mid"]
            if r["_ru"] > r["_rv"]:
                inn.setdefault(r["_v"], set()).add(r["_u"])
            elif r["_ru"] < r["_rv"]:
                outn.setdefault(r["_u"], set()).add(r["_v"])
        order = sorted(
            (n for n, rk in rank.items() if rk < CORE_RANK),
            key=lambda n: (rank[n], str(n)),
        )
        for v in order:
            ins = [
                (u, w[(u, v)]) for u in inn.get(v, ()) if w[(u, v)] < float("inf")
            ]
            outs = [
                (x, w[(v, x)]) for x in outn.get(v, ()) if w[(v, x)] < float("inf")
            ]
            for u, w1 in ins:
                for x, w2 in outs:
                    if u == x:
                        continue
                    k = (u, x)
                    c = w1 + w2
                    if k in w and c < w[k]:
                        w[k], mid[k] = c, v
        schema = T.StructType(
            [
                T.StructField("_u", idt, False),
                T.StructField("_v", idt, False),
                T.StructField("w", T.DoubleType(), False),
                T.StructField("mid", idt, True),
                T.StructField("_ru", T.LongType(), False),
                T.StructField("_rv", T.LongType(), False),
            ]
        )
        top_df = self.spark.createDataFrame(
            sorted(
                (
                    (u, v, w[(u, v)], mid[(u, v)], rank[u], rank[v])
                    for (u, v) in w
                    if w[(u, v)] < float("inf")
                ),
                key=lambda r: (str(r[0]), str(r[1])),
            ),
            schema,
        )
        out_search = (
            arcs.filter(~top_pred)
            .filter(F.col("w") < float("inf"))
            .unionByName(top_df)
            .localCheckpoint(eager=True)
        )
        return self._customized_result(out_search, base)

    @_scaled_shuffle
    def alternatives(
        self,
        source,
        target,
        k: int = 3,
        penalty: float = 2.0,
        strategy: str = "auto",
        max_iter: int | None = None,
    ) -> list[tuple[list, float]]:
        """Alternative routes via the PENALTY METHOD over a
        customizable hierarchy (the standing r13 design note; public
        algorithm: iterated penalization, e.g. Bader et al. 2011
        "Alternative Route Graphs"): route, multiply the weight of
        every edge ON the found route by ``penalty`` (compounding), RE-
        CUSTOMIZE (not rebuild — penalties change the metric, which is
        exactly what customization absorbs; Yen-style edge REMOVAL
        can't compose with CH because deleted edges invalidate
        shortcuts), and re-route until ``k`` distinct routes emerge.

        Returns up to ``k`` ``(path, base_cost)`` pairs in discovery
        order — the first is the exact optimum under the ORIGINAL
        metric; later entries are progressively-penalized detours
        whose reported cost is still the original metric (the standard
        alternatives convention).  Stops early after ``max_iter``
        (default ``4 * k``) penalization rounds without k distinct
        routes (heavily-overlapping networks legitimately have fewer
        good alternatives)."""
        if not self.customizable or self.orig_edges is None:
            raise ValueError(
                "alternatives() requires build(customizable=True) "
                "(keeps the original edge frame and a re-metric-able "
                "arc set)"
            )
        if penalty <= 1.0:
            raise ValueError("penalty must be > 1")
        base = self.orig_edges
        idt = self.ranks.schema["_n"].dataType
        pen_counts: dict = {}
        cur = self
        out: list[tuple[list, float]] = []
        seen: set = set()
        limit = max_iter or (4 * k)
        for _ in range(limit):
            r = cur.route(source, target, strategy=strategy)
            if r is None:
                break
            path = r[0]
            pairs = list(zip(path, path[1:]))
            if tuple(path) not in seen:
                seen.add(tuple(path))
                wrows = base.filter(
                    F.col("_u").isin([p[0] for p in pairs])
                    & F.col("_v").isin([p[1] for p in pairs])
                ).collect()
                wmap = {(x["_u"], x["_v"]): x["w"] for x in wrows}
                cost = 0.0
                for p in pairs:
                    cost += wmap[p]
                out.append((list(path), cost))
                if len(out) >= k:
                    break
            for p in pairs:
                pen_counts[p] = pen_counts.get(p, 0) + 1
            pen_df = self.spark.createDataFrame(
                sorted(
                    ((u, v, c) for (u, v), c in pen_counts.items()),
                    key=lambda t: (str(t[0]), str(t[1])),
                ),
                T.StructType(
                    [
                        T.StructField("_u", idt, False),
                        T.StructField("_v", idt, False),
                        T.StructField("_pc", T.IntegerType(), False),
                    ]
                ),
            )
            new_w = (
                base.join(F.broadcast(pen_df), ["_u", "_v"], "left")
                .select(
                    "_u",
                    "_v",
                    (
                        F.col("w")
                        * F.pow(
                            F.lit(float(penalty)),
                            F.coalesce(F.col("_pc"), F.lit(0)),
                        )
                    ).alias("w"),
                )
            )
            cur = self.customize(new_w, strategy=strategy)
        return out

    # ----------------------------------------------------------- query
    def _up_down(self) -> tuple[DataFrame, DataFrame]:
        core = F.lit(CORE_RANK)
        up = self.search.filter(
            (F.col("_ru") < F.col("_rv"))
            | ((F.col("_ru") == core) & (F.col("_rv") == core))
        )
        down = self.search.filter(
            (F.col("_ru") > F.col("_rv"))
            | ((F.col("_ru") == core) & (F.col("_rv") == core))
        )
        return up, down

    @_scaled_shuffle
    def route(
        self,
        source,
        target,
        strategy: str = "auto",
        max_iterations: int = 200,
        hops_per_round: int = 1,
    ) -> tuple[list, float] | None:
        """Bidirectional upward search + shortcut unpacking: the raw
        node path and exact cost, or None if unreachable.

        ``hops_per_round=2`` chains a second frontier expansion into
        each distributed round (one extra broadcast join per side) to
        halve the round count.  MEASURED SLOWER on local[32] (r14
        interleaved warm A/B, 64x64 grid, 4 routes: 1-hop 71.7-76.1 s
        total vs 2-hop 102.2-102.5 s, with and without a per-hop
        reduce) — single-JVM rounds are cheap enough that the extra
        per-round joins dominate, so the default stays 1.  On a real
        multi-executor cluster with 100 ms+ barrier latency the trade
        may reverse; the knob and the probe (tools/probe_ch_xl.py)
        exist to re-measure there."""
        if source == target:
            return [source], 0.0
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        if local:
            return self._route_local(source, target)
        return self._route_pregel(
            source, target, max_iterations, hops_per_round
        )

    @_scaled_shuffle
    def distance_matrix(
        self,
        sources: list,
        targets: list,
        strategy: str = "auto",
        max_iterations: int = 200,
    ) -> DataFrame:
        """Many-to-many CH distances — the classic bucket algorithm
        (Knopp et al. 2007) in DataFrame form, and the shape where the
        DISTRIBUTED query loop actually wins: the r14 A/B showed a
        single route's rounds are Spark-latency-bound, so the fix is
        to amortize every round across ALL queries at once.

        One batched forward upward search from all ``sources`` and one
        batched backward upward search from all ``targets`` — state
        keyed ``(origin, _n)``, still ONE fused merge per round — run
        to upward-cone exhaustion (cones are hierarchy-height-sized by
        CH theory; no per-pair μ bookkeeping needed), then a single
        hash join on the meeting node computes all |S|×|T| minima:

            dist(s, t) = min over n of  df(s, n) + db(t, n)

        Returns a DataFrame ``(src, dst, dist)`` — unreachable pairs
        are absent.  Distances only (the travel-time-matrix use case);
        for a path, call :meth:`route` on the pair.  Scale shape:
        round cost is (Σ cone frontiers) per hop — M+N searches for
        the price of one loop — and the meet is one shuffle join on
        ``_n``."""
        if not sources or not targets:
            raise ValueError("sources and targets must be non-empty")
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        if local:
            return self._distance_matrix_local(sources, targets)
        up, down = self._up_down()
        upk = up.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        downk = down.select(
            F.col("_v").alias("_k"), F.col("_u").alias("_t"), "w"
        ).persist()
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("side", T.StringType(), False),
                T.StructField("origin", idt, False),
                T.StructField("_n", idt, False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        init = [("f", s, s, 0.0) for s in dict.fromkeys(sources)] + [
            ("b", t, t, 0.0) for t in dict.fromkeys(targets)
        ]
        dist = self.spark.createDataFrame(init, schema)
        frontier = dist
        for _ in range(max_iterations):
            fr = frontier.select(
                "side",
                "origin",
                F.col("_n").alias("_k"),
                F.col("dist").alias("_fd"),
            ).hint("broadcast")
            msgs = (
                fr.filter(F.col("side") == "f")
                .join(upk, "_k")
                .select(
                    F.lit("f").alias("side"),
                    "origin",
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                )
                .unionByName(
                    fr.filter(F.col("side") == "b")
                    .join(downk, "_k")
                    .select(
                        F.lit("b").alias("side"),
                        "origin",
                        F.col("_t").alias("_n"),
                        (F.col("_fd") + F.col("w")).alias("dist"),
                    )
                )
            )
            merged = (
                dist.select(
                    "side", "origin", "_n", "dist", F.lit(False).alias("_new")
                )
                .unionByName(
                    msgs.select(
                        "side",
                        "origin",
                        "_n",
                        "dist",
                        F.lit(True).alias("_new"),
                    )
                )
                .groupBy("side", "origin", "_n")
                .agg(F.min(F.struct("dist", "_new")).alias("b"))
                .select(
                    "side",
                    "origin",
                    "_n",
                    F.col("b.dist").alias("dist"),
                    F.col("b._new").alias("_imp"),
                )
                # LAZY checkpoint: the probe count below computes every
                # partition of this frame anyway (the filter is narrow),
                # so one job both materializes the round AND answers the
                # convergence probe — the eager+limit(1) form paid two
                # scheduled jobs per round for the same work (r17, guide
                # §1.2 remove driver round-trips)
                .localCheckpoint(eager=False)
            )
            dist = merged.select("side", "origin", "_n", "dist")
            frontier = merged.filter(F.col("_imp")).select(
                "side", "origin", "_n", "dist"
            )
            if frontier.count() == 0:
                break
        else:
            upk.unpersist()
            downk.unpersist()
            raise RuntimeError(
                "distance_matrix hit the iteration cap before the "
                "upward cones were exhausted; raise max_iterations"
            )
        fwd = dist.filter(F.col("side") == "f").select(
            F.col("origin").alias("src"), "_n", F.col("dist").alias("_df")
        )
        bwd = dist.filter(F.col("side") == "b").select(
            F.col("origin").alias("dst"), "_n", F.col("dist").alias("_db")
        )
        out = (
            fwd.join(bwd, "_n")
            .groupBy("src", "dst")
            .agg(F.min(F.col("_df") + F.col("_db")).alias("dist"))
        )
        upk.unpersist()
        downk.unpersist()
        return out

    #: leveled down-sweep guard: one pass PER DISTINCT LEVEL is only a
    #: win when the level count tracks the distributed build rounds —
    #: a local-finish block (or a fully local build) assigns one rank
    #: per node, inflating the level count far beyond the down-DAG
    #: DEPTH that the probed fixpoint actually pays (measured on the
    #: 64x64 XL grid, local_finish=512: 525 levels -> leveled 346 s vs
    #: fixpoint 20.8 s at ~25 depth-bound rounds).  The sweep is
    #: chosen per query from the REAL level count: leveled only when
    #: len(levels) <= max(_LEVELED_MIN_LEVELS, 2 * build rounds).
    _LEVELED_MIN_LEVELS = 64

    def _down_levels(self, down: DataFrame) -> list:
        """Distinct tail-levels of the down-DAG, descending (driver-
        sized: one tiny distinct per one-to-all query)."""
        return sorted(
            (r["_ru"] for r in down.select("_ru").distinct().collect()),
            reverse=True,
        )

    def _use_leveled(self, levels: list) -> bool:
        return len(levels) <= max(
            self._LEVELED_MIN_LEVELS, 2 * self.rounds
        )

    def _down_sweep_leveled(
        self,
        dist: DataFrame,
        down: DataFrame,
        key_cols: list,
        stats=None,
        levels: list | None = None,
    ) -> DataFrame:
        """PHAST down-sweep in EXACTLY one relaxation pass per
        contraction level, top-down (the r14/r15 standing idea,
        r15-verdict task #7): down edges bucket by their TAIL's build
        level, and because same-level nodes are never adjacent (the
        pregel build's independent-set invariant) descending levels
        are a topological order of the down-DAG — when level r fires,
        every tail at r is already final (the core is settled by the
        upward fixpoint, whose edge set includes the core-internal
        arcs).  Replaces fixpoint-until-quiet: no empty-frontier probe
        job per round, and the round count is the hierarchy height by
        construction instead of discovered dynamically."""
        if levels is None:
            levels = self._down_levels(down)
        downk = down.select(
            "_ru", F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        try:
            for lvl in levels:
                adjk = downk.filter(F.col("_ru") == lvl).drop("_ru")
                fr = dist.select(
                    *key_cols,
                    F.col("_n").alias("_k"),
                    F.col("dist").alias("_fd"),
                )
                msgs = fr.join(adjk.hint("shuffle_hash"), "_k").select(
                    *key_cols,
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                )
                dist = (
                    dist.unionByName(msgs)
                    .groupBy(*key_cols, "_n")
                    .agg(F.min("dist").alias("dist"))
                    .localCheckpoint(eager=True)
                )
        finally:
            downk.unpersist()
        if stats is not None:
            stats["down_rounds"] = len(levels)
            stats["down_mode"] = "leveled"
        return dist

    @_scaled_shuffle
    def sssp(
        self,
        source,
        strategy: str = "auto",
        max_iterations: int = 400,
        stats: dict | None = None,
    ) -> DataFrame:
        """One-to-ALL distances over the hierarchy — PHAST (Delling et
        al. 2011) in DataFrame form: (1) upward search from the source
        to cone exhaustion, then (2) a down-sweep fixpoint that relaxes
        only DOWNWARD edges from the settled set.  The CH theorem says
        every shortest path decomposes into up-then-down, so the result
        is exact; the payoff is the round count — phase 1 is
        cone-height rounds and phase 2 is bounded by the hierarchy's
        down-DAG depth (~build rounds, plus core diameter if a core
        exists), NOT the graph diameter that plain pregel SSSP pays
        (the 64×64 grid: ~21-level hierarchy vs ~126-hop diameter).
        r16: the down-sweep runs LEVEL-BUCKETED — exactly one
        relaxation pass per contraction level, no per-round
        convergence probe (:meth:`_down_sweep_leveled`) — but ONLY
        when the real level count tracks the distributed build rounds
        (:meth:`_use_leveled`); hierarchies whose local-finish block
        inflated the level count far beyond the down-DAG depth keep
        the probed fixpoint (measured: 525 levels → leveled 346 s vs
        fixpoint 20.8 s on the XL grid).  Pass ``stats={}`` to
        receive ``down_rounds`` / ``down_mode``.  Returns
        ``(_n, dist)`` for every reachable node."""
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        if local:
            return self._sssp_local(source)
        up, down = self._up_down()
        upk = up.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        # down edges traversed FORWARD (unlike the bidirectional
        # route's backward keying): key by the tail
        downf = down.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("_n", idt, False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        dist = self.spark.createDataFrame([(source, 0.0)], schema)

        def fixpoint(dist, adjk, phase):
            frontier = dist
            for _ in range(max_iterations):
                fr = frontier.select(
                    F.col("_n").alias("_k"), F.col("dist").alias("_fd")
                ).hint("broadcast")
                msgs = fr.join(adjk, "_k").select(
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                )
                merged = (
                    dist.select("_n", "dist", F.lit(False).alias("_new"))
                    .unionByName(
                        msgs.select(
                            "_n", "dist", F.lit(True).alias("_new")
                        )
                    )
                    .groupBy("_n")
                    .agg(F.min(F.struct("dist", "_new")).alias("b"))
                    .select(
                        "_n",
                        F.col("b.dist").alias("dist"),
                        F.col("b._new").alias("_imp"),
                    )
                    # lazy checkpoint + full-count probe: one scheduled
                    # job per round (see distance_matrix)
                    .localCheckpoint(eager=False)
                )
                dist = merged.select("_n", "dist")
                frontier = merged.filter(F.col("_imp")).select("_n", "dist")
                if frontier.count() == 0:
                    return dist
            raise RuntimeError(
                f"sssp {phase} phase hit the iteration cap; raise "
                "max_iterations"
            )

        try:
            dist = fixpoint(dist, upk, "upward")
            levels = self._down_levels(down)
            if self._use_leveled(levels):
                dist = self._down_sweep_leveled(
                    dist, down, [], stats, levels=levels
                )
            else:
                dist = fixpoint(dist, downf, "down-sweep")
                if stats is not None:
                    stats["down_mode"] = "fixpoint"
        finally:
            upk.unpersist()
            downf.unpersist()
        return dist

    @_scaled_shuffle
    def sssp_multi(
        self,
        sources: list,
        strategy: str = "auto",
        max_iterations: int = 400,
        stats: dict | None = None,
    ) -> DataFrame:
        """Batched PHAST — one-to-all from EVERY source in one pair of
        fixpoints, state keyed ``(src, _n)`` so each round's
        expand+merge amortizes across all sources (the same
        amortization that makes :meth:`distance_matrix` pay; here it
        serves the landmark-centrality / k-isochrone workloads, which
        are k one-to-all sweeps).  Returns ``(src, _n, dist)`` for
        every reachable (source, node) pair — exact per source by the
        PHAST up-then-down decomposition, round count bounded by
        hierarchy height + down-DAG depth, NOT graph diameter."""
        if not sources:
            raise ValueError("sources must be non-empty")
        sources = list(dict.fromkeys(sources))
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("src", idt, False),
                T.StructField("_n", idt, False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        if local:
            rows = []
            for s in sources:
                for r in self._sssp_local(s).collect():
                    rows.append((s, r["_n"], r["dist"]))
            return self.spark.createDataFrame(
                sorted(rows, key=lambda r: (str(r[0]), str(r[1]))), schema
            )
        up, down = self._up_down()
        upk = up.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        downf = down.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        dist = self.spark.createDataFrame(
            [(s, s, 0.0) for s in sources], schema
        )

        def fixpoint(dist, adjk, phase):
            frontier = dist
            for _ in range(max_iterations):
                fr = frontier.select(
                    "src",
                    F.col("_n").alias("_k"),
                    F.col("dist").alias("_fd"),
                ).hint("broadcast")
                msgs = fr.join(adjk, "_k").select(
                    "src",
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                )
                merged = (
                    dist.select(
                        "src", "_n", "dist", F.lit(False).alias("_new")
                    )
                    .unionByName(
                        msgs.select(
                            "src", "_n", "dist", F.lit(True).alias("_new")
                        )
                    )
                    .groupBy("src", "_n")
                    .agg(F.min(F.struct("dist", "_new")).alias("b"))
                    .select(
                        "src",
                        "_n",
                        F.col("b.dist").alias("dist"),
                        F.col("b._new").alias("_imp"),
                    )
                    # lazy checkpoint + full-count probe: one scheduled
                    # job per round (see distance_matrix)
                    .localCheckpoint(eager=False)
                )
                dist = merged.select("src", "_n", "dist")
                frontier = merged.filter(F.col("_imp")).select(
                    "src", "_n", "dist"
                )
                if frontier.count() == 0:
                    return dist
            raise RuntimeError(
                f"sssp_multi {phase} phase hit the iteration cap; "
                "raise max_iterations"
            )

        try:
            dist = fixpoint(dist, upk, "upward")
            levels = self._down_levels(down)
            if self._use_leveled(levels):
                dist = self._down_sweep_leveled(
                    dist, down, ["src"], stats, levels=levels
                )
            else:
                dist = fixpoint(dist, downf, "down-sweep")
                if stats is not None:
                    stats["down_mode"] = "fixpoint"
        finally:
            upk.unpersist()
            downf.unpersist()
        return dist

    def _sssp_local(self, source) -> DataFrame:
        """Driver twin: Dijkstra over ALL search edges — every search
        edge is a real path of its weight (original or shortcut), so
        search-graph distances equal original-graph distances."""
        import heapq

        _up, _down, edges = self._collect_local()
        adj: dict = {}
        for (u, v), (w, _mid) in edges.items():
            adj.setdefault(u, []).append((v, w))
        d = {source: 0.0}
        pq = [(0.0, 0, source)]
        order = 0
        while pq:
            dd, _o, u = heapq.heappop(pq)
            if dd > d.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = dd + w
                if nd < d.get(v, float("inf")):
                    order += 1
                    d[v] = nd
                    heapq.heappush(pq, (nd, order, v))
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("_n", idt, False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        return self.spark.createDataFrame(
            sorted(d.items(), key=lambda kv: str(kv[0])), schema
        )

    @_scaled_shuffle
    def route_matrix(
        self,
        sources: list,
        targets: list,
        strategy: str = "auto",
        max_iterations: int = 200,
    ) -> DataFrame:
        """Path-returning companion of :meth:`distance_matrix`:
        ``(src, dst, dist, path)`` for every reachable pair, with
        ``path`` the fully unpacked raw-node sequence.

        Same batched upward searches (preds carried through the fused
        merge), then driver-side assembly: the settled cones are
        collected ONCE (guarded by the trace cap — cones are
        hierarchy-height-sized by CH theory), meets and pred walks are
        in-memory per pair, and every pair's shortcut expansion shares
        ONE batched ``_resolve_mids`` frontier so the per-level
        collects amortize across the whole matrix.  The output is
        driver-sized by definition (it contains the paths), so the
        driver-side assembly is not a scale compromise."""
        if not sources or not targets:
            raise ValueError("sources and targets must be non-empty")
        local = strategy == "local" or (
            strategy == "auto" and self.n_search_edges < LOCAL_THRESHOLD
        )
        idt = self.ranks.schema["_n"].dataType
        out_schema = T.StructType(
            [
                T.StructField("src", idt, False),
                T.StructField("dst", idt, False),
                T.StructField("dist", T.DoubleType(), False),
                T.StructField("path", T.ArrayType(idt), False),
            ]
        )
        if local:
            rows = []
            for s in dict.fromkeys(sources):
                for t in dict.fromkeys(targets):
                    r = (
                        ([s], 0.0)
                        if s == t
                        else self._route_local(s, t)
                    )
                    if r is not None:
                        rows.append((s, t, r[1], r[0]))
            return self.spark.createDataFrame(
                sorted(rows, key=lambda r: (str(r[0]), str(r[1]))),
                out_schema,
            )
        up, down = self._up_down()
        upk = up.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        downk = down.select(
            F.col("_v").alias("_k"), F.col("_u").alias("_t"), "w"
        ).persist()
        schema = T.StructType(
            [
                T.StructField("side", T.StringType(), False),
                T.StructField("origin", idt, False),
                T.StructField("_n", idt, False),
                T.StructField("dist", T.DoubleType(), False),
                T.StructField("pred", idt, True),
            ]
        )
        init = [
            ("f", s, s, 0.0, None) for s in dict.fromkeys(sources)
        ] + [("b", t, t, 0.0, None) for t in dict.fromkeys(targets)]
        dist = self.spark.createDataFrame(init, schema)
        frontier = dist
        for _ in range(max_iterations):
            fr = frontier.select(
                "side",
                "origin",
                F.col("_n").alias("_k"),
                F.col("dist").alias("_fd"),
            ).hint("broadcast")
            msgs = (
                fr.filter(F.col("side") == "f")
                .join(upk, "_k")
                .select(
                    F.lit("f").alias("side"),
                    "origin",
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                    F.col("_k").alias("pred"),
                )
                .unionByName(
                    fr.filter(F.col("side") == "b")
                    .join(downk, "_k")
                    .select(
                        F.lit("b").alias("side"),
                        "origin",
                        F.col("_t").alias("_n"),
                        (F.col("_fd") + F.col("w")).alias("dist"),
                        F.col("_k").alias("pred"),
                    )
                )
            )
            merged = (
                dist.select(
                    "side",
                    "origin",
                    "_n",
                    "dist",
                    F.lit(False).alias("_new"),
                    "pred",
                )
                .unionByName(
                    msgs.select(
                        "side",
                        "origin",
                        "_n",
                        "dist",
                        F.lit(True).alias("_new"),
                        "pred",
                    )
                )
                .groupBy("side", "origin", "_n")
                .agg(F.min(F.struct("dist", "_new", "pred")).alias("b"))
                .select(
                    "side",
                    "origin",
                    "_n",
                    F.col("b.dist").alias("dist"),
                    F.col("b.pred").alias("pred"),
                    F.col("b._new").alias("_imp"),
                )
                # lazy checkpoint + full-count probe: one scheduled job
                # per round (see distance_matrix)
                .localCheckpoint(eager=False)
            )
            dist = merged.select("side", "origin", "_n", "dist", "pred")
            frontier = merged.filter(F.col("_imp")).select(
                "side", "origin", "_n", "dist"
            )
            if frontier.count() == 0:
                break
        else:
            upk.unpersist()
            downk.unpersist()
            raise RuntimeError(
                "route_matrix hit the iteration cap before the upward "
                "cones were exhausted; raise max_iterations"
            )
        n_settled = dist.limit(self._TRACE_COLLECT_CAP + 1).count()
        if n_settled > self._TRACE_COLLECT_CAP:
            upk.unpersist()
            downk.unpersist()
            raise RuntimeError(
                "route_matrix settled state exceeds the driver cap "
                f"({self._TRACE_COLLECT_CAP} rows) — degenerate "
                "hierarchy or very large batch; use distance_matrix "
                "for distances or route() per pair"
            )
        fwd: dict = {}
        bwd: dict = {}
        for r in dist.collect():
            side_map = fwd if r["side"] == "f" else bwd
            side_map.setdefault(r["origin"], {})[r["_n"]] = (
                r["dist"],
                r["pred"],
            )
        upk.unpersist()
        downk.unpersist()
        pairs_out = []
        all_pairs: set = set()
        for s in dict.fromkeys(sources):
            df = fwd.get(s, {})
            for t in dict.fromkeys(targets):
                db = bwd.get(t, {})
                meet, mu = None, None
                for n in df.keys() & db.keys():
                    c = df[n][0] + db[n][0]
                    if mu is None or c < mu or (
                        c == mu and str(n) < str(meet)
                    ):
                        meet, mu = n, c
                if meet is None:
                    continue
                walk = [meet]
                cur = df[meet][1]
                while cur is not None:
                    walk.append(cur)
                    cur = df[cur][1]
                walk.reverse()
                cur = db[meet][1]
                while cur is not None:
                    walk.append(cur)
                    cur = db[cur][1]
                pairs_out.append((s, t, mu, walk))
                all_pairs.update(zip(walk, walk[1:]))
        resolved = self._resolve_mids(all_pairs) if all_pairs else {}

        def expand_all(walk):
            out = [walk[0]]
            for a, b in zip(walk, walk[1:]):
                stack = [(a, b)]
                while stack:
                    u, v = stack.pop()
                    mid = resolved[(u, v)]
                    if mid is None:
                        out.append(v)
                    else:
                        stack.append((mid, v))
                        stack.append((u, mid))
            return out

        rows = [
            (s, t, mu, expand_all(walk) if len(walk) > 1 else walk)
            for s, t, mu, walk in pairs_out
        ]
        return self.spark.createDataFrame(
            sorted(rows, key=lambda r: (str(r[0]), str(r[1]))),
            out_schema,
        )

    def _distance_matrix_local(self, sources, targets) -> DataFrame:
        import heapq

        up, down, _edges = self._collect_local()

        def dijkstra(adj, src):
            d = {src: 0.0}
            pq = [(0.0, 0, src)]
            order = 0
            while pq:
                dd, _o, u = heapq.heappop(pq)
                if dd > d.get(u, float("inf")):
                    continue
                for v, w in adj.get(u, []):
                    nd = dd + w
                    if nd < d.get(v, float("inf")):
                        order += 1
                        d[v] = nd
                        heapq.heappush(pq, (nd, order, v))
            return d

        fwd = {s: dijkstra(up, s) for s in dict.fromkeys(sources)}
        bwd = {t: dijkstra(down, t) for t in dict.fromkeys(targets)}
        rows = []
        for s, df in fwd.items():
            for t, db in bwd.items():
                meet = df.keys() & db.keys()
                if meet:
                    rows.append(
                        (s, t, min(df[n] + db[n] for n in meet))
                    )
        idt = self.ranks.schema["_n"].dataType
        schema = T.StructType(
            [
                T.StructField("src", idt, False),
                T.StructField("dst", idt, False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        return self.spark.createDataFrame(
            sorted(rows, key=lambda r: (str(r[0]), str(r[1]))), schema
        )

    # ------------------------------------------------------ local twin
    def _collect_local(self):
        if self._local_cache is None:
            up: dict = {}
            down: dict = {}
            edges: dict = {}
            for r in self.search.collect():
                u, v, w, mid = r["_u"], r["_v"], r["w"], r["mid"]
                edges[(u, v)] = (w, mid)
                ru, rv = r["_ru"], r["_rv"]
                both_core = ru == CORE_RANK and rv == CORE_RANK
                if ru < rv or both_core:
                    up.setdefault(u, []).append((v, w))
                if ru > rv or both_core:
                    down.setdefault(v, []).append((u, w))
            self._local_cache = (up, down, edges)
        return self._local_cache

    def _route_local(self, source, target):
        import heapq

        up, down, edges = self._collect_local()

        def dijkstra(adj, src):
            dist = {src: 0.0}
            pred: dict = {src: None}
            pq = [(0.0, 0, src)]
            order = 0
            while pq:
                d, _o, u = heapq.heappop(pq)
                if d > dist.get(u, float("inf")):
                    continue
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < dist.get(v, float("inf")):
                        order += 1
                        dist[v], pred[v] = nd, u
                        heapq.heappush(pq, (nd, order, v))
            return dist, pred

        df, pf = dijkstra(up, source)
        db, pb = dijkstra(down, target)
        meet, mu = None, None
        for n in df.keys() & db.keys():
            c = df[n] + db[n]
            if mu is None or c < mu or (c == mu and str(n) < str(meet)):
                meet, mu = n, c
        if meet is None:
            return None
        fwd = []
        cur = meet
        while cur is not None:
            fwd.append(cur)
            cur = pf[cur]
        fwd.reverse()
        cur = pb[meet]
        while cur is not None:
            fwd.append(cur)
            cur = pb[cur]
        return self._unpack_local(fwd, edges), mu

    def _unpack_local(self, path, edges):
        out = [path[0]]
        for a, b in zip(path, path[1:]):
            out.extend(self._expand_pair_local(a, b, edges))
        return out

    def _expand_pair_local(self, a, b, edges):
        # iterative (explicit stack): shortcut nesting depth is
        # unbounded on degenerate contraction orders (a path graph
        # contracted sequentially nests linearly), so recursion would
        # hit Python's limit around depth ~1000
        out = []
        stack = [(a, b)]
        while stack:
            u, v = stack.pop()
            _w, mid = edges[(u, v)]
            if mid is None:
                out.append(v)
            else:
                stack.append((mid, v))
                stack.append((u, mid))
        return out

    # -------------------------------------------------- distributed
    def _route_pregel(
        self, source, target, max_iterations, hops_per_round=1
    ):
        up, down = self._up_down()
        # key the expansion tables once: fwd by _u, bwd by _v
        upk = up.select(
            F.col("_u").alias("_k"), F.col("_v").alias("_t"), "w"
        ).persist()
        downk = down.select(
            F.col("_v").alias("_k"), F.col("_u").alias("_t"), "w"
        ).persist()
        schema = T.StructType(
            [
                T.StructField("side", T.StringType(), False),
                T.StructField("_n", self.ranks.schema["_n"].dataType, False),
                T.StructField("dist", T.DoubleType(), False),
                T.StructField("pred", self.ranks.schema["_n"].dataType, True),
            ]
        )
        dist = self.spark.createDataFrame(
            [("f", source, 0.0, None), ("b", target, 0.0, None)], schema
        )
        frontier = dist
        mu = None
        done = False
        for it in range(max_iterations):
            probe = (it + 1) % 2 == 0 or it == max_iterations - 1
            fr = frontier.select(
                "side",
                F.col("_n").alias("_k"),
                F.col("dist").alias("_fd"),
            ).hint("broadcast")
            msgs_f = fr.filter(F.col("side") == "f").join(upk, "_k").select(
                F.lit("f").alias("side"),
                F.col("_t").alias("_n"),
                (F.col("_fd") + F.col("w")).alias("dist"),
                F.col("_k").alias("pred"),
            )
            msgs_b = fr.filter(F.col("side") == "b").join(downk, "_k").select(
                F.lit("b").alias("side"),
                F.col("_t").alias("_n"),
                (F.col("_fd") + F.col("w")).alias("dist"),
                F.col("_k").alias("pred"),
            )

            # second hop in the SAME round (r13-verdict task #4: route
            # wall is per-round Spark latency on cone-sized frontiers,
            # not data volume — one extra broadcast join halves the
            # round count).  The 2-hop message's pred is the
            # intermediate node, which receives its own 1-hop message
            # this round at exactly the chained distance, so the pred
            # walk stays consistent; any stale 2-hop value is repaired
            # by later 1-hop relaxations (the Dijkstra invariant the
            # convergence probe already certifies).
            def second_hop(msgs, adjk, side_lit):
                # no per-hop reduce: duplicate messages (several 1-hop
                # paths into the same intermediate) are tolerated —
                # the round's single merge groupBy dedups them anyway,
                # and skipping the reduce keeps the hop shuffle-free
                # (frontiers are cone-sized, so the fan-out is small)
                h1 = msgs.select(
                    F.col("_n").alias("_k"),
                    F.col("dist").alias("_fd"),
                ).hint("broadcast")
                return h1.join(adjk, "_k").select(
                    F.lit(side_lit).alias("side"),
                    F.col("_t").alias("_n"),
                    (F.col("_fd") + F.col("w")).alias("dist"),
                    F.col("_k").alias("pred"),
                )

            msgs = msgs_f.unionByName(msgs_b)
            if hops_per_round >= 2:
                msgs = msgs.unionByName(
                    second_hop(msgs_f, upk, "f")
                ).unionByName(second_hop(msgs_b, downk, "b"))
            merged = (
                dist.select(
                    "side", "_n", "dist", F.lit(False).alias("_new"), "pred"
                )
                .unionByName(
                    msgs.select(
                        "side", "_n", "dist", F.lit(True).alias("_new"), "pred"
                    )
                )
                .groupBy("side", "_n")
                .agg(F.min(F.struct("dist", "_new", "pred")).alias("b"))
                .select(
                    "side",
                    "_n",
                    F.col("b.dist").alias("dist"),
                    F.col("b.pred").alias("pred"),
                    F.col("b._new").alias("_imp"),
                )
                # probe rounds: LAZY checkpoint — the probe's aggregate
                # below scans every partition of this frame, so its one
                # job both materializes the round and answers the probe
                # (non-probe rounds keep the eager materialization)
                .localCheckpoint(eager=not probe)
            )
            dist = merged.select("side", "_n", "dist", "pred")
            frontier = merged.filter(F.col("_imp")).select(
                "side", "_n", "dist"
            )
            if probe:
                st = merged.groupBy("_n").agg(
                    F.min(F.when(F.col("side") == "f", F.col("dist"))).alias(
                        "_df"
                    ),
                    F.min(F.when(F.col("side") == "b", F.col("dist"))).alias(
                        "_db"
                    ),
                    F.coalesce(
                        F.sum(F.when(F.col("_imp"), 1)), F.lit(0)
                    ).alias("_nf"),
                    F.min(F.when(F.col("_imp"), F.col("dist"))).alias(
                        "_fmin"
                    ),
                ).agg(
                    F.min(F.col("_df") + F.col("_db")).alias("mu"),
                    F.sum("_nf").alias("n_front"),
                    F.min("_fmin").alias("f_min"),
                ).collect()[0]
                mu = st["mu"]
                if st["n_front"] == 0 or (
                    mu is not None
                    and st["f_min"] is not None
                    and st["f_min"] >= mu
                ):
                    done = True
                    break
        upk.unpersist()
        downk.unpersist()
        if not done:
            raise RuntimeError(
                "CH route hit the iteration cap without converging; "
                "raise max_iterations"
            )
        if mu is None:
            return None
        # pick the meeting node deterministically (min cost, then id)
        meet_rows = (
            dist.groupBy("_n")
            .agg(
                F.min(F.when(F.col("side") == "f", F.col("dist"))).alias("_df"),
                F.min(F.when(F.col("side") == "b", F.col("dist"))).alias("_db"),
            )
            .filter(F.col("_df").isNotNull() & F.col("_db").isNotNull())
            .select("_n", (F.col("_df") + F.col("_db")).alias("_c"))
            .orderBy("_c", F.col("_n").cast("string"))
            .limit(1)
            .collect()
        )
        meet = meet_rows[0]["_n"]
        fwd_nodes = self._trace(dist, "f", meet)
        bwd_nodes = self._trace(dist, "b", meet)
        path = fwd_nodes[::-1] + bwd_nodes[1:]
        return self._unpack_distributed(path), mu

    # full-side collect allowed below this settled count; above it the
    # trace falls back to a filtered per-hop walk so the driver never
    # holds more than the cap even on degenerate hierarchies
    _TRACE_COLLECT_CAP = 200_000

    def _trace(self, dist, side, meet):
        """Walk preds driver-side.  Fast path: collect the settled side
        (cone-sized by CH theory).  If the settled set exceeds the cap
        (degenerate contraction order), fall back to hop-batched
        filtered collects — bounded driver memory, one Spark job per
        hop, path length bounded by hierarchy height."""
        side_df = dist.filter(F.col("side") == side).select("_n", "pred")
        if side_df.limit(self._TRACE_COLLECT_CAP + 1).count() <= (
            self._TRACE_COLLECT_CAP
        ):
            rows = {r["_n"]: r["pred"] for r in side_df.collect()}
            out = [meet]
            cur = rows.get(meet)
            while cur is not None:
                out.append(cur)
                cur = rows.get(cur)
            return out
        # bounded walk: a pred chain can never exceed the settled-side
        # row count, and a zero-weight tie in the min-struct merge can
        # in principle produce a pred CYCLE — track visited and raise
        # loudly instead of looping one Spark job per hop forever.
        # Filter with a typed literal (not string casts): cast-to-
        # string formatting need not match Python's str() for every
        # id type (e.g. floats), and the typed comparison keeps the
        # parquet min/max pruning on _n.
        out = [meet]
        seen = {meet}
        cur = meet
        for _ in range(self._TRACE_COLLECT_CAP):
            hop = side_df.filter(F.col("_n") == F.lit(cur)).collect()
            nxt = hop[0]["pred"] if hop else None
            if nxt is None:
                return out
            if nxt in seen:
                raise RuntimeError(
                    f"_trace: predecessor cycle at {nxt!r} (side "
                    f"{side!r}) — zero-weight tie in the merge?"
                )
            out.append(nxt)
            seen.add(nxt)
            cur = nxt
        raise RuntimeError(
            "_trace: pred walk exceeded the settled-side cap "
            f"({self._TRACE_COLLECT_CAP}) without reaching the origin"
        )

    def _unpack_distributed(self, path):
        """Expand shortcut mids level-by-level: each level filters the
        search table to the currently-needed (u, v) pairs (route-sized
        isin lists) and splits any pair carrying a mid."""
        pairs = list(zip(path, path[1:]))
        if not pairs:
            return list(path)
        resolved = self._resolve_mids(set(pairs))

        def expand(a, b):
            # iterative: nesting depth can exceed the recursion limit
            seq = []
            stack = [(a, b)]
            while stack:
                u, v = stack.pop()
                mid = resolved[(u, v)]
                if mid is None:
                    seq.append(v)
                else:
                    stack.append((mid, v))
                    stack.append((u, mid))
            return seq

        out = [path[0]]
        for a, b in pairs:
            out.extend(expand(a, b))
        return out

    def _resolve_mids(self, frontier: set) -> dict:
        """Shared shortcut resolver: map every needed (u, v) search
        pair — starting from ``frontier``, recursing into mids — to
        its bypass node (None = original edge).  Batching many paths'
        pairs into ONE frontier amortizes the per-level collects
        across all of them (the route_matrix case).

        Each collect fetches every search edge INCIDENT to the
        not-yet-queried frontier nodes (OR, not both-endpoints AND):
        every expansion pair keeps one parent endpoint, so one fetch
        discovers whole descendant chains transitively, and the
        per-pair value is unchanged — all rows of an exact (u, v) key
        are fetched together the first time either endpoint is
        queried, so the min-w mid is the same one the per-level AND
        filter produced.  Job count drops from nesting depth (linear
        in chain length for sequentially contracted chains — ~200
        collects on the deep-hierarchy regression fixture) to the
        incidence-discovery radius (~2-3 there)."""
        resolved: dict = {}
        seen_rows: dict = {}  # (u, v) -> (min w, its mid) over fetched rows
        queried: set = set()
        # each level strictly descends the hierarchy (a shortcut's mid
        # always ranks below both endpoints), so this terminates; depth
        # is unbounded in general — hence no fixed iteration cap
        while frontier:
            nodes = sorted(
                {str(n) for p in frontier for n in p} - queried
            )
            if nodes:
                rows = (
                    self.search.filter(
                        F.col("_u").cast("string").isin(nodes)
                        | F.col("_v").cast("string").isin(nodes)
                    )
                    .select("_u", "_v", "w", "mid")
                    .collect()
                )
                queried.update(nodes)
                for r in rows:
                    k = (r["_u"], r["_v"])
                    if k not in seen_rows or r["w"] < seen_rows[k][0]:
                        seen_rows[k] = (r["w"], r["mid"])
            nxt = set()
            for k in frontier:
                if k not in seen_rows:
                    raise KeyError(f"no search edge {k[0]!r} -> {k[1]!r}")
                w, mid = seen_rows[k]
                resolved[k] = mid
                if mid is not None:
                    nxt.add((k[0], mid))
                    nxt.add((mid, k[1]))
            frontier = {k for k in nxt if k not in resolved}
        return resolved
