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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entwiner_spark.operators import spatial


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

    def _edge_count(self) -> int:
        if not hasattr(self, "_cached_edge_count"):
            self._cached_edge_count = self.edges.count()
        return self._cached_edge_count

    def _use_local(self, strategy: str) -> bool:
        if strategy == "local":
            return True
        if strategy == "pregel":
            return False
        return self._edge_count() <= self.LOCAL_THRESHOLD

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
        w = self._weight_col(weight)
        return [
            (r["_u"], r["_v"], r["_w"])
            for r in self.edges.select("_u", "_v", w.alias("_w")).collect()
        ]

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
                T.StructField("_n", T.StringType(), False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        return self.spark.createDataFrame(list(dist.items()), schema)

    def shortest_path_lengths(
        self,
        source: str,
        weight: str | None = None,
        max_iterations: int | None = None,
        checkpoint_every: int = 5,
        strategy: str = "auto",
    ) -> DataFrame:
        """Single-source shortest distances: DataFrame ``(_n, dist)``.

        ``weight=None`` -> hop counts (BFS); ``max_iterations`` bounds
        the hop radius (k-hop neighborhood) — None means run to
        convergence (safety cap 200).  Equivalent of driving
        nx.dijkstra over the lazy adjacency views (SURVEY.md §3.2), as a
        distributed Bellman-Ford/Pregel loop; small graphs short-cut to
        a driver-side Dijkstra (``strategy`` = auto|pregel|local).
        """
        bounded = max_iterations is not None
        if strategy == "auto" and weight is not None and bounded:
            # truncated *weighted* iteration has Bellman-Ford-step
            # semantics only the distributed loop reproduces
            strategy = "pregel"
        if self._use_local(strategy):
            out = self._local_sssp(source, weight)
            if weight is None and bounded:
                # truncated BFS == k-hop neighborhood
                out = out.filter(F.col("dist") <= float(max_iterations))
            return out
        bounded_by_caller = max_iterations is not None
        if max_iterations is None:
            max_iterations = 200
        w = self._weight_col(weight)
        adj = self.edges.select(
            F.col("_u"), F.col("_v"), w.alias("_w")
        ).localCheckpoint(eager=False)

        schema = T.StructType(
            [
                T.StructField("_n", T.StringType(), False),
                T.StructField("dist", T.DoubleType(), False),
            ]
        )
        dist = self.spark.createDataFrame([(source, 0.0)], schema)
        frontier = dist

        converged = False
        for it in range(max_iterations):
            msgs = (
                frontier.join(adj, frontier["_n"] == adj["_u"])
                .select(adj["_v"].alias("_n"), (frontier["dist"] + adj["_w"]).alias("dist"))
                .groupBy("_n")
                .agg(F.min("dist").alias("dist"))
            )
            joined = msgs.alias("m").join(dist.alias("d"), "_n", "left_outer")
            improved = joined.filter(
                F.col("d.dist").isNull() | (F.col("m.dist") < F.col("d.dist"))
            ).select("_n", F.col("m.dist").alias("dist"))
            improved = improved.localCheckpoint(eager=True)
            if improved.isEmpty():
                converged = True
                break
            # merge via outer join + coalesce (a Union here trips
            # Catalyst constraint rewriting on checkpointed lineage)
            dist = (
                dist.alias("d")
                .join(improved.alias("i"), "_n", "full_outer")
                .select(
                    "_n",
                    F.coalesce(F.col("i.dist"), F.col("d.dist")).alias("dist"),
                )
            )
            if (it + 1) % checkpoint_every == 0:
                dist = dist.localCheckpoint(eager=True)
            frontier = improved
        if not converged and not bounded_by_caller:
            raise RuntimeError(
                "SSSP hit the 200-iteration safety cap without "
                "converging; pass max_iterations explicitly for a "
                "bounded (k-hop) result or raise the cap"
            )
        return dist

    def shortest_path(
        self,
        source: str,
        target: str,
        weight: str | None = None,
        max_iterations: int | None = None,
        strategy: str = "auto",
    ) -> tuple[list[str], float] | None:
        """Reconstructed path + total distance, or None if unreachable.

        Path reconstruction collects only O(path length) rows.
        """
        if self._use_local(strategy):
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
        if max_iterations is None:
            max_iterations = 200
        w = self._weight_col(weight)
        adj = self.edges.select(F.col("_u"), F.col("_v"), w.alias("_w")).localCheckpoint(
            eager=False
        )
        schema = T.StructType(
            [
                T.StructField("_n", T.StringType(), False),
                T.StructField("dist", T.DoubleType(), False),
                T.StructField("pred", T.StringType(), True),
            ]
        )
        dist = self.spark.createDataFrame([(source, 0.0, None)], schema)
        frontier = dist
        for it in range(max_iterations):
            msgs = (
                frontier.join(adj, frontier["_n"] == adj["_u"])
                .select(
                    adj["_v"].alias("_n"),
                    (frontier["dist"] + adj["_w"]).alias("dist"),
                    frontier["_n"].alias("pred"),
                )
                .groupBy("_n")
                .agg(F.min(F.struct("dist", "pred")).alias("best"))
                .select("_n", F.col("best.dist").alias("dist"), F.col("best.pred").alias("pred"))
            )
            joined = msgs.alias("m").join(dist.alias("d"), "_n", "left_outer")
            improved = joined.filter(
                F.col("d.dist").isNull() | (F.col("m.dist") < F.col("d.dist"))
            ).select("_n", F.col("m.dist").alias("dist"), F.col("m.pred").alias("pred"))
            improved = improved.localCheckpoint(eager=True)
            if improved.isEmpty():
                break
            dist = (
                dist.alias("d")
                .join(improved.alias("i"), "_n", "full_outer")
                .select(
                    "_n",
                    F.coalesce(F.col("i.dist"), F.col("d.dist")).alias("dist"),
                    F.when(F.col("i.dist").isNotNull(), F.col("i.pred"))
                    .otherwise(F.col("d.pred"))
                    .alias("pred"),
                )
            )
            if (it + 1) % 5 == 0:
                dist = dist.localCheckpoint(eager=True)
            frontier = improved

        # reconstruct by walking predecessors with point lookups —
        # O(path length) tiny queries against the checkpointed dist
        # table instead of collecting every reachable node
        dist = dist.localCheckpoint(eager=True)
        t_row = dist.filter(F.col("_n") == target).collect()
        if not t_row:
            return None
        total = t_row[0]["dist"]
        path, cur = [target], t_row[0]["pred"]
        while cur is not None:
            path.append(cur)
            cur = dist.filter(F.col("_n") == cur).collect()[0]["pred"]
        return path[::-1], total

    def connected_components(
        self, max_iterations: int = 200, strategy: str = "auto"
    ) -> DataFrame:
        """Weakly connected components: ``(_n, component)`` with
        component = min node id reachable over undirected edges.
        Small-star/large-star-lite label propagation; small graphs use
        driver-side union-find (same min-label semantics).
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
                    T.StructField("_n", T.StringType(), False),
                    T.StructField("component", T.StringType(), False),
                ]
            )
            rows = [(n, comp_min[find(n)]) for n in parent]
            return self.spark.createDataFrame(rows, schema)
        und = (
            self.edges.select("_u", "_v")
            .unionByName(self.edges.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # seed from nodes ∪ edge endpoints so nodes appearing only in
        # edges are labeled too (the local union-find path includes
        # them; the two strategies must agree).  Built from self.edges,
        # not `und`, to avoid an ambiguous self-join with the
        # propagation loop below.
        all_nodes = (
            self.nodes.select("_n")
            .unionByName(self.edges.select(F.col("_u").alias("_n")))
            .unionByName(self.edges.select(F.col("_v").alias("_n")))
            .distinct()
        )
        labels = all_nodes.select("_n", F.col("_n").alias("component"))
        converged = False
        for it in range(max_iterations):
            prop = (
                labels.join(und, labels["_n"] == und["_u"])
                .select(und["_v"].alias("_n"), F.col("component"))
                .groupBy("_n")
                .agg(F.min("component").alias("component"))
            )
            merged = (
                labels.alias("l")
                .join(prop.alias("p"), "_n", "left_outer")
                .select(
                    "_n",
                    F.least(
                        F.col("l.component"), F.coalesce(F.col("p.component"), F.col("l.component"))
                    ).alias("component"),
                )
            )
            merged = merged.localCheckpoint(eager=True)
            changed = (
                merged.alias("a")
                .join(labels.alias("b"), "_n")
                .filter(F.col("a.component") != F.col("b.component"))
                .limit(1)
                .count()
            )
            labels = merged
            if changed == 0:
                converged = True
                break
        if not converged:
            # one-hop min-label propagation needs O(diameter) rounds;
            # silent wrong components are worse than an error
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_iterations} iterations (graph diameter exceeds "
                "the budget); raise max_iterations"
            )
        return labels

    def pagerank(
        self,
        alpha: float = 0.85,
        max_iterations: int = 20,
        tol: float = 1e-6,
        strategy: str = "auto",
    ) -> DataFrame:
        """PageRank over the directed edge set: ``(_n, rank)``.

        Parity with the reference's "centrality metrics" claim
        (/root/reference/README.md:67) — implemented as iterative
        DataFrame message passing; small graphs run the same formula
        driver-side.
        """
        if self._use_local(strategy):
            triples = self._collect_triples(None)
            node_ids = [r["_n"] for r in self.nodes.select("_n").collect()]
            n_nodes = len(node_ids)
            out_deg: dict[str, int] = {}
            for u, _, _ in triples:
                out_deg[u] = out_deg.get(u, 0) + 1
            ranks = {n: 1.0 / n_nodes for n in node_ids}
            for _ in range(max_iterations):
                contribs: dict[str, float] = {}
                for u, v, _ in triples:
                    # edges whose source is absent from the nodes table
                    # contribute nothing (matches the distributed join)
                    if u in ranks:
                        contribs[v] = contribs.get(v, 0.0) + ranks[u] / out_deg[u]
                dangling = sum(r for n, r in ranks.items() if n not in out_deg)
                new_ranks = {
                    n: (1 - alpha) / n_nodes
                    + alpha * (contribs.get(n, 0.0) + dangling / n_nodes)
                    for n in node_ids
                }
                delta = sum(abs(new_ranks[n] - ranks[n]) for n in node_ids)
                ranks = new_ranks
                if delta < tol:
                    break
            schema = T.StructType(
                [
                    T.StructField("_n", T.StringType(), False),
                    T.StructField("rank", T.DoubleType(), False),
                ]
            )
            return self.spark.createDataFrame(list(ranks.items()), schema)
        n_nodes = self.nodes.count()
        out = self.edges.groupBy("_u").agg(F.count(F.lit(1)).alias("deg"))
        adj = (
            self.edges.select("_u", "_v")
            .join(out, "_u")
            .localCheckpoint(eager=False)
        )
        ranks = self.nodes.select("_n", F.lit(1.0 / n_nodes).alias("rank"))
        for it in range(max_iterations):
            contribs = (
                ranks.join(adj, ranks["_n"] == adj["_u"])
                .select(adj["_v"].alias("_n"), (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("_n")
                .agg(F.sum("c").alias("c"))
            )
            # dangling mass redistributed uniformly
            dangling = ranks.join(
                adj.select("_u").distinct(), ranks["_n"] == F.col("_u"), "left_anti"
            ).agg(F.sum("rank")).collect()[0][0] or 0.0
            new_ranks = (
                self.nodes.select("_n")
                .join(contribs, "_n", "left_outer")
                .select(
                    "_n",
                    (
                        F.lit((1 - alpha) / n_nodes)
                        + F.lit(alpha)
                        * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n_nodes))
                    ).alias("rank"),
                )
            ).localCheckpoint(eager=True)
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "_n")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        return ranks

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

    def closeness(self, weight=None, strategy: str = "auto") -> DataFrame:
        """Closeness-style centrality: per source node, the sum of
        shortest-path distances to its reachable set and the reach
        count (parity with the reference's "centrality metrics" claim,
        README.md:67).

        Small graphs: driver-side Dijkstra per source.  Large graphs:
        this is |V| SSSP runs — run per-landmark sampling instead
        (call shortest_path_lengths for a landmark subset).
        """
        if not self._use_local(strategy):
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
                T.StructField("_n", T.StringType(), False),
                T.StructField("total_dist", T.DoubleType(), False),
                T.StructField("n_reachable", T.IntegerType(), False),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def closeness_landmarks(
        self,
        n_landmarks: int = 16,
        weight=None,
        strategy: str = "auto",
    ) -> DataFrame:
        """Approximate closeness at scale: SSSP from a deterministic
        landmark sample instead of every node (the documented
        escalation from exact ``closeness``).

        Landmarks are every ceil(V/n)-th node by sorted id (stable
        across runs).  Returns per node: sum of distances FROM the
        landmarks that reach it, how many did, and the normalized
        ``avg_dist`` (compare rankings with avg_dist — raw sums are not
        comparable across nodes reached by different landmark counts).
        On a symmetric graph with all nodes as landmarks this equals
        exact closeness.

        Use this only when the graph is too big for ``closeness`` (k
        SSSP runs instead of V); below LOCAL_THRESHOLD exact closeness
        is both cheaper and correct.  Small landmark counts rank
        coarsely — quality grows with k.
        """
        ids = sorted(r["_n"] for r in self.nodes.select("_n").collect())
        step = max(1, len(ids) // n_landmarks)
        landmarks = ids[::step][:n_landmarks] if n_landmarks < len(ids) else ids

        totals: DataFrame | None = None
        for lm in landmarks:
            d = self.shortest_path_lengths(lm, weight=weight, strategy=strategy)
            d = d.select("_n", F.col("dist").alias("_d"))
            if totals is None:
                totals = d.select(
                    "_n", F.col("_d").alias("total_dist"), F.lit(1).alias("n_landmarks")
                )
            else:
                totals = (
                    totals.alias("t")
                    .join(d.alias("d"), "_n", "full_outer")
                    .select(
                        "_n",
                        (
                            F.coalesce(F.col("t.total_dist"), F.lit(0.0))
                            + F.coalesce(F.col("d._d"), F.lit(0.0))
                        ).alias("total_dist"),
                        (
                            F.coalesce(F.col("t.n_landmarks"), F.lit(0))
                            + F.when(F.col("d._d").isNotNull(), 1).otherwise(0)
                        ).alias("n_landmarks"),
                    )
                )
        return totals.withColumn(
            "avg_dist", F.col("total_dist") / F.col("n_landmarks")
        )

    # ---- interop (TODO.md:37-39 parity) -------------------------------
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
