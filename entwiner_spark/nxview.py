"""Lazy NetworkX-protocol view over a :class:`SparkGraph`.

The reference's primary query API is a NetworkX-compatible ``DiGraph``
whose dict-protocol reads are database queries
(/root/reference/entwiner/graphs/digraphdb/__init__.py:16-93,
outer_adjlists.py:14-57, inner_adjlists.py:13-51): any unmodified nx
algorithm — ``nx.dijkstra_path(G, u, v, "length")`` — runs against the
store.  This module closes that protocol gap for the Spark engine:
``G[n]``, ``n in G``, ``G.nodes``, ``G.edges``, ``G.pred`` are lazy
mappings backed by ``successors()`` / ``predecessors()`` /
``has_node()`` point lookups.

Scale note (by design, same as the reference): this surface is
inherently point-lookup-shaped — each adjacency read is one filtered
DataFrame collect on the driver.  It exists so driver-side nx
algorithms work unmodified on graphs whose edge tables live in Spark;
bulk analytics should use the distributed SparkGraph methods
(shortest_path, pagerank, connected_components, ...) instead.  Inner
adjacency rows for a node are fetched in ONE collect and memoized
(parity with the reference's items() fast path, "avoid two round
trips", inner_adjlists.py:37-41), and an LRU bounds driver memory.

By default the view is read-only: mutation methods raise
ImmutableGraphError (parity: DiGraphDBView + exceptions.py:20).  With
``mutable=True`` the view is the ``DiGraphDB`` parity surface
(graphs/digraphdb/__init__.py:96-167): ``G[u][v]["cost"] = 2`` and
``del G[u][v]["cost"]`` write through to the keyed-MERGE mutation
operators (operators/mutations.py), ``add_edge(s_from)`` /
``remove_edge(s_from)`` upsert/anti-join the edge table, and
``update_edges(ebunch)`` is the batched path (the reference's own,
graphs/digraphdb/__init__.py:164-167 — broken there, functional here).
Writes to the key columns (``_u``/``_v``) and ``fid`` silently do not
stick, matching the reference's PK protection (test_digraphdb.py
test_update_fid).  Each write replaces the backing DataFrame plan
lazily and bumps a generation counter that invalidates the view's
memoized adjacency; lineage is truncated with localCheckpoint every
``_CHECKPOINT_EVERY`` writes.  Per-assignment writes are the
reference's own perf model (one SQL UPDATE per ``d[k]=v``); for bulk
mutation use ``update_edges``/``add_edges_from`` (one join per batch),
and call ``flush(store_dir)`` to persist the mutated graph atomically.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterator, Mapping, MutableMapping

import networkx as nx

from entwiner_spark.exceptions import EdgeNotFound, ImmutableGraphError

_LRU_SIZE = 10_000
_CHECKPOINT_EVERY = 50
#: columns a dict-protocol write may never touch (PK parity: the
#: reference ignores fid writes, test_digraphdb.py test_update_fid)
_PROTECTED_KEYS = frozenset({"_u", "_v", "fid"})


def _edge_attrs(row, drop: tuple[str, str]) -> dict:
    d = row.asDict(recursive=True)
    for k in drop:
        d.pop(k, None)
    return d


class _EdgeDict(MutableMapping):
    """Write-through edge-attr mapping for the mutable view (parity:
    EdgeDict, reference graphs/digraphdb/edges.py:7-39).

    Reads come from a generation-stamped snapshot — same one-collect
    fast path as the read-only view — and refresh automatically after
    any write through the owning view.  ``d[k] = v`` routes to the
    keyed mutation operators; ``del d[k]`` sets NULL (the reference's
    delete semantics); protected keys silently do not stick.
    """

    __slots__ = ("_view", "_u", "_v", "_attrs", "_gen")

    def __init__(self, view, u: str, v: str, attrs: dict | None, gen: int):
        self._view, self._u, self._v = view, u, v
        self._attrs, self._gen = attrs, gen

    def _load(self) -> dict:
        if self._attrs is None or self._gen != self._view._generation:
            self._attrs = self._view.sg.edge_attrs(self._u, self._v)
            self._gen = self._view._generation
        return self._attrs

    def __getitem__(self, k: str):
        return self._load()[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._load())

    def __len__(self) -> int:
        return len(self._load())

    def _fresh(self) -> bool:
        """True when the snapshot matches the view's current edge plan —
        the edge provably exists, so the write can skip the existence
        scan (one Spark job per assignment instead of two)."""
        return (
            self._attrs is not None
            and self._gen == self._view._generation
        )

    def __setitem__(self, k: str, value) -> None:
        if k in _PROTECTED_KEYS:
            return  # PK columns never change via the dict protocol
        self._view._write_edge_attr(
            self._u, self._v, k, value, _known_exists=self._fresh()
        )

    def __delitem__(self, k: str) -> None:
        if k in _PROTECTED_KEYS:
            return
        if k not in self._load():
            # MutableMapping contract; also prevents a misspelled delete
            # from installing a permanent void-typed column
            raise KeyError(k)
        self._view._write_edge_attr(
            self._u, self._v, k, None, _known_exists=self._fresh()
        )

    def __repr__(self) -> str:
        return f"_EdgeDict({self._u!r}, {self._v!r}, {dict(self._load())!r})"


class _InnerAdj(Mapping):
    """``G._succ[n]`` / ``G._pred[n]``: neighbor -> edge-attr dict.

    Construction is free (no I/O); the first read collects ALL
    neighbor edges of ``n`` in one query and memoizes them.  On a
    mutable view the values are write-through :class:`_EdgeDict`
    instances seeded from the same single collect.
    """

    __slots__ = ("_sg", "_n", "_succ", "_rows", "_view")

    def __init__(self, sg, n: str, succ: bool, view=None):
        self._sg, self._n, self._succ = sg, n, succ
        self._rows: dict | None = None
        self._view = view

    def _load(self) -> dict:
        if self._rows is None:
            if self._succ:
                rows = self._sg.successors(self._n).collect()
                pairs = [(r["_v"], _edge_attrs(r, ("_u", "_v"))) for r in rows]
            else:
                rows = self._sg.predecessors(self._n).collect()
                pairs = [(r["_u"], _edge_attrs(r, ("_u", "_v"))) for r in rows]
            v = self._view
            if v is not None and v._mutable:
                gen = v._generation
                self._rows = {
                    k: _EdgeDict(
                        v,
                        self._n if self._succ else k,
                        k if self._succ else self._n,
                        attrs,
                        gen,
                    )
                    for k, attrs in pairs
                }
            else:
                self._rows = dict(pairs)
        return self._rows

    def __getitem__(self, k: str):
        return self._load()[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._load())

    def __len__(self) -> int:
        return len(self._load())

    def __repr__(self) -> str:
        return f"_InnerAdj({self._n!r}, succ={self._succ})"


class _OuterAdj(Mapping):
    """``G._succ`` / ``G._pred``: node -> lazy inner adjacency."""

    __slots__ = ("_sg", "_succ", "_lru", "_view")

    def __init__(self, sg, succ: bool, view=None):
        self._sg, self._succ = sg, succ
        self._lru: OrderedDict[str, _InnerAdj] = OrderedDict()
        self._view = view

    def __getitem__(self, n: str) -> _InnerAdj:
        # nx treats missing nodes via KeyError from the adjacency
        if n in self._lru:
            self._lru.move_to_end(n)
            return self._lru[n]
        if not self._sg.has_node(n):
            raise KeyError(n)
        view = _InnerAdj(self._sg, n, self._succ, view=self._view)
        self._lru[n] = view
        if len(self._lru) > _LRU_SIZE:
            self._lru.popitem(last=False)
        return view

    def __contains__(self, n: object) -> bool:
        return n in self._lru or self._sg.has_node(n)

    def __iter__(self) -> Iterator[str]:
        for r in self._sg.nodes.select("_n").toLocalIterator():
            yield r["_n"]

    def __len__(self) -> int:
        return self._sg.order()


class _NodeDict(Mapping):
    """``G._node``: node id -> node-attr dict."""

    __slots__ = ("_sg",)

    def __init__(self, sg):
        self._sg = sg

    def __getitem__(self, n: str) -> dict:
        rows = self._sg.get_node(n).limit(1).collect()
        if not rows:
            raise KeyError(n)
        d = rows[0].asDict(recursive=True)
        d.pop("_n", None)
        return d

    def __contains__(self, n: object) -> bool:
        return self._sg.has_node(n)

    def __iter__(self) -> Iterator[str]:
        for r in self._sg.nodes.select("_n").toLocalIterator():
            yield r["_n"]

    def __len__(self) -> int:
        return self._sg.order()


def _immutable(name: str):
    def method(self, *a, **kw):
        raise ImmutableGraphError(
            f"{name}: this NetworkX view is read-only; pass mutable=True "
            "or mutate through the SparkGraph/mutations API and rebuild"
        )

    method.__name__ = name
    return method


def _mutating(name: str, impl):
    """Dispatch: mutable views run ``impl``, read-only views raise."""

    def method(self, *a, **kw):
        if not getattr(self, "_mutable", False):
            _immutable(name)(self)
        return impl(self, *a, **kw)

    method.__name__ = name
    return method


def _normalize_ebunch(ebunch, attr) -> list[tuple[str, str, dict]]:
    out = []
    for e in ebunch:
        if len(e) == 3:
            u, v, d = e
        elif len(e) == 2:
            u, v, d = e[0], e[1], {}
        else:
            raise ValueError(f"edge tuple {e!r} must be (u, v) or (u, v, d)")
        out.append((u, v, {**attr, **d}))
    return out


class LazyDiGraphView(nx.DiGraph):
    """``nx.DiGraph`` whose adjacency reads are Spark queries.

    >>> G = LazyDiGraphView(spark_graph)
    >>> nx.dijkstra_path(G, u, v, weight="_length")   # unmodified nx

    With ``mutable=True`` the dict protocol writes through to the
    keyed-MERGE mutation operators (DiGraphDB parity — see module
    docstring):

    >>> G = LazyDiGraphView(spark_graph, mutable=True)
    >>> G[u][v]["cost"] = 2.0         # one keyed update
    >>> G.update_edges([(u, v, {"cost": 3.0}), ...])   # batched
    >>> G.flush("/path/to/store")     # atomic persist
    """

    def __init__(self, spark_graph, mutable: bool = False):
        # deliberately no super().__init__(): the dict stores are
        # replaced by lazy query-backed mappings (nx >= 3.x descriptor
        # attrs _node/_succ/_pred accept mapping assignment; setting
        # _succ also wires _adj)
        self.sg = spark_graph
        self.graph = {}
        self._mutable = mutable
        self._generation = 0
        self._writes = 0
        self._node = _NodeDict(spark_graph)
        self._succ = _OuterAdj(spark_graph, succ=True, view=self)
        self._pred = _OuterAdj(spark_graph, succ=False, view=self)
        self.__networkx_cache__ = {}
        # Guard the nx-internal wiring assumption: on nx >= 3.x the
        # _succ descriptor aliases _adj; if a networkx release changes
        # that layout, algorithms would silently read the wrong store.
        if getattr(self, "_adj", None) is not self._succ:
            raise RuntimeError(
                "LazyDiGraphView requires networkx >= 3 (_adj must alias "
                f"_succ; found networkx {nx.__version__})"
            )

    @property
    def mutable(self) -> bool:
        """Parity: DiGraphDB sets ``self.mutable = True`` (reference
        graphs/digraphdb/__init__.py:132)."""
        return self._mutable

    def iter_edges(self):
        """Generator of ``(u, v, d)`` with ``d`` a PLAIN dict — the
        reference's fast bulk-read path that skips the database-synced
        edge mapping (graphs/digraphdb/__init__.py:68-82).  Streams
        via ``toLocalIterator`` (one partition in driver memory at a
        time), so it walks edge tables far larger than the driver —
        unlike ``.edges``, which goes through the point-lookup
        protocol."""
        for row in self.sg.edges.toLocalIterator():
            yield (
                row["_u"],
                row["_v"],
                _edge_attrs(row, ("_u", "_v")),
            )

    @classmethod
    def create_graph(cls, spark, path: str | None = None, mutable: bool = True):
        """Create a view over a NEW empty graph (parity:
        DiGraphDB.create_graph, graphs/digraphdb/__init__.py:135-137 —
        there it initializes the SQLite tables; here the canonical
        empty edge/node DataFrames, optionally published to ``path``
        as a parquet store)."""
        from entwiner_spark.operators.graph import SparkGraph
        from entwiner_spark.schemas import EDGES_BASE_SCHEMA, NODES_SCHEMA

        edges = spark.createDataFrame([], EDGES_BASE_SCHEMA)
        nodes = spark.createDataFrame([], NODES_SCHEMA)
        if path is not None:
            from entwiner_spark.sources.parquet_store import (
                write_graph_tables,
            )

            write_graph_tables(edges, nodes, path, partitions=1)
        return cls(SparkGraph(nodes, edges), mutable=mutable)

    # ---- write plumbing (mutable views only) --------------------------

    def _swap_edges(self, new_edges) -> None:
        """Install a mutated edge plan and invalidate every memoized
        read.  Lineage is truncated periodically so thousands of
        incremental writes cannot build an unbounded plan tree."""
        self._writes += 1
        if self._writes % _CHECKPOINT_EVERY == 0:
            new_edges = new_edges.localCheckpoint(eager=True)
        self.sg.edges = new_edges
        self.sg._edges_raw = new_edges
        self.sg._invalidate_size_caches()
        self._generation += 1
        self._succ._lru.clear()
        self._pred._lru.clear()
        self.__networkx_cache__.clear()

    def _write_edge_attr(
        self, u: str, v: str, key: str, value, _known_exists: bool = False
    ) -> None:
        from entwiner_spark.operators.mutations import set_edge_attr

        if not _known_exists and not self.sg.get_edge(u, v).limit(1).count():
            raise EdgeNotFound(f"({u}, {v})")
        self._swap_edges(set_edge_attr(self.sg.edges, u, v, key, value))

    def _impl_update_edges(self, ebunch) -> None:
        """Batched keyed update — the path the reference intends with
        DiGraphDB.update_edges (graphs/digraphdb/__init__.py:164-167).
        One broadcast join per call, however many edges are in the
        batch; unknown attr columns are added (schema evolution)."""
        from entwiner_spark.operators.mutations import update_columns

        edges = _normalize_ebunch(ebunch, {})
        if not edges:
            return
        # Drop keys whose values are all None: schema inference cannot
        # type them (CANNOT_DETERMINE_TYPE), and under update_columns'
        # sparse-update semantics a NULL update keeps the old value, so
        # an all-None column is a no-op anyway (per-edge NULL-clearing
        # goes through del G[u][v][k], reference delete semantics).
        keys = sorted(
            {
                k
                for _, _, d in edges
                for k in d
                if k not in _PROTECTED_KEYS and d[k] is not None
            }
        )
        if not keys:
            return
        rows = [
            {"_u": u, "_v": v, **{k: d.get(k) for k in keys}}
            for u, v, d in edges
        ]
        updates = self.sg.spark.createDataFrame(rows)
        self._swap_edges(
            update_columns(self.sg.edges, updates, ["_u", "_v"])
        )

    def _impl_add_edges_from(self, ebunch, **attr) -> None:
        """Batched upsert (parity: DiGraphDB.add_edges_from's batched
        SQL writes, graphs/digraphdb/__init__.py:139-163).  New
        endpoints are added to the node table."""
        from entwiner_spark.operators.mutations import upsert

        edges = _normalize_ebunch(ebunch, attr)
        if not edges:
            return
        keys = sorted({k for _, _, d in edges for k in d} - _PROTECTED_KEYS)
        rows = [
            {"_u": u, "_v": v, **{k: d.get(k) for k in keys}}
            for u, v, d in edges
        ]
        incoming = self.sg.spark.createDataFrame(rows)
        new_edges = upsert(self.sg.edges, incoming, ["_u", "_v"])
        # insert only MISSING endpoints: an upsert would replace
        # existing node rows with attribute-less (_n)-only rows,
        # destroying node geometry/attrs for every touched endpoint
        node_ids = sorted({n for u, v, _ in edges for n in (u, v)})
        fresh = (
            self.sg.spark.createDataFrame([(n,) for n in node_ids], ["_n"])
            .join(self.sg.nodes.select("_n"), "_n", "left_anti")
        )
        self.sg.nodes = self.sg.nodes.unionByName(
            fresh, allowMissingColumns=True
        )
        self._swap_edges(new_edges)

    def _impl_add_edge(self, u, v, **attr) -> None:
        self._impl_add_edges_from([(u, v, dict(attr))])

    def _impl_add_weighted_edges_from(
        self, ebunch, weight: str = "weight", **attr
    ) -> None:
        # nx semantics: (u, v, w) triples; delegates to the batched add
        self._impl_add_edges_from(
            [(u, v, {**attr, weight: w}) for u, v, w in ebunch]
        )

    def _impl_remove_edges_from(self, ebunch) -> None:
        from entwiner_spark.operators.mutations import delete_keys

        pairs = [(e[0], e[1]) for e in ebunch]
        if not pairs:
            return
        keys_df = self.sg.spark.createDataFrame(pairs, ["_u", "_v"])
        self._swap_edges(delete_keys(self.sg.edges, keys_df, ["_u", "_v"]))

    def _impl_remove_edge(self, u, v) -> None:
        if not self.sg.get_edge(u, v).limit(1).count():
            raise nx.NetworkXError(f"The edge {u}-{v} is not in the graph.")
        self._impl_remove_edges_from([(u, v)])

    def flush(self, store_dir: str, **kwargs) -> None:
        """Persist the (possibly mutated) graph atomically to a parquet
        store (temp-dir + rename, sources/parquet_store.py)."""
        from entwiner_spark.sources.parquet_store import write_graph_tables

        write_graph_tables(self.sg.edges, self.sg.nodes, store_dir, **kwargs)

    # nx uses len(G) / iter(G) via _node; __contains__ via _node too.

    add_node = _immutable("add_node")
    add_nodes_from = _immutable("add_nodes_from")
    remove_node = _immutable("remove_node")
    remove_nodes_from = _immutable("remove_nodes_from")
    add_edge = _mutating("add_edge", _impl_add_edge)
    add_edges_from = _mutating("add_edges_from", _impl_add_edges_from)
    add_weighted_edges_from = _mutating(
        "add_weighted_edges_from", _impl_add_weighted_edges_from
    )
    remove_edge = _mutating("remove_edge", _impl_remove_edge)
    remove_edges_from = _mutating("remove_edges_from", _impl_remove_edges_from)
    update_edges = _mutating("update_edges", _impl_update_edges)
    clear = _immutable("clear")
    clear_edges = _immutable("clear_edges")
    update = _immutable("update")
