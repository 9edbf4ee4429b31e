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

The view is read-only: mutation methods raise ImmutableGraphError
(parity: DiGraphDBView + exceptions.py:20).
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterator, Mapping

import networkx as nx

from entwiner_spark.exceptions import ImmutableGraphError

_LRU_SIZE = 10_000


def _edge_attrs(row, drop: tuple[str, str]) -> dict:
    d = row.asDict(recursive=True)
    for k in drop:
        d.pop(k, None)
    return d


class _InnerAdj(Mapping):
    """``G._succ[n]`` / ``G._pred[n]``: neighbor -> edge-attr dict.

    Construction is free (no I/O); the first read collects ALL
    neighbor edges of ``n`` in one query and memoizes them.
    """

    __slots__ = ("_sg", "_n", "_succ", "_rows")

    def __init__(self, sg, n: str, succ: bool):
        self._sg, self._n, self._succ = sg, n, succ
        self._rows: dict | None = None

    def _load(self) -> dict:
        if self._rows is None:
            if self._succ:
                rows = self._sg.successors(self._n).collect()
                self._rows = {
                    r["_v"]: _edge_attrs(r, ("_u", "_v")) for r in rows
                }
            else:
                rows = self._sg.predecessors(self._n).collect()
                self._rows = {
                    r["_u"]: _edge_attrs(r, ("_u", "_v")) for r in rows
                }
        return self._rows

    def __getitem__(self, k: str) -> dict:
        return self._load()[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._load())

    def __len__(self) -> int:
        return len(self._load())

    def __repr__(self) -> str:
        return f"_InnerAdj({self._n!r}, succ={self._succ})"


class _OuterAdj(Mapping):
    """``G._succ`` / ``G._pred``: node -> lazy inner adjacency."""

    __slots__ = ("_sg", "_succ", "_lru")

    def __init__(self, sg, succ: bool):
        self._sg, self._succ = sg, succ
        self._lru: OrderedDict[str, _InnerAdj] = OrderedDict()

    def __getitem__(self, n: str) -> _InnerAdj:
        # nx treats missing nodes via KeyError from the adjacency
        if n in self._lru:
            self._lru.move_to_end(n)
            return self._lru[n]
        if not self._sg.has_node(n):
            raise KeyError(n)
        view = _InnerAdj(self._sg, n, self._succ)
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
            f"{name}: this NetworkX view is read-only; mutate through "
            "the SparkGraph/mutations API and rebuild the view"
        )

    method.__name__ = name
    return method


class LazyDiGraphView(nx.DiGraph):
    """Read-only ``nx.DiGraph`` whose adjacency reads are Spark queries.

    >>> G = LazyDiGraphView(spark_graph)
    >>> nx.dijkstra_path(G, u, v, weight="_length")   # unmodified nx
    """

    def __init__(self, spark_graph):
        # deliberately no super().__init__(): the dict stores are
        # replaced by lazy query-backed mappings (nx >= 3.x descriptor
        # attrs _node/_succ/_pred accept mapping assignment; setting
        # _succ also wires _adj)
        self.sg = spark_graph
        self.graph = {}
        self._node = _NodeDict(spark_graph)
        self._succ = _OuterAdj(spark_graph, succ=True)
        self._pred = _OuterAdj(spark_graph, succ=False)
        self.__networkx_cache__ = {}
        # Guard the nx-internal wiring assumption: on nx >= 3.x the
        # _succ descriptor aliases _adj; if a networkx release changes
        # that layout, algorithms would silently read the wrong store.
        if getattr(self, "_adj", None) is not self._succ:
            raise RuntimeError(
                "LazyDiGraphView requires networkx >= 3 (_adj must alias "
                f"_succ; found networkx {nx.__version__})"
            )

    # nx uses len(G) / iter(G) via _node; __contains__ via _node too.

    add_node = _immutable("add_node")
    add_nodes_from = _immutable("add_nodes_from")
    remove_node = _immutable("remove_node")
    remove_nodes_from = _immutable("remove_nodes_from")
    add_edge = _immutable("add_edge")
    add_edges_from = _immutable("add_edges_from")
    add_weighted_edges_from = _immutable("add_weighted_edges_from")
    remove_edge = _immutable("remove_edge")
    remove_edges_from = _immutable("remove_edges_from")
    clear = _immutable("clear")
    clear_edges = _immutable("clear_edges")
    update = _immutable("update")
