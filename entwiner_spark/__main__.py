"""CLI: build a graph store from GeoJSON (the `entwiner` CLI analogue).

Reference: /root/reference/entwiner/cli.py — `entwiner in.geojson ...
out.gpkg [--precision N] [--changes-sign col]`.  Here the output is a
parquet graph store directory (use --gpkg for a GeoPackage artifact):

    python -m entwiner_spark build in1.geojson [in2 ...] out_store \
        [--precision 7] [--changes-sign incline] [--gpkg]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="entwiner_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="GeoJSON -> graph store")
    b.add_argument("inputs", nargs="+", help="input GeoJSON files + output path last")
    b.add_argument("--precision", type=int, default=7)
    b.add_argument("--changes-sign", action="append", default=[])
    b.add_argument("--gpkg", action="store_true", help="write a GeoPackage instead")
    b.add_argument(
        "--spatial-cell-deg",
        type=float,
        default=None,
        help="partition the store by bbox grid cell of this size "
        "(degrees); dwithin reads then prune whole cell directories",
    )
    qp = sub.add_parser(
        "query", help="run a named catalog query against a testdata dir"
    )
    qp.add_argument("name", help="query name (see `list`)")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--out", default=None, help="write result parquet here")
    qp.add_argument("--show", type=int, default=20, help="rows to print")
    sub.add_parser("list", help="list all catalog query names")
    r = sub.add_parser(
        "route", help="point-to-point route over a graph store"
    )
    r.add_argument("store", help="graph store directory")
    r.add_argument("source", help="source node id ('lon, lat')")
    r.add_argument("target", help="target node id ('lon, lat')")
    r.add_argument("--weight", default="_length")
    r.add_argument(
        "--via",
        choices=["raw", "contracted", "ch"],
        default="raw",
        help="'contracted' builds a CH-lite chain contraction and "
        "routes on the minor (build-once cost; big win on chain-heavy "
        "street graphs); 'ch' builds FULL contraction hierarchies "
        "(every node ranked, bidirectional upward query — the win "
        "survives high-degree junctions where chain-folding stalls)",
    )
    r.add_argument(
        "--astar",
        action="store_true",
        help="A* with the admissible straight-line haversine bound "
        "(requires 'lon, lat' node ids and a metric weight like "
        "_length; raw routes only)",
    )
    r.add_argument("--strategy", default="auto", help="auto|pregel|local")
    a = sub.add_parser(
        "apply", help="merge GeoJSON delta file(s) into an existing store"
    )
    a.add_argument("store", help="graph store directory")
    a.add_argument("deltas", nargs="+", help="GeoJSON delta file(s)")
    a.add_argument("--precision", type=int, default=7)
    a.add_argument("--changes-sign", action="append", default=[])
    a.add_argument(
        "--versioned",
        action="store_true",
        help="treat the store as a versioned store (optimistic "
        "concurrency: a concurrent publish raises instead of being "
        "silently erased)",
    )
    args = ap.parse_args(argv)

    if args.cmd == "list":
        from entwiner_spark.catalog import QUERIES

        for name in sorted(QUERIES):
            print(name)
        return 0

    if args.cmd == "query":
        from entwiner_spark.catalog import QUERIES

        if args.name not in QUERIES:
            import difflib

            near = difflib.get_close_matches(args.name, QUERIES, n=3)
            hint = f" (did you mean: {', '.join(near)}?)" if near else ""
            ap.error(f"unknown query {args.name!r}{hint}")
        from entwiner_spark.session import get_spark

        spark = get_spark(f"entwiner-query-{args.name}")
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            # count from the written files (footer scan), not by
            # re-executing a possibly-iterative query plan
            n = spark.read.parquet(args.out).count()
            print(f"wrote {args.out}: {n} rows")
        else:
            df.show(args.show, truncate=False)
        spark.stop()
        return 0

    if args.cmd == "route":
        from entwiner_spark.operators.graph import SparkGraph
        from entwiner_spark.session import get_spark
        from entwiner_spark.sources.geojson import nodes_from_edges
        from entwiner_spark.sources.parquet_store import read_graph_tables

        spark = get_spark("entwiner-route")
        edges, nodes = read_graph_tables(spark, args.store)
        if nodes is None:
            nodes = nodes_from_edges(edges)
        g = SparkGraph(nodes, edges)
        heuristic = None
        strategy = args.strategy
        if args.astar:
            if args.via != "raw":
                ap.error("--astar applies to raw routes (CH search "
                         "orders by rank, minor-node ids carry no "
                         "coordinates)")
            if args.strategy == "local":
                ap.error("--astar requires the distributed frontier "
                         "(the local path is plain Dijkstra and "
                         "ignores the heuristic); drop --strategy "
                         "local or drop --astar")
            # strategy=auto would pick the local path on small graphs
            # and silently no-op the heuristic (ADVICE r12) — force
            # the pregel A* branch so --astar means A*
            strategy = "pregel"
            from entwiner_spark.functions.geo import haversine_heuristic

            try:
                heuristic = haversine_heuristic(args.target)
            except ValueError as exc:
                ap.error(str(exc))
        res = g.shortest_path(
            args.source,
            args.target,
            weight=args.weight,
            strategy=strategy,
            via=args.via,
            heuristic=heuristic,
        )
        import json as _json

        if res is None:
            print(_json.dumps({"reachable": False}))
            spark.stop()
            return 1
        path, cost = res
        print(_json.dumps(
            {"reachable": True, "cost": round(cost, 3),
             "hops": len(path) - 1, "path": path}
        ))
        spark.stop()
        return 0

    if args.cmd == "apply":
        import os

        missing = [s for s in args.deltas if not os.path.exists(s)]
        if missing:
            ap.error(f"delta file(s) not found: {', '.join(missing)}")
        from entwiner_spark.session import get_spark
        from entwiner_spark.sources.delta_apply import (
            apply_geojson_delta,
            apply_geojson_delta_versioned,
        )

        spark = get_spark("entwiner-apply")
        fn = (
            apply_geojson_delta_versioned
            if args.versioned
            else apply_geojson_delta
        )
        stats = fn(
            spark,
            args.store,
            args.deltas,
            precision=args.precision,
            changes_sign=tuple(args.changes_sign),
        )
        print(
            " ".join(f"{k}={v}" for k, v in stats.items())
        )
        spark.stop()
        return 0

    if args.cmd == "build":
        *sources, out = args.inputs
        if not sources:
            ap.error("need at least one input and one output path")
        import os

        missing = [s for s in sources if not os.path.exists(s)]
        if missing:
            ap.error(f"input file(s) not found: {', '.join(missing)}")
        from entwiner_spark.session import get_spark
        from entwiner_spark.sources.geojson import edges_from_geojson, nodes_from_edges

        spark = get_spark("entwiner-build")
        edges = edges_from_geojson(
            spark,
            sources,
            precision=args.precision,
            changes_sign=tuple(args.changes_sign),
            with_length=True,
        )
        nodes = nodes_from_edges(edges, precision=args.precision)
        if args.gpkg:
            from entwiner_spark.sources.gpkg import add_rtree_index, write_geopackage

            cols = [
                c for c in edges.columns
                if c not in ("_minx", "_maxx", "_miny", "_maxy")
            ]
            write_geopackage(edges.select(*cols), out, "edges")
            write_geopackage(nodes, out, "nodes", geometry_type="POINT", append=True)
            # reference CLI builds r-trees post-import (cli.py:46-51)
            add_rtree_index(out, "edges")
            add_rtree_index(out, "nodes")
        else:
            from entwiner_spark.sources.parquet_store import write_graph_tables

            write_graph_tables(
                edges, nodes, out, spatial_cell_deg=args.spatial_cell_deg
            )
        print(f"built {out}: {edges.count()} edges, {nodes.count()} nodes")
        spark.stop()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
