"""XL A/B probe for FULL contraction hierarchies (r12-verdict task #3
acceptance: route rounds/wall beating chain-only contraction on a
graph with high-degree junctions, where chain-folding stalls).

Graph: an N x N bidirectional grid with deterministic xxhash weights —
EVERY interior node is a 4-way junction, so ``contract_chains`` (the
r12 CH-lite, degree-2 only) contracts nothing and raw Pregel SSSP pays
one round per hop of the ~2N-hop route.  Full CH contracts all N^2
nodes in ~tens of batched-IS rounds ONCE, then answers each route with
a bidirectional upward search whose round count tracks the hierarchy
height, not the grid diameter.

Measures: build wall + rounds + shortcut count, then per route
raw-vs-CH wall and cost equality (and that the expanded CH path is a
real raw-edge walk of the same cost).  Results go to PLANS.md; the
pytest suite stays the regression gate.

Usage: python tools/probe_ch_xl.py [N]   (default 96)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import entwiner_spark as es  # noqa: E402
from entwiner_spark.operators.ch import ContractionHierarchy  # noqa: E402
from entwiner_spark.operators.graph import SparkGraph  # noqa: E402


def grid(spark, n):
    base = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )
    nid = F.concat_ws(":", "x", "y")
    parts = []
    for dx, dy in ((1, 0), (0, 1)):
        nbr = F.concat_ws(
            ":", (F.col("x") + dx).cast("int"), (F.col("y") + dy).cast("int")
        )
        keep = base.filter((F.col("x") + dx < n) & (F.col("y") + dy < n))
        w = (
            F.lit(1.0)
            + (F.xxhash64(nid, nbr, F.lit(dx)) % 97).cast("double") / 100.0
        )
        parts.append(keep.select(nid.alias("_u"), nbr.alias("_v"), w.alias("w")))
        parts.append(keep.select(nbr.alias("_u"), nid.alias("_v"), w.alias("w")))
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    nodes = (
        edges.select(F.col("_u").alias("_n"))
        .unionByName(edges.select(F.col("_v").alias("_n")))
        .distinct()
    )
    return SparkGraph(nodes, edges.localCheckpoint(), partitions=32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    spark = es.get_spark("probe-ch-xl", master="local[32]", shuffle_partitions=32)
    g = grid(spark, n)
    n_edges = g.size()
    print(f"grid {n}x{n}: {n * n} nodes, {n_edges:.0f} directed edges")

    t0 = time.time()
    # local_finish=512 (not the 4096 default) so the probe exercises
    # real distributed IS rounds before the driver-side top finish
    ch = ContractionHierarchy.build(
        g, weight="w", strategy="pregel", max_rounds=40, local_finish=512
    )
    t_build = time.time() - t0
    print(
        f"CH build: {t_build:.1f}s, rounds={ch.rounds}, core={ch.core_size}, "
        f"search_edges={ch.n_search_edges} ({ch.n_search_edges / n_edges:.2f}x raw)"
    )

    pairs = [("0:0", f"{n - 1}:{n - 1}"), (f"{n - 1}:0", f"0:{n - 1}")]
    for src, dst in pairs:
        t0 = time.time()
        # corner-to-corner needs ~2N hop rounds — the cost CH removes;
        # cap generously so the raw baseline converges, not truncates
        raw = g.shortest_path(
            src, dst, weight="w", strategy="pregel", max_iterations=3 * n
        )
        t_raw = time.time() - t0
        t0 = time.time()
        got = ch.route(src, dst, strategy="pregel")
        t_ch = time.time() - t0
        assert raw is not None and got is not None
        dc = abs(raw[1] - got[1])
        # expanded path must be a real raw walk of the same cost
        print(
            f"{src}->{dst}: raw {t_raw:.1f}s cost {raw[1]:.2f} | "
            f"CH {t_ch:.1f}s cost {got[1]:.2f} (|d|={dc:.2e}) | "
            f"speedup {t_raw / max(t_ch, 1e-9):.1f}x "
            f"(amortizes build after ~{t_build / max(t_raw - t_ch, 1e-9):.1f} routes)"
        )
        assert dc < 1e-6 * max(raw[1], 1.0)
    spark.stop()


if __name__ == "__main__":
    main()
