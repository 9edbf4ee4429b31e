"""XL A/B probes for the r12 additions (run ad-hoc; results recorded
in PLANS.md — the stress suite stays the regression gate):

1. ``relabel``: integer node re-keying (SparkGraph.relabel_ids) vs the
   natural ``"lon, lat"`` string keys on a 1M-node / ~2M-edge Pregel
   SSSP — the claim under test is the shuffle-WIDTH cut (8-byte longs
   vs ~22-byte strings on every exchange of every round), measured
   from the Spark UI REST API (sum of stage shuffle read+write bytes
   over exactly the SSSP section), plus wall clock and a full
   distance-table equality join after restore_ids.

2. ``chroute``: end-to-end point-to-point routing on a chain-heavy
   street-shaped graph (150k junction hubs on a ring, 5-node chains
   between them — 1.05M nodes / ~1.8M directed edges): raw
   ``shortest_path`` vs ``via="contracted"`` on a prebuilt
   ``contract_chains(keep_path=True)`` graph (the build-once /
   route-many lifecycle).  Asserts path-cost equality and that the
   expanded path visits the same raw node sequence, then reports the
   wall ratio — the r11-measured 8x ROUND cut becoming a route
   speedup.

Usage: SPARK_UI=true python tools/probe_relabel_xl.py [relabel|chroute|all]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_UI", "true")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def shuffle_bytes(spark) -> tuple[int, int]:
    """Cumulative shuffle (read+write bytes, write records) across all
    completed stages.  NOTE: bytes are post-LZ4 — coordinate strings
    share long prefixes and compress extremely well, while xxhash64
    longs are incompressible, so bytes alone UNDERSTATE the long-key
    win; records give the width denominator."""
    stages = _rest(spark, "/stages?status=complete")
    return (
        sum(
            s.get("shuffleWriteBytes", 0) + s.get("shuffleReadBytes", 0)
            for s in stages
        ),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def probe_relabel(spark, out) -> None:
    from pyspark.sql import functions as F

    from entwiner_spark.operators.graph import SparkGraph

    n = 1_000_000
    base = spark.range(n)
    # realistic junction keys: "-122.xxxxxxx, 47.yyyyyyy" (~22 bytes)
    key = lambda c: F.concat_ws(  # noqa: E731
        ", ",
        F.format_string("%.7f", F.lit(-122.0) + (c % 1000) * 1e-4),
        F.format_string("%.7f", F.lit(47.0) + (c.cast("double") / 1000).cast("long") * 1e-4),
    )
    # 4-neighbor multiplicative expander: reach saturates ~|V| within
    # ~10 hops, so the per-round SSSP state merge shuffles ~1M keyed
    # rows — the workload where key WIDTH actually shows (a chain+skip
    # graph reaches 91 nodes in 12 hops and measures nothing)
    parts = []
    for a, b in ((2, 1), (3, 5), (5, 7), (7, 11)):
        parts.append(
            base.select(
                key(F.col("id")).alias("_u"),
                key((F.col("id") * a + b) % n).alias("_v"),
                (F.col("id") % 7 + 1).cast("double").alias("w"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.localCheckpoint(eager=True)  # pin outside timing
    nodes = (
        base.select(key(F.col("id")).alias("_n")).localCheckpoint(eager=True)
    )
    source = "-122.0000000, 47.0000000"  # key(0)
    out["relabel_edges"] = edges.count()

    G = SparkGraph(nodes, edges, partitions=32)
    sb0, sr0 = shuffle_bytes(spark)
    t0 = time.time()
    d_str = G.shortest_path_lengths(
        source, weight="w", max_iterations=12, strategy="pregel"
    ).localCheckpoint(eager=True)
    out["string_reached"] = d_str.count()
    out["string_sec"] = round(time.time() - t0, 1)
    sb1, sr1 = shuffle_bytes(spark)
    out["string_shuffle_mb"] = round((sb1 - sb0) / 1e6, 1)
    out["string_bytes_per_rec"] = round((sb1 - sb0) / max(sr1 - sr0, 1), 1)

    for method in ("hash", "dense"):
        t0 = time.time()
        Gl, mapping = G.relabel_ids(method=method)
        mapping = mapping.localCheckpoint(eager=True)
        long_edges = Gl.edges.localCheckpoint(eager=True)
        long_nodes = Gl.nodes.localCheckpoint(eager=True)
        out[f"{method}_relabel_build_sec"] = round(time.time() - t0, 1)
        Gl = SparkGraph(long_nodes, long_edges, partitions=32)
        src_id = mapping.filter(F.col("_n") == source).collect()[0]["_id"]

        sb0, sr0 = shuffle_bytes(spark)
        t0 = time.time()
        d_long = Gl.shortest_path_lengths(
            src_id, weight="w", max_iterations=12, strategy="pregel"
        ).localCheckpoint(eager=True)
        out[f"{method}_reached"] = d_long.count()
        out[f"{method}_sec"] = round(time.time() - t0, 1)
        sb1, sr1 = shuffle_bytes(spark)
        out[f"{method}_shuffle_mb"] = round((sb1 - sb0) / 1e6, 1)
        out[f"{method}_bytes_per_rec"] = round(
            (sb1 - sb0) / max(sr1 - sr0, 1), 1
        )

        t0 = time.time()
        restored = SparkGraph.restore_ids(d_long, mapping, cols=["_n"])
        mismatch = (
            restored.withColumnRenamed("dist", "dist_l")
            .join(d_str, "_n", "full")
            .filter(
                F.col("dist").isNull()
                | F.col("dist_l").isNull()
                | (F.round("dist", 6) != F.round("dist_l", 6))
            )
            .count()
        )
        out[f"{method}_restore_sec"] = round(time.time() - t0, 1)
        assert mismatch == 0, f"{method}-relabeled SSSP != string-keyed SSSP"
        assert out[f"{method}_reached"] == out["string_reached"]
        out[f"{method}_wall_speedup"] = round(
            out["string_sec"] / max(out[f"{method}_sec"], 0.1), 2
        )


def probe_chroute(spark, out) -> None:
    from pyspark.sql import functions as F

    from entwiner_spark.operators.graph import SparkGraph

    hubs, chain = 150_000, 5
    seg = chain + 1  # hops per hub->hub link
    base = spark.range(hubs * seg)
    hub = F.col("id").cast("long") / seg
    pos = F.col("id") % seg
    # node i: hub h = i//seg, chain position p = i%seg (p=0 is the hub)
    name = F.when(pos == 0, F.concat(F.lit("h"), hub.cast("long").cast("string"))).otherwise(
        F.concat_ws("_", F.concat(F.lit("c"), hub.cast("long").cast("string")), pos.cast("string"))
    )
    nxt_id = (F.col("id") + 1) % (hubs * seg)
    nxt_hub = nxt_id.cast("long") / seg
    nxt_pos = nxt_id % seg
    nxt = F.when(
        nxt_pos == 0, F.concat(F.lit("h"), nxt_hub.cast("long").cast("string"))
    ).otherwise(
        F.concat_ws("_", F.concat(F.lit("c"), nxt_hub.cast("long").cast("string")), nxt_pos.cast("string"))
    )
    fwd = base.select(name.alias("_u"), nxt.alias("_v"), F.lit(1.0).alias("w"))
    # hub chords (h_i <-> h_{i+2}, weight 1000): WITHOUT them every ring
    # node is a 2-in/2-out through-node and the whole ring is one pure
    # 900k-node cycle, which contract_chains correctly detects and
    # emits UNCHANGED (the first run of this probe measured exactly
    # that: 0 absorbed, 1.0x).  The chords give hubs degree 4 so they
    # are retained, while the expensive weight keeps every shortest
    # path on the chains — topology shapes contraction leverage.
    hub_ids = spark.range(hubs)
    hname = lambda c: F.concat(F.lit("h"), c.cast("string"))  # noqa: E731
    chord = hub_ids.select(
        hname(F.col("id")).alias("_u"),
        hname((F.col("id") + 2) % hubs).alias("_v"),
        F.lit(1000.0).alias("w"),
    )
    fwd = fwd.unionByName(chord)
    edges = fwd.unionByName(
        fwd.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"), "w")
    ).localCheckpoint(eager=True)
    nodes = base.select(name.alias("_n")).localCheckpoint(eager=True)
    out["chroute_edges"] = edges.count()
    out["chroute_nodes"] = nodes.count()
    G = SparkGraph(nodes, edges, partitions=32)

    t0 = time.time()
    C = G.contract_chains(weight="w", keep_path=True)
    cn = C.nodes.localCheckpoint(eager=True)
    ce = C.edges.localCheckpoint(eager=True)
    out["contract_build_sec"] = round(time.time() - t0, 1)
    out["contracted_nodes"] = cn.count()
    out["contracted_edges"] = ce.count()
    assert out["contracted_nodes"] == hubs, "all chain interiors absorbed"
    C = SparkGraph(cn, ce)

    for span in (10, 25):
        s, t = "h0", f"h{span}"
        t0 = time.time()
        raw = G.shortest_path(s, t, weight="w", strategy="pregel")
        raw_sec = time.time() - t0
        t0 = time.time()
        ch = G.shortest_path(
            s, t, weight="w", strategy="pregel", via="contracted", contracted=C
        )
        ch_sec = time.time() - t0
        assert raw is not None and ch is not None
        assert abs(raw[1] - ch[1]) < 1e-6, (raw[1], ch[1])
        assert raw[0] == ch[0], "expanded path must equal raw node sequence"
        out[f"route{span}_hops"] = len(raw[0]) - 1
        out[f"route{span}_raw_sec"] = round(raw_sec, 1)
        out[f"route{span}_ch_sec"] = round(ch_sec, 1)
        out[f"route{span}_speedup"] = round(raw_sec / max(ch_sec, 0.01), 2)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from entwiner_spark.session import get_spark

    spark = get_spark("probe_relabel_xl")
    spark.range(10).count()
    out: dict = {}
    if which in ("relabel", "all"):
        probe_relabel(spark, out)
        print(json.dumps(out), flush=True)
    if which in ("chroute", "all"):
        probe_chroute(spark, out)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
