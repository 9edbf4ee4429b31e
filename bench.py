"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., ...extras}

Extras mirror the reference's published perf assertions (BASELINE.md):
- bulk_insert_edges_per_sec: fwd+rev edge synthesis + parquet write
  (reference: >= ~2,260 edges/s, tests/test_build.py)
- keyed_updates_per_sec: MERGE-style keyed update throughput
  (reference: >= 2,000 updates/s, tests/test_digraphdb.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

try:
    LOAD_AT_START = round(os.getloadavg()[0], 2)
except OSError:
    LOAD_AT_START = None

HEADLINE = [
    "q1_pricing_summary",
    "j2_revenue_by_nation",
    "a2_orders_per_customer",
    "o1_top10_orders",
    "u2_last_write_wins",
    "w1_top3_per_customer",
    "geo_f6_haversine_within",
    "g_j1_sssp_weighted",
    "t1_doc_stats",
    "d2_minhash_signatures",
    "d3_minhash_lsh_pairs",
    "d4_simhash",
    "s2_cosine_top10",
    "s4_lsh_buckets",
    "e1_tumbling_hourly",
    "e3_sessionize",
]


def main() -> None:
    # --repeat N runs the HEADLINE timing loop N times in one session
    # and reports per-query medians (the clean-host protocol from
    # TODO.md: single runs swing +-15-30% even at loadavg 0.4).  The
    # default (1) keeps the driver's invocation byte-compatible.
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from entwiner_spark import catalog
    from entwiner_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + whole-stage codegen caches: run every headline
    # query once at the smallest SF so measured times reflect execution,
    # not first-compile of each query's generated code
    spark.range(1000).count()
    for name in HEADLINE:
        try:
            catalog.QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
    # DISCLOSED untimed warm-up at the TARGET SF (r13-verdict task #3,
    # standard benchmark hygiene): the single-shot driver protocol was
    # dominated by cold-start — page cache for the sf0.1 parquet,
    # per-query first-plan analysis — which grew with the codebase and
    # drifted the headline 19% with zero code changes (the 5-run local
    # protocol converges 18.7→12.1 s).  One untimed pass removes that
    # term; "warmup_passes" in the JSON discloses it.
    for name in HEADLINE:
        try:
            catalog.QUERIES[name](spark, SF_DIR).collect()
        except Exception:
            pass

    sf = None
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    runs: list[dict[str, float]] = []
    for _ in range(max(1, args.repeat)):
        t: dict[str, float] = {}
        for name in HEADLINE:
            fn = catalog.QUERIES[name]
            t0 = time.time()
            rows = fn(spark, SF_DIR).collect()
            t[name] = round(time.time() - t0, 3)
            del rows
        runs.append(t)
    import statistics

    times = {
        name: round(statistics.median(r[name] for r in runs), 3)
        for name in HEADLINE
    }

    # --- reference-parity throughput extras ---------------------------
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        edges = catalog.QUERIES["s1_fwd_rev_ingest"](spark, SF_DIR)
        edges.write.mode("overwrite").parquet(f"{tmp}/edges.parquet")
        n_edges = spark.read.parquet(f"{tmp}/edges.parquet").count()
        insert_rate = n_edges / (time.time() - t0)

        from entwiner_spark.operators.mutations import update_columns

        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        # materialize the update batch BEFORE the clock starts — the
        # reference's perf assertion (tests/test_digraphdb.py:38-53)
        # builds its update dicts first and times only update_edges()
        updates = orders.limit(10000).select(
            "o_orderkey", F.lit("BENCH-UPDATED").alias("o_orderpriority")
        ).localCheckpoint()
        t0 = time.time()
        merged = update_columns(orders, updates, ["o_orderkey"])
        merged.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
        n_upd = 10000
        update_rate = n_upd / (time.time() - t0)

    # forced-pregel SSSP on a 100k-node / ~200k-edge synthetic graph:
    # the catalog's g_j1_sssp_weighted runs the local fast path at
    # oracle scale, so this is the only headline signal for the
    # distributed loop's per-iteration cost (12 bounded iterations)
    from entwiner_spark.operators.graph import SparkGraph

    n = 100_000
    base = spark.range(n)
    e1 = base.filter(F.col("id") < n - 1).select(
        F.col("id").cast("string").alias("_u"),
        (F.col("id") + 1).cast("string").alias("_v"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    e2 = base.filter(F.col("id") < n - 1000).select(
        F.col("id").cast("string").alias("_u"),
        (F.col("id") + 1000).cast("string").alias("_v"),
        (F.col("id") % 3 + 5).cast("double").alias("w"),
    )
    g_edges = e1.unionByName(e2)
    g_nodes = base.select(F.col("id").cast("string").alias("_n"))
    g_edges.count()  # materialize generation outside the timed window
    G = SparkGraph(g_nodes, g_edges, partitions=32)
    t0 = time.time()
    G.shortest_path_lengths("0", weight="w", max_iterations=12, strategy="pregel").count()
    pregel_sec = round(time.time() - t0, 3)

    # composed-pipeline extras (NOT part of the frozen 16-query
    # headline): the two multi-stage catalog pipelines most like
    # production jobs, tracked round-over-round like pregel_sssp
    pipeline_extras: dict[str, float] = {}
    for name in ("t19_pipeline_e2e", "d13_er_pipeline"):
        try:
            catalog.QUERIES[name](spark, "/root/testdata/sf0.001").collect()
            t0 = time.time()
            catalog.QUERIES[name](spark, SF_DIR).collect()
            pipeline_extras[f"{name}_sec"] = round(time.time() - t0, 3)
        except Exception:
            pipeline_extras[f"{name}_sec"] = None

    # concurrent-load marker: headline wall varies ±30% with machine
    # load (TODO.md); loadavg at start/end makes that noise auditable
    # when comparing BENCH_rN.json across rounds
    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "bulk_insert_edges_per_sec": round(insert_rate, 1),
                "keyed_updates_per_sec": round(update_rate, 1),
                "pregel_sssp_200k_12iter_sec": pregel_sec,
                "warmup_passes": {"sf0.001": 1, "target_sf": 1},
                **pipeline_extras,
                "loadavg_1m_start": LOAD_AT_START,
                "loadavg_1m_end": load_1m,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
