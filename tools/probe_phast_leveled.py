"""XL A/B probe for the level-bucketed PHAST down-sweep (r15-verdict
task #7 acceptance: measured down-sweep round count == number of
contraction levels in the down-DAG, parity vs the probed fixpoint it
replaces, wall-clock comparison).

Graph: the same N x N xxhash-weighted junction grid as
tools/probe_ch_xl.py.  Build once (pregel), then run the SAME batched
``sssp_multi`` (4 deterministic landmark sources) twice: leveled
(default) and fixpoint (forced via the ``rounds`` guard), asserting
exact key parity and <=1e-9 relative distance parity.

Usage: python tools/probe_phast_leveled.py [N]   (default 64)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import entwiner_spark as es  # noqa: E402
from entwiner_spark.operators.ch import ContractionHierarchy  # noqa: E402
from tools.probe_ch_xl import grid  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = es.get_spark(
        "probe-phast-lvl", master="local[32]", shuffle_partitions=32
    )
    g = grid(spark, n)
    t0 = time.time()
    ch = ContractionHierarchy.build(
        g, weight="w", strategy="pregel", max_rounds=40, local_finish=512
    )
    print(
        f"build {time.time() - t0:.1f}s rounds={ch.rounds} "
        f"core={ch.core_size} search={ch.n_search_edges}"
    )
    srcs = ["0:0", f"{n - 1}:{n - 1}", f"{n // 2}:0", f"0:{n // 2}"]

    stats_l: dict = {}
    t0 = time.time()
    lev = {
        (r["src"], r["_n"]): r["dist"]
        for r in ch.sssp_multi(srcs, strategy="pregel", stats=stats_l)
        .collect()
    }
    t_lev = time.time() - t0

    n_levels = (
        ch.search.filter(
            (F.col("_ru") > F.col("_rv")) | (F.col("_ru") == F.col("_rv"))
        )
        .select("_ru")
        .distinct()
        .count()
    )
    old = ch.rounds
    try:
        ch.rounds = ContractionHierarchy._LEVELED_MAX_LEVELS + 1
        stats_f: dict = {}
        t0 = time.time()
        fix = {
            (r["src"], r["_n"]): r["dist"]
            for r in ch.sssp_multi(srcs, strategy="pregel", stats=stats_f)
            .collect()
        }
        t_fix = time.time() - t0
    finally:
        ch.rounds = old

    assert lev.keys() == fix.keys(), (len(lev), len(fix))
    worst = max(
        abs(lev[k] - fix[k]) / max(abs(fix[k]), 1e-12) for k in fix
    )
    assert worst <= 1e-9, worst
    assert stats_l["down_mode"] == "leveled"
    assert stats_l["down_rounds"] == n_levels, (
        stats_l["down_rounds"],
        n_levels,
    )
    print(
        f"leveled: {t_lev:.1f}s down_rounds={stats_l['down_rounds']} "
        f"(== {n_levels} levels, by construction) | "
        f"fixpoint: {t_fix:.1f}s mode={stats_f.get('down_mode')} | "
        f"parity worst-rel {worst:.1e} over {len(lev)} (src,node) pairs"
    )
    spark.stop()


if __name__ == "__main__":
    main()
