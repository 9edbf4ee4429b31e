"""XL A/B probe for the level-bucketed PHAST down-sweep (r15-verdict
task #7 acceptance, revised by its own first measurement).

Finding that reshaped the feature: with a local-finish block the rank
structure has one level PER LOCALLY-CONTRACTED NODE, so "one pass per
level" runs hundreds of rounds while the probed fixpoint only pays
down-DAG DEPTH rounds — measured 64x64 / local_finish=512: 525 levels,
leveled 346 s vs fixpoint 20.8 s (parity exact).  The sweep is
therefore CHOSEN per query from the real level count
(``_use_leveled``: leveled only when len(levels) <=
max(64, 2 * build rounds)).

Phase 1 (the production shape): local_finish=512 build — asserts the
selector picks FIXPOINT and times it.
Phase 2 (the pure-distributed shape): local_finish=1 build on a
smaller grid — asserts the selector picks LEVELED, down_rounds == the
down-DAG's distinct level count, and exact parity vs a forced
fixpoint.

Usage: python tools/probe_phast_leveled.py [N1] [N2]  (default 64 40)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import entwiner_spark as es  # noqa: E402
from entwiner_spark.operators.ch import ContractionHierarchy  # noqa: E402
from tools.probe_ch_xl import grid  # noqa: E402


def n_levels(ch):
    return (
        ch.search.filter(
            (F.col("_ru") > F.col("_rv")) | (F.col("_ru") == F.col("_rv"))
        )
        .select("_ru")
        .distinct()
        .count()
    )


def run(ch, srcs, force_fixpoint=False):
    stats: dict = {}
    if force_fixpoint:
        ch._LEVELED_MIN_LEVELS = 0
        old = ch.rounds
        ch.rounds = 0
    t0 = time.time()
    try:
        d = {
            (r["src"], r["_n"]): r["dist"]
            for r in ch.sssp_multi(
                srcs, strategy="pregel", stats=stats
            ).collect()
        }
    finally:
        if force_fixpoint:
            ch.rounds = old
            del ch._LEVELED_MIN_LEVELS
    return d, stats, time.time() - t0


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = es.get_spark(
        "probe-phast-lvl", master="local[32]", shuffle_partitions=32
    )

    # phase 1: local-finish build (production default shape)
    g = grid(spark, n1)
    t0 = time.time()
    ch = ContractionHierarchy.build(
        g, weight="w", strategy="pregel", max_rounds=40, local_finish=512
    )
    print(
        f"p1 build {time.time() - t0:.1f}s rounds={ch.rounds} "
        f"levels={n_levels(ch)}"
    )
    srcs = ["0:0", f"{n1 - 1}:{n1 - 1}", f"{n1 // 2}:0", f"0:{n1 // 2}"]
    d1, s1, t1 = run(ch, srcs)
    assert s1["down_mode"] == "fixpoint", s1  # selector must refuse
    print(f"p1 auto(fixpoint): {t1:.1f}s over {len(d1)} pairs")

    # phase 2: pure-distributed build (no local-finish inflation)
    g2 = grid(spark, n2)
    t0 = time.time()
    ch2 = ContractionHierarchy.build(
        g2, weight="w", strategy="pregel", max_rounds=60, local_finish=1
    )
    lv = n_levels(ch2)
    print(
        f"p2 build {time.time() - t0:.1f}s rounds={ch2.rounds} "
        f"core={ch2.core_size} levels={lv}"
    )
    srcs2 = ["0:0", f"{n2 - 1}:{n2 - 1}"]
    d2, s2, t2 = run(ch2, srcs2)
    assert s2["down_mode"] == "leveled", s2
    assert s2["down_rounds"] == lv, (s2, lv)
    d2f, s2f, t2f = run(ch2, srcs2, force_fixpoint=True)
    assert d2.keys() == d2f.keys()
    worst = max(
        abs(d2[k] - d2f[k]) / max(abs(d2f[k]), 1e-12) for k in d2f
    )
    assert worst <= 1e-9, worst
    print(
        f"p2 leveled: {t2:.1f}s down_rounds={s2['down_rounds']}(=={lv}) "
        f"| forced fixpoint: {t2f:.1f}s | parity worst-rel {worst:.1e} "
        f"over {len(d2)} pairs"
    )
    spark.stop()


if __name__ == "__main__":
    main()
