"""Physical-plan invariants (PLANS.md claims as assertions)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushed_and_pruned(spark):
    from entwiner_spark import catalog
    from entwiner_spark.plans import assert_pushed_filters, plan_summary

    df = catalog.QUERIES["q1_pricing_summary"](spark, SF)
    assert_pushed_filters(df, "l_shipdate")
    # column pruning: the scan must not read all 11 lineitem columns
    read = [l for l in plan_summary(df) if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_j2_broadcasts_nation(spark):
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    df = catalog.QUERIES["j2_revenue_by_nation"](spark, SF)
    lines = plan_summary(df)
    assert any("BroadcastHashJoin" in l for l in lines)


def test_j2_top_join_shuffled_hash(spark):
    """r16: the top li⋈(o⋈c⋈n) join is pinned SHUFFLED-HASH built on
    the projected orders⋈customer side (guide §3.1) — neither side
    pays a per-partition sort, and lineitem is never the build side.

    Assertions are SCOPED to the top join (its key is l_orderkey;
    r16-ADVICE): the inner o⋈(c⋈n) joins are expected to broadcast at
    this fixture scale, but a stats/threshold flip there must not fail
    a test about the top join's pinned strategy."""
    import re

    from entwiner_spark import catalog
    from entwiner_spark.plans.explain import _formatted_plan

    df = catalog.QUERIES["j2_revenue_by_nation"](spark, SF)
    plan = _formatted_plan(df)
    # operator detail blocks: "(n) <Operator>\n<details ...>"
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    top = [b for b in blocks if "l_orderkey" in b and "Join" in b.splitlines()[0]]
    assert top, plan
    assert all(b.splitlines()[0].endswith("ShuffledHashJoin") for b in top), top


def test_topk_uses_take_ordered(spark):
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    for name in ("o1_top10_orders", "s2_cosine_top10", "geo_o1_knn"):
        lines = plan_summary(catalog.QUERIES[name](spark, SF))
        assert any("TakeOrderedAndProject" in l for l in lines), name


def test_point_lookup_pushes_equality(spark):
    """Adjacency/point predicates must reach the scan (the B-tree
    analogue: parquet min/max skipping)."""
    from pyspark.sql import functions as F

    from entwiner_spark.plans import assert_pushed_filters

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert_pushed_filters(li.filter(F.col("l_orderkey") == 42), "l_orderkey")


def test_spatial_bbox_pushed(spark, tiny_edges, tmp_path):
    """bbox predicates over the stored graph reach the parquet scan."""
    from entwiner_spark.operators.spatial import intersects
    from entwiner_spark.plans import assert_pushed_filters
    from entwiner_spark.sources.parquet_store import (
        read_graph_tables,
        write_graph_tables,
    )

    store = str(tmp_path / "s")
    write_graph_tables(tiny_edges, None, store, partitions=2)
    edges, _ = read_graph_tables(spark, store)
    cand = intersects(edges, (-122.32, -122.31, 47.65, 47.66))
    assert_pushed_filters(cand, "_minx", "_maxx", "_miny", "_maxy")


def test_contamination_broadcasts_benchmark(spark):
    """d7: the benchmark gram table broadcasts so the corpus side
    never shuffles for the join (one map pass + the per-doc agg)."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    lines = plan_summary(catalog.QUERIES["d7_contamination"](spark, SF))
    assert any("BroadcastHashJoin" in l for l in lines)


def test_hash_sample_is_shuffle_free(spark):
    """samp2: membership is a per-row predicate — zero exchanges."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    lines = plan_summary(catalog.QUERIES["samp2_hash_bernoulli"](spark, SF))
    assert not any("Exchange" in l for l in lines)


def test_pack_chunks_single_exchange(spark):
    """t7: one window over one shuffle on the stream key."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    lines = plan_summary(catalog.QUERIES["t7_pack_chunks"](spark, SF))
    assert sum("Exchange" in l for l in lines) <= 2  # hashpartition (+AQE read)
    assert any("Window" in l for l in lines)


def test_no_cartesian_in_pair_generators(spark):
    """Every at-scale pair generator must candidate via equi-joins —
    a CartesianProduct/BroadcastNestedLoop in the plan means the
    filter degraded to an all-pairs scan."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    for name in (
        "d5_ngram_jaccard_pairs",
        "d6b_embedding_neardup_lsh",
        "d3_minhash_lsh_pairs",
        "d4b_simhash_neardup",
        "g_neighbor_jaccard",
        "g_adamic_adar",
    ):
        lines = plan_summary(catalog.QUERIES[name](spark, SF))
        assert not any(
            "CartesianProduct" in l or "BroadcastNestedLoop" in l for l in lines
        ), name


def test_frame_sample_has_no_shuffle(spark):
    """The multimodal frame fan-out happens inside each task."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    lines = plan_summary(catalog.QUERIES["mm2_frame_sample"](spark, SF))
    assert not any("Exchange" in l for l in lines)
    assert any("MapInPandas" in l for l in lines)


def test_motif_plan_has_no_cartesian(spark):
    """Motif binding joins must stay equi-joins (wedge discipline):
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the
    3-term triangle pattern or the negated open-wedge pattern."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    for q in ("g_motif_ffw_triangle", "g_motif_open_wedge"):
        lines = plan_summary(catalog.QUERIES[q](spark, SF))
        assert not any(
            "CartesianProduct" in l or "BroadcastNestedLoopJoin" in l
            for l in lines
        ), q


def test_session2_new_query_plan_shapes(spark):
    """Round-5 session-2 additions keep their scale contracts:
    samp4/t16/t17 broadcast their small side (the corpus never
    shuffles for samp4), d11 has no cartesian, s11 has no explode."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    for name in ("samp4_temperature", "t16_bigram_logprob", "t17_lm_buckets"):
        lines = plan_summary(catalog.QUERIES[name](spark, SF))
        assert any(
            "BroadcastHashJoin" in l or "BroadcastNestedLoopJoin" in l
            for l in lines
        ), name

    d11 = plan_summary(catalog.QUERIES["d11_sorted_neighborhood"](spark, SF))
    assert not any("CartesianProduct" in l for l in d11)

    s11 = plan_summary(catalog.QUERIES["s11_standardize"](spark, SF))
    assert not any("Generate" in l for l in s11)


def test_composed_pipelines_plan_shapes(spark):
    """d13/t19 composed pipelines keep their contracts: no cartesian
    anywhere, and t19's filter/redact/count stages fuse into scan-side
    projections (no Python eval in the plan)."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    d13 = plan_summary(catalog.QUERIES["d13_er_pipeline"](spark, SF))
    assert not any("CartesianProduct" in l for l in d13)

    t19 = plan_summary(catalog.QUERIES["t19_pipeline_e2e"](spark, SF))
    assert not any("CartesianProduct" in l for l in t19)
    assert not any("BatchEvalPython" in l for l in t19)


def test_round6_additions_plan_shapes(spark):
    """Round-6 additions keep their scale contracts: semdedup's
    pairwise stage is an equi-join on the cluster id (never a
    cartesian across clusters); DSIR's log-ratio table and the
    ivfpq-search centroid/codebook/query sides all broadcast."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    d14 = plan_summary(catalog.QUERIES["d14_semdedup"](spark, SF))
    assert not any("CartesianProduct" in l for l in d14)

    d15 = plan_summary(catalog.QUERIES["d15_dsir_weights"](spark, SF))
    assert any("BroadcastHashJoin" in l for l in d15)
    assert not any("CartesianProduct" in l for l in d15)

    s13 = plan_summary(catalog.QUERIES["s13_ivfpq_search"](spark, SF))
    assert any(
        "BroadcastHashJoin" in l or "BroadcastNestedLoopJoin" in l
        for l in s13
    )
    assert not any("CartesianProduct" in l for l in s13)


def test_aggregate_messages_plan_shapes(spark):
    """r8 primitive plans: a superstep whose message expressions touch
    only ``edge`` must compile to a join-FREE single aggregate over
    the edge projection; a src-state superstep must hash-join (never
    sort-merge — the state side is hinted shuffle_hash against
    stats-less checkpointed frames) and never cartesian."""
    from pyspark.sql import functions as F

    from entwiner_spark import catalog
    from entwiner_spark.plans import plan_summary

    # edge-only messages: g_am_weighted_degree's plan has no join
    from entwiner_spark.plans.explain import _formatted_plan

    df = catalog.QUERIES["g_am_weighted_degree"](spark, SF)
    lines = plan_summary(df)
    assert not any("Join" in l for l in lines), [l for l in lines if "Join" in l]
    assert "HashAggregate" in _formatted_plan(df)

    # src-state messages: hash join, no SortMergeJoin, no cartesian
    g = catalog._graph_as_spark_graph(spark, SF)
    state = g.nodes.select("_n", F.col("_n").cast("double").alias("h"))
    df = g.aggregate_messages(
        F.avg("msg"), msg_to_dst=F.col("src.h"), state=state
    )
    lines = plan_summary(df)
    assert any("ShuffledHashJoin" in l or "BroadcastHashJoin" in l for l in lines)
    assert not any("SortMergeJoin" in l for l in lines)
    assert not any("Cartesian" in l for l in lines)


def test_no_hof_producer_reevaluation_catalog_wide(spark):
    """The r8 let_bound discipline as a standing invariant: NO catalog
    query's optimized plan may apply an expensive producer (split /
    sentences / regexp_extract_all) to a non-lambda input inside a
    higher-order-function lambda — Catalyst re-runs it PER ELEMENT
    (no CSE across lambda boundaries), the silent O(n^2)/row
    pathology that cost t9_winnow 27.2 s at sf0.1 for seven rounds.
    Plan compilation only for expression queries — but the catalog's
    driver-assembled gates (CH/OSM/pregel fixtures) run real jobs at
    construction, which made the serial sweep the single slowest test
    in the suite (230 s).  Queries are independent, so construction is
    fanned across a small thread pool (guide §2.6 overlap independent
    jobs): the next query's jobs back-fill the scheduler while the
    previous one sits in driver latency.  Coverage identical — every
    query still constructed and checked."""
    from concurrent.futures import ThreadPoolExecutor

    from entwiner_spark import catalog
    from entwiner_spark.plans import hof_reeval_violations

    def check(item):
        name, fn = item
        return name, hof_reeval_violations(fn(spark, SF))

    with ThreadPoolExecutor(max_workers=8) as pool:
        bad = {
            name: v for name, v in pool.map(check, catalog.QUERIES.items()) if v
        }
    assert not bad, bad


def test_let_bound_staged_split_counts(spark):
    """Exact producer counts for the r8-staged expressions (VERDICT r8
    task #3): the whole-text tokenizing split must appear EXACTLY once
    per consuming branch in the optimized plan.  A regression to the
    un-staged form multiplies these counts by the lambda arity (k+1
    for k-grams) — this pins the cheap spelling."""
    from entwiner_spark import catalog
    from entwiner_spark.plans import optimized_plan

    expected = {
        # one split feeding the shingle->hash->winnow chain
        "t9_winnow_fingerprints": 1,
        # one split per side of the doc/benchmark gram-hash self-join
        "d10_dup_ngram_coverage": 2,
        # words + distinct-ratio + top-gram branches, each staged once
        "t13_repetition_ratio": 3,
    }
    got = {
        name: optimized_plan(catalog.QUERIES[name](spark, SF)).count("split(")
        for name in expected
    }
    assert got == expected, got
    # t3 normalizes with regexp_replace + md5 — no split at all
    assert "split(" not in optimized_plan(
        catalog.QUERIES["t3_fingerprint"](spark, SF)
    )


def test_props_json_store_roundtrip(spark, tiny_edges, tmp_path):
    """Serialized-properties storage mode (reference TODO.md
    "Alternative schemas"): write with properties_json=True, read back
    — raw read exposes ONE JSON text column; default read transparently
    unpacks to the exact original rows (values, types, NULLs)."""
    import json as _json

    from entwiner_spark.sources.parquet_store import (
        read_graph_tables,
        write_graph_tables,
    )

    store = str(tmp_path / "pj")
    write_graph_tables(tiny_edges, None, store, partitions=2, properties_json=True)
    raw, _ = read_graph_tables(spark, store, unpack_properties=False)
    assert "properties" in raw.columns
    from entwiner_spark.sources.parquet_store import _PROPS_GEOM_COLS

    packed_attrs = [c for c in tiny_edges.columns
                    if not c.startswith("_") and c not in _PROPS_GEOM_COLS]
    assert packed_attrs and not any(c in raw.columns for c in packed_attrs)

    def canon(rows):
        return sorted(
            _json.dumps(r.asDict(recursive=True), sort_keys=True, default=str)
            for r in rows
        )

    edges, _ = read_graph_tables(spark, store)
    assert canon(edges.collect()) == canon(tiny_edges.collect())


def test_linegraph_single_side_exchange(spark, tiny_edges, tiny_nodes):
    """to_linegraph shuffles each |E|-row join side exactly ONCE: the
    left side goes from the raw input straight to hash(_v) — no wasted
    pass through the constructor's _u exchange — and the right side is
    the constructor's hash(_u) partitioning.  Total distinct shuffle
    nodes: left _v key + right _u key + the returned graph's own
    minor-_u repartition = 3, never 4."""
    from pyspark.sql import functions as F

    from entwiner_spark.operators.graph import SparkGraph
    from entwiner_spark.plans.explain import _formatted_plan

    # at fixture scale Catalyst (correctly) broadcasts the 8-row side;
    # disable broadcast to expose the both-sides-big shape this test
    # pins (a broadcast of the edge table is exactly what must NOT
    # happen at 100 TB)
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        # uncached createDataFrame input: the plan under audit is just
        # this operator's (the cached geojson fixture would splice its
        # own ingest exchanges into the printout)
        edges = spark.createDataFrame(
            [("a", "b", 1.0), ("b", "c", 2.0)], "u string, v string, w double"
        ).select(F.col("u").alias("_u"), F.col("v").alias("_v"), "w")
        g = SparkGraph(edges.select(F.col("_u").alias("_n")), edges)
        plan = _formatted_plan(g.to_linegraph(weight="w").edges)
    finally:
        spark.conf.set(key, prev)
    assert "BroadcastExchange" not in plan, plan
    import re as _re

    n_shuffle = len(set(_re.findall(r"\((\d+)\) Exchange", plan)))
    assert n_shuffle == 3, plan


def test_bloom_membership_is_shuffle_free(spark):
    """r12 bloom: membership over a driver bitmap is a pure scan-side
    predicate — zero exchanges over the corpus — and the bitmap build
    is exactly one exchange (the word groupBy; map-side bit_or
    partials)."""
    from pyspark.sql import functions as F

    from entwiner_spark.operators.dedup import (
        bloom_bitmap,
        bloom_build,
        bloom_contains,
    )
    from entwiner_spark.plans import plan_summary

    members = spark.createDataFrame(
        [(i, f"m{i}") for i in range(50)], "doc_id long, text string"
    )
    built = bloom_build(members, "text", num_bits=1 << 14)
    assert sum("Exchange" in l for l in plan_summary(built)) <= 2  # hash (+AQE)
    bm = bloom_bitmap(built, 1 << 14)
    corpus = spark.range(1000).select(F.concat(F.lit("c"), "id").alias("text"))
    lines = plan_summary(corpus.filter(bloom_contains(F.col("text"), bm)))
    assert not any("Exchange" in l for l in lines)


def test_normalize_url_is_shuffle_free(spark):
    """r12 t23: normalization is a scan-side projection."""
    from pyspark.sql import functions as F

    from entwiner_spark.functions.text import normalize_url
    from entwiner_spark.plans import plan_summary

    df = spark.range(100).select(
        F.concat(F.lit("http://h.com/p"), "id").alias("url")
    )
    lines = plan_summary(df.select(normalize_url(F.col("url"))))
    assert not any("Exchange" in l for l in lines)
