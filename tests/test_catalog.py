"""Catalog smoke: every query runs at sf0.001 and the driver contract
is well-formed.  Full DuckDB-oracle verification runs via
tools/check.py (mirrored by the driver at sf0.01)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)
    # round 2: every query has a DuckDB oracle (zero rows-only entries)
    assert set(qs) == set(oracles)


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "j2_revenue_by_nation",
        "u2_last_write_wins",
        "g_j1_sssp_weighted",
        "geo_f6_haversine_within",
        "s1_fwd_rev_ingest",
        "d3_minhash_lsh_pairs",
        "s2_cosine_top10",
        "e3_sessionize",
        "mm1_binary_meta",
    ],
)
def test_query_runs_at_sf0001(spark, name):
    from entwiner_spark import catalog

    df = catalog.QUERIES[name](spark, SF)
    assert df.limit(5).count() >= 0  # executes without error


def test_approx_degree_accuracy(spark):
    """approx_count_distinct stays within its rsd bound vs exact."""
    from pyspark.sql import functions as F

    from entwiner_spark import catalog

    rows = catalog.QUERIES["a2b_approx_degree"](spark, SF).collect()
    assert rows, "a2b produced no groups"
    exact = {
        r["o_orderstatus"]: r["x"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("x"))
        .collect()
    }
    for r in rows:
        assert r["within_bound"], r
        assert r["exact_custs"] == exact[r["o_orderstatus"]]
