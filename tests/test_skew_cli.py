"""Skew utilities parity + CLI build drive."""

from __future__ import annotations

import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_builds(tmp_path_factory, tiny_geojson):
    """The four `build` CLI invocations the module needs are
    independent subprocesses over the same read-only fixture — run
    them concurrently ONCE so the module pays a single JVM-startup
    wall instead of four (guide §2.6).  Commands identical to the
    previous per-test runs; each consumer still asserts its own
    returncode/stdout."""
    base = tmp_path_factory.mktemp("cli_stores")

    def build(name, extra):
        out = str(base / name)
        res = subprocess.run(
            [sys.executable, "-m", "entwiner_spark", "build",
             tiny_geojson, out, *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )
        return out, res

    specs = {
        "store": [],
        "sstore": ["--spatial-cell-deg", "0.0005"],
        "astore": [],
        "rstore": [],
    }
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {k: pool.submit(build, k, x) for k, x in specs.items()}
        return {k: f.result() for k, f in futs.items()}


def test_salted_join_matches_plain_join(spark):
    from entwiner_spark.operators.skew import salted_join

    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").groupBy("o_custkey").count()
    salted = salted_join(o, c, "o_custkey", salt=4).groupBy("o_custkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_matches_plain(spark):
    from entwiner_spark.operators.skew import salted_count

    o = spark.read.parquet(f"{SF}/orders.parquet")
    plain = {r["o_custkey"]: r["n"] for r in
             o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["o_custkey"]: r["n"] for r in salted_count(o, "o_custkey").collect()}
    assert plain == salted


def test_cli_build(cli_builds):
    out, res = cli_builds["store"]
    assert res.returncode == 0, res.stderr[-2000:]
    assert "8 edges, 5 nodes" in res.stdout
    import os

    assert os.path.exists(f"{out}/edges.parquet")


def test_cli_build_spatial_cells(cli_builds):
    out, res = cli_builds["sstore"]
    assert res.returncode == 0, res.stderr[-2000:]
    import os

    assert os.path.exists(f"{out}/_spatial_meta.json")
    assert any(
        d.startswith("_scx=") for d in os.listdir(f"{out}/edges.parquet")
    )


def test_cli_query_and_list(tmp_path):
    """`query` runs any catalog entry (writing parquet with --out),
    `list` enumerates all names, unknown names get a suggestion.
    Run as subprocesses (like the build tests) so the CLI's
    spark.stop() cannot kill the shared test session."""
    # the three invocations are independent subprocesses — run them
    # concurrently so the suite pays ONE JVM-startup wall, not three
    # (same commands, same assertions; each subprocess still starts
    # its own SparkSession exactly as before)
    from concurrent.futures import ThreadPoolExecutor

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "entwiner_spark", *args],
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )

    out = str(tmp_path / "q_out")
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_list = pool.submit(run, "list")
        f_query = pool.submit(
            run, "query", "o2_first_row", "--sf-dir",
            "/root/testdata/sf0.001", "--out", out,
        )
        f_typo = pool.submit(run, "query", "a1_table_count")  # typo
        res = f_list.result()
        assert res.returncode == 0
        names = res.stdout.split()
        assert "a1_table_counts" in names and len(names) >= 150

        res = f_query.result()
        assert res.returncode == 0, res.stderr[-2000:]
        import duckdb

        assert (
            duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
            == 1
        )

        res = f_typo.result()
        assert res.returncode != 0
        assert "did you mean" in res.stderr


def test_cli_apply_delta(tmp_path, cli_builds):
    """build then apply a delta via the CLI: counts in stdout, store
    updated in place."""
    import json as _json

    out, res = cli_builds["astore"]
    assert res.returncode == 0, res.stderr[-2000:]
    delta = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[-122.320, 47.661], [-122.321, 47.662]],
                },
                "properties": {"surface": "new"},
            }
        ],
    }
    dp = tmp_path / "delta.geojson"
    dp.write_text(_json.dumps(delta))
    res = subprocess.run(
        [sys.executable, "-m", "entwiner_spark", "apply", out, str(dp)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "upserted=2" in res.stdout and "edges=10" in res.stdout


def test_cli_route(cli_builds, spark):
    """r12: `route` subcommand — build a store, route between two real
    node ids, and the A* flag must return the identical cost."""
    import json as _json

    out, res = cli_builds["rstore"]
    assert res.returncode == 0, res.stderr[-2000:]
    from entwiner_spark.sources.parquet_store import read_graph_tables

    edges, nodes = read_graph_tables(spark, out)
    ids = sorted(r["_n"] for r in nodes.collect())
    src_id, dst_id = ids[0], ids[-1]

    def route(*extra):
        r = subprocess.run(
            [sys.executable, "-m", "entwiner_spark", "route", out,
             src_id, dst_id, *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    # the three route invocations are independent subprocesses over the
    # same read-only store — run them concurrently (one JVM-startup
    # wall instead of three); commands and assertions unchanged
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_plain = pool.submit(route)
        f_astar = pool.submit(route, "--astar", "--strategy", "pregel")
        f_ch = pool.submit(route, "--via", "ch")
        plain, astar, ch = f_plain.result(), f_astar.result(), f_ch.result()
    assert plain["reachable"] and plain["hops"] >= 1
    assert plain["path"][0] == src_id and plain["path"][-1] == dst_id
    assert abs(astar["cost"] - plain["cost"]) < 1e-6
    # r13: full-CH routing from the CLI must agree too
    assert abs(ch["cost"] - plain["cost"]) < 1e-6
    assert ch["path"][0] == src_id and ch["path"][-1] == dst_id
