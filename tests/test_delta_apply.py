"""Incremental store maintenance: GeoJSON delta -> MERGE."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tests.conftest import TINY_COORDS


def _feature(coords, props=None):
    return {
        "type": "Feature",
        "geometry": {"type": "LineString", "coordinates": coords},
        "properties": props or {},
    }


def test_apply_geojson_delta(spark, tiny_edges, tiny_nodes, tmp_path):
    from entwiner_spark.sources.delta_apply import apply_geojson_delta
    from entwiner_spark.sources.parquet_store import (
        read_graph_tables,
        write_graph_tables,
    )

    store = str(tmp_path / "store")
    write_graph_tables(tiny_edges, tiny_nodes, store, partitions=2)

    # delta: modify feature 1 (new surface prop), add a new feature,
    # delete feature 3 (both directions)
    delta = {
        "type": "FeatureCollection",
        "features": [
            _feature(TINY_COORDS[0], {"surface": "gravel"}),
            _feature([[-122.320, 47.661], [-122.321, 47.662]], {"surface": "new"}),
            _feature(TINY_COORDS[2], {"_deleted": True}),
        ],
    }
    dpath = tmp_path / "delta.geojson"
    dpath.write_text(json.dumps(delta))

    stats = apply_geojson_delta(spark, store, str(dpath))
    # 2 non-deleted features -> 4 edges upserted; 1 deleted -> 2 edges
    assert stats["upserted"] == 4 and stats["deleted"] == 2
    # 8 original - 2 deleted + 2 new = 8
    assert stats["edges"] == 8

    edges, nodes = read_graph_tables(spark, store)
    # modified edge carries the new property both directions
    mod = edges.filter(F.col("surface") == "gravel")
    assert mod.count() == 2
    # deleted edge gone in both directions
    del_u = "-122.3141965, 47.659887"
    del_v = "-122.3142026, 47.6597293"
    gone = edges.filter(
        ((F.col("_u") == del_u) & (F.col("_v") == del_v))
        | ((F.col("_u") == del_v) & (F.col("_v") == del_u))
    )
    assert gone.count() == 0
    # new endpoints exist; orphaned endpoint of the deleted edge gone
    ids = {r["_n"] for r in nodes.collect()}
    assert "-122.32, 47.661" in ids and "-122.321, 47.662" in ids
    assert del_v not in ids  # only the deleted edge touched it
    # untouched edges intact
    assert edges.filter(F.col("surface").isNull()).count() == 4


def test_sequential_interleaved_writers_last_write_wins(
    spark, tiny_edges, tiny_nodes, tmp_path
):
    """Two writers applying deltas back-to-back (the supported
    single-writer-at-a-time discipline — PLANS.md 'Concurrent-writer
    semantics'): call 2 reads call 1's published store, so the merge
    is serializable and the LAST write's attributes win on a shared
    (_u, _v) key; a later delete removes an earlier upsert."""
    from entwiner_spark.sources.delta_apply import apply_geojson_delta
    from entwiner_spark.sources.parquet_store import (
        read_graph_tables,
        write_graph_tables,
    )

    store = str(tmp_path / "store")
    write_graph_tables(tiny_edges, tiny_nodes, store, partitions=2)

    # writer A: set surface=gravel on feature 0, add a new feature X
    delta_a = {
        "type": "FeatureCollection",
        "features": [
            _feature(TINY_COORDS[0], {"surface": "gravel"}),
            _feature(
                [[-122.320, 47.661], [-122.321, 47.662]], {"surface": "newA"}
            ),
        ],
    }
    # writer B (later): overwrite feature 0's surface, delete X
    delta_b = {
        "type": "FeatureCollection",
        "features": [
            _feature(TINY_COORDS[0], {"surface": "asphalt"}),
            _feature(
                [[-122.320, 47.661], [-122.321, 47.662]], {"_deleted": True}
            ),
        ],
    }
    pa, pb = tmp_path / "a.geojson", tmp_path / "b.geojson"
    pa.write_text(json.dumps(delta_a))
    pb.write_text(json.dumps(delta_b))

    sa = apply_geojson_delta(spark, store, str(pa))
    assert sa["upserted"] == 4 and sa["deleted"] == 0 and sa["edges"] == 10

    sb = apply_geojson_delta(spark, store, str(pb))
    # B saw A's publish: its upsert replaced A's surface value in
    # place (edge count unchanged by the upsert) and its delete
    # removed the X edges A added
    assert sb["upserted"] == 2 and sb["deleted"] == 2 and sb["edges"] == 8

    edges, nodes = read_graph_tables(spark, store)
    surf = {
        r["surface"]
        for r in edges.filter(F.col("surface").isNotNull()).collect()
    }
    assert surf == {"asphalt"}  # B's value won; A's gravel/newA gone
    assert edges.count() == 8
    ids = {r["_n"] for r in nodes.collect()}
    assert "-122.32, 47.661" not in ids  # X's orphaned endpoints pruned


def test_apply_geojson_delta_versioned_conflict(
    spark, tiny_edges, tiny_nodes, tmp_path
):
    """Versioned incremental maintenance: the merge publishes against
    the version it read; after an interleaved publish the stale merge
    raises ConcurrentWriteError instead of silently erasing it."""
    import pytest

    from entwiner_spark.exceptions import ConcurrentWriteError
    from entwiner_spark.sources.delta_apply import (
        apply_geojson_delta_versioned,
    )
    from entwiner_spark.sources.parquet_store import (
        read_graph_tables_versioned,
        write_graph_tables_versioned,
    )

    store = str(tmp_path / "vstore")
    write_graph_tables_versioned(tiny_edges, tiny_nodes, store, partitions=2)

    delta = {
        "type": "FeatureCollection",
        "features": [_feature(TINY_COORDS[0], {"surface": "gravel"})],
    }
    p = tmp_path / "d.geojson"
    p.write_text(json.dumps(delta))
    stats = apply_geojson_delta_versioned(spark, store, str(p))
    assert stats["version"] == 2 and stats["upserted"] == 2
    edges, _, v = read_graph_tables_versioned(spark, store)
    assert v == 2 and edges.filter(F.col("surface") == "gravel").count() == 2

    # interleave: another writer publishes v3 while our next merge is
    # notionally in flight — simulate by publishing from v2, then
    # attempting a versioned apply whose read raced (we re-point the
    # store AFTER the function read it by calling with a store that
    # advances mid-call is not injectable here, so assert the
    # primitive: a publish from a stale base refuses)
    write_graph_tables_versioned(
        edges, tiny_nodes, store, base_version=2, partitions=2
    )  # v3
    with pytest.raises(ConcurrentWriteError):
        write_graph_tables_versioned(
            tiny_edges, tiny_nodes, store, base_version=2, partitions=2
        )
    # the versioned apply still works against the current head
    stats2 = apply_geojson_delta_versioned(spark, store, str(p))
    assert stats2["version"] == 4
