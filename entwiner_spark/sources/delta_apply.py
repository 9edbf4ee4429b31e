"""Incremental graph maintenance: apply a GeoJSON delta to a store.

The reference rebuilds the whole GeoPackage per ingest (build.py) and
its keyed-update path is partial (SURVEY §2.9).  This module gives the
engine a true incremental lifecycle over the parquet store:

- features in the delta file upsert their (fwd, rev) edges
  (last-write-wins on (_u, _v) — REPLACE INTO semantics);
- features carrying a truthy ``_deleted`` property delete BOTH
  directions of their edge instead;
- the node table is re-derived from the merged edge set (S6), so
  orphaned endpoints disappear with their last edge.

One read + two keyed joins + one atomic publish; no driver-side row
loops, so the same plan at 100 TB just shuffles more partitions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from entwiner_spark.operators.mutations import delete_keys, upsert
from entwiner_spark.schemas import DEFAULT_PRECISION
from entwiner_spark.sources.geojson import edges_from_geojson, nodes_from_edges
from entwiner_spark.sources.parquet_store import (
    read_graph_tables,
    write_graph_tables,
)

DELETE_FLAG = "_deleted"


def _merge_delta(
    spark: SparkSession,
    current,
    delta_paths: str | list[str],
    precision: int,
    changes_sign: tuple[str, ...],
    lines: bool,
):
    """Shared merge core: returns ``(merged_edges_or_None, counts)``;
    merged is None for an empty (no-op) delta."""
    from entwiner_spark.exceptions import UnrecognizedFileFormat

    try:
        delta = edges_from_geojson(
            spark,
            delta_paths,
            precision=precision,
            changes_sign=changes_sign,
            with_length="_length" in current.columns,
            lines=lines,
        )
    except UnrecognizedFileFormat:
        # an empty delta is a no-op, not an error
        return None, {"upserted": 0, "deleted": 0}

    # delta fids restart at 1 — shift past the store's max so the
    # engine fid PK stays unique across increments; materialize once
    # (counts + upsert + node re-derive would otherwise re-run the
    # whole ingest plan per action)
    max_fid = current.agg(F.max("fid")).collect()[0][0] or 0
    delta = delta.withColumn("fid", F.col("fid") + F.lit(max_fid))
    delta = delta.localCheckpoint(eager=True)

    if DELETE_FLAG in delta.columns:
        # try_cast: a malformed _deleted value means "not deleted"
        # rather than an ANSI cast failure aborting the merge
        flag = F.coalesce(
            F.col(DELETE_FLAG).try_cast("boolean"), F.lit(False)
        )
        doomed = delta.filter(flag).select("_u", "_v")
        incoming = delta.filter(~flag).drop(DELETE_FLAG)
    else:
        doomed = None
        incoming = delta

    n_upsert = incoming.count()
    merged = upsert(current, incoming, ["_u", "_v"])
    n_delete = 0
    if doomed is not None:
        n_delete = doomed.count()
        merged = delete_keys(merged, doomed, ["_u", "_v"])

    # avoid lazy self-read-while-overwriting: materialize before publish
    merged = merged.localCheckpoint(eager=True)
    return merged, {"upserted": n_upsert, "deleted": n_delete}


def apply_geojson_delta(
    spark: SparkSession,
    store_dir: str,
    delta_paths: str | list[str],
    precision: int = DEFAULT_PRECISION,
    changes_sign: tuple[str, ...] = (),
    lines: bool = False,
) -> dict[str, int]:
    """Merge a GeoJSON delta into an existing graph store.

    Returns counts: {"upserted": n, "deleted": n, "edges": total}.
    """
    current, _ = read_graph_tables(spark, store_dir)
    merged, counts = _merge_delta(
        spark, current, delta_paths, precision, changes_sign, lines
    )
    if merged is None:
        return {**counts, "edges": current.count()}
    nodes = nodes_from_edges(merged, precision=precision)
    write_graph_tables(merged, nodes, store_dir)
    total = read_graph_tables(spark, store_dir)[0].count()
    return {**counts, "edges": total}


def apply_geojson_delta_versioned(
    spark: SparkSession,
    store_dir: str,
    delta_paths: str | list[str],
    precision: int = DEFAULT_PRECISION,
    changes_sign: tuple[str, ...] = (),
    lines: bool = False,
) -> dict[str, int]:
    """Conflict-SAFE incremental maintenance over the versioned store
    (parquet_store.write_graph_tables_versioned): the merge is based
    on the version it read, so a concurrent writer that published in
    between raises ConcurrentWriteError instead of being silently
    erased — re-call to re-read and re-apply.  Same counts dict as
    :func:`apply_geojson_delta`, plus ``"version"``.
    """
    from entwiner_spark.sources.parquet_store import (
        read_graph_tables_versioned,
        write_graph_tables_versioned,
    )

    current, _, base_v = read_graph_tables_versioned(spark, store_dir)
    merged, counts = _merge_delta(
        spark, current, delta_paths, precision, changes_sign, lines
    )
    if merged is None:
        return {**counts, "edges": current.count(), "version": base_v}
    nodes = nodes_from_edges(merged, precision=precision)
    new_v = write_graph_tables_versioned(
        merged, nodes, store_dir, base_version=base_v
    )
    # pin the count read to the version just published — re-reading the
    # latest pointer could report a concurrent writer's later version
    # against our own version number (ADVICE r6)
    total = read_graph_tables_versioned(spark, store_dir, version=new_v)[
        0
    ].count()
    return {**counts, "edges": total, "version": new_v}
