"""The graph package on disk: a directory of parquet tables (S5/S7/S8).

The reference's GeoPackage file (one SQLite DB holding edges+nodes,
/root/reference/entwiner/geopackage/__init__.py) maps to a directory:

    <store>/edges.parquet/   partitioned, sorted within partitions on _u
    <store>/nodes.parquet/

Write-time layout IS the index (X1/X3 analogue): repartition on _u +
sortWithinPartitions gives parquet min/max stats that prune adjacency
lookups; bbox columns prune spatial queries.  Publishing goes through a
temp directory + atomic rename, mirroring the reference's
build-then-move lifecycle (/root/reference/entwiner/build.py:34-47).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_graph_tables(
    edges: DataFrame,
    nodes: DataFrame | None,
    store_dir: str,
    partitions: int | None = None,
    layer_partitioned: bool = False,
) -> None:
    """Atomic publish of the (edges, nodes) tables to ``store_dir``.

    Writes to a sibling temp dir then renames — readers never observe a
    half-written store (the reference achieves this with shutil.move of
    the temp gpkg, build.py:44-47).

    ``layer_partitioned=True`` additionally directory-partitions edges
    by ``_layer`` (the per-source-file tag from ingest): a multi-layer
    graph store where layer-filtered reads prune whole directories
    before any row is scanned, and each layer file keeps the sorted-_u
    adjacency layout.  Use when layers are few and queries are often
    layer-scoped (the reference's merged-into-unweaver multi-profile
    use case); the flat layout remains the default.
    """
    if "://" in store_dir:
        # the rename-based publish is local-filesystem only; object
        # stores need a transactional table format (Delta/Iceberg) or
        # Hadoop FileSystem rename semantics — explicit error beats a
        # mangled local path (TODO.md)
        raise ValueError(
            f"{store_dir}: parquet_store publishes via local-FS rename; "
            "use a local path (cloud stores need a transactional format)"
        )
    parent = os.path.dirname(os.path.abspath(store_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="_graphstore_tmp_", dir=parent)
    try:
        n = partitions or int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        if layer_partitioned:
            if "_layer" not in edges.columns:
                raise ValueError(
                    "layer_partitioned=True requires a _layer column "
                    "(added by the GeoJSON ingest)"
                )
            # tasks hash on _u; each writes one sorted run per layer it
            # holds -> n files per layer, every file sorted by _u so
            # parquet min/max stats still prune adjacency lookups
            (
                edges.repartition(n, "_u")
                .sortWithinPartitions("_layer", "_u")
                .write.mode("overwrite")
                .partitionBy("_layer")
                .parquet(f"{tmp}/edges.parquet")
            )
        else:
            (
                edges.repartition(n, "_u")
                .sortWithinPartitions("_u")
                .write.mode("overwrite")
                .parquet(f"{tmp}/edges.parquet")
            )
        if nodes is not None:
            nodes.repartition(max(1, n // 4), "_n").sortWithinPartitions(
                "_n"
            ).write.mode("overwrite").parquet(f"{tmp}/nodes.parquet")
        if os.path.exists(store_dir):
            shutil.rmtree(store_dir)
        os.rename(tmp, store_dir)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def read_graph_tables(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame, DataFrame | None]:
    """Load (edges, nodes) back; nodes may be absent for edge-only
    stores (streaming ingest)."""
    edges = spark.read.parquet(f"{store_dir}/edges.parquet")
    nodes_path = f"{store_dir}/nodes.parquet"
    nodes = spark.read.parquet(nodes_path) if os.path.exists(nodes_path) else None
    return edges, nodes


def copy_store(spark: SparkSession, src: str, dst: str) -> None:
    """Database copy (S8: GeoPackage.copy) — re-write through Spark so
    the destination gets fresh stats/layout."""
    edges, nodes = read_graph_tables(spark, src)
    write_graph_tables(edges, nodes, dst)
