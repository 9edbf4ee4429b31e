"""Streaming graph ingest: file-source stream -> upsert edge store.

Superset of the reference's incremental batched ingest (S5: 1000-row
transactions, /root/reference/entwiner/constants.py:5): a Structured
Streaming file source watches a directory for new GeoJSON-derived edge
batches and ``foreachBatch`` upserts them into the parquet edge store
with last-write-wins semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from entwiner_spark.operators.mutations import upsert
from entwiner_spark.sources.parquet_store import write_graph_tables


def stream_edges_to_parquet(
    spark: SparkSession,
    watch_dir: str,
    store_dir: str,
    schema,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
) -> StreamingQuery:
    """Watch ``watch_dir`` for JSON edge batches; merge each microbatch
    into ``store_dir``/edges.parquet keyed on (_u, _v)."""
    stream = spark.readStream.schema(schema).json(watch_dir)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        sess = batch.sparkSession
        # a microbatch can carry several rows for one edge; keep the
        # LAST version per key deterministically (highest fid if the
        # schema carries one, matching the batch ingest's dedup) so
        # last-write-wins is well-defined even within one microbatch
        order_col = "fid" if "fid" in batch.columns else None
        if order_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("_u", "_v").orderBy(F.col(order_col).desc())
            batch = (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            batch = batch.dropDuplicates(["_u", "_v"])
        try:
            current = sess.read.parquet(f"{store_dir}/edges.parquet")
            current.schema  # force path resolution now
        except AnalysisException as e:
            # only path-not-found means "first batch"; any other read
            # failure must abort rather than silently replace the store
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            current = None
        merged = (
            upsert(current, batch, ["_u", "_v"]) if current is not None else batch
        )
        write_graph_tables(merged, None, store_dir)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
