"""Context-window packing: group documents into token-budget chunks.

LLM pretraining concatenates documents into fixed-size context windows;
the packing step assigns each document a chunk id such that every
chunk's token total stays within the budget.  Two operators:

- ``chunk_by_cumsum`` — pure-Catalyst streaming chunker: documents are
  laid out in a deterministic order per stream and a chunk boundary
  falls every `budget` tokens of the running total (a document whose
  tokens straddle a boundary starts in the earlier chunk, the
  sequence-packing convention where windows are filled back-to-back
  and reader-side splitting handles the straddle).  One window
  function, one shuffle on the stream key, exact SQL twin
  (catalog t7).

- ``pack_greedy`` — exact greedy sequential packing (a new chunk opens
  when the next document would overflow the budget; oversized
  documents get a chunk of their own).  Inherently sequential per
  stream, so it runs as applyInPandas per stream key: each stream is
  one pandas group, streams pack in parallel across executors.  At
  100 TB the stream key (language, source shard, ...) gives thousands
  of independent streams, so parallelism is not budget-bound.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def chunk_by_cumsum(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Streaming chunk assignment: ``chunk_id = floor(start_offset /
    budget)`` where start_offset is the running token total before the
    document.  Adds ``cum_tokens`` and ``chunk_id``."""
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("bigint")).over(w)
    return df.withColumn("cum_tokens", cum).withColumn(
        "chunk_id",
        F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(float(budget))),
    )


def pack_greedy(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Exact greedy packing per stream (next-fit): documents visit in
    ``order_col`` order; a document that would push the open chunk
    past ``budget`` closes it and opens the next.  Adds ``chunk_id``.

    Chunk ids are local to their stream — (stream, chunk_id) is the
    global chunk key.
    """
    # copy the fields: df.schema is cached on the DataFrame and
    # StructType.add mutates in place, which would corrupt df.columns
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("chunk_id", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        ids = []
        chunk, used = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                chunk += 1
                used = 0
            used += t
            ids.append(chunk)
        pdf["chunk_id"] = ids
        return pdf

    return df.groupBy(stream_col).applyInPandas(pack, schema=out_schema)
