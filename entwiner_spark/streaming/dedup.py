"""Streaming twins of the dedup signature / LSH family (§2.12
superset over the reference, which has no streaming surface).

The signature operators (minhash/simhash) are stateless per-row
expression work, so the BATCH operators run unchanged on streams —
tests assert bit-identical stream==batch signatures.  The candidate-
pair step is genuinely stateful: a document must pair with EARLIER
documents that share a band key.  ``stream_lsh_pairs`` expresses that
as a watermarked stream-stream self-join on (band, key), the
Structured-Streaming-native form: Spark's join state store retains
each band bucket only until the watermark passes, so state size is
bounded by (arrival rate x watermark window), independent of corpus
size — the property a continuous 100 TB ingest needs.  A cross-band
duplicate pair (two docs agreeing on several bands) is collapsed by
``dropDuplicatesWithinWatermark``, the streaming analogue of the batch
path's ``distinct()``.

Scale note: the join state key is the narrow (band, key) bucket and
rows are ~40-byte (id, band, key, ts) tuples — the same
only-the-projection-shuffles discipline as the batch path
(operators/dedup.py lsh_candidate_pairs).  Hot-band salting is a
batch-side escalation; under streaming the watermark window already
caps per-bucket membership, so salting is deliberately not offered
here until a real workload shows a hot bucket within one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entwiner_spark.operators.dedup import band_keys, minhash_signatures


def stream_lsh_pairs(
    docs: DataFrame,
    time_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup candidate pairs over a document STREAM.

    Emits (id_a, id_b, ts) with id_a < id_b for every pair of documents
    that share >= 1 MinHash band key and arrive within ``watermark`` of
    each other; each pair exactly once (append output mode).  Band keys
    are derived with the same expressions as the batch
    ``lsh_candidate_pairs``, so a pair the stream emits is exactly a
    pair the batch job would find on the same data.

    ``ts`` on the output row is the lower-id side's arrival time (kept
    verbatim so it remains the event-time column for downstream
    watermarked operators).
    """
    sig = minhash_signatures(
        docs,
        text_col=text_col,
        id_col=id_col,
        k=k,
        shingle_k=shingle_k,
        hash_fn=hash_fn,
        keep=(time_col,),
    )
    banded = sig.select(
        F.col(id_col),
        F.col(time_col),
        F.posexplode(F.array(*band_keys(k, bands))).alias("band", "key"),
    ).withWatermark(time_col, watermark)

    a, b = banded.alias("a"), banded.alias("b")
    delta = F.expr(f"INTERVAL {watermark}")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # time-range bound on BOTH sides: lets Spark evict join state
        # as the watermark advances instead of keeping buckets forever
        & (F.col(f"b.{time_col}") >= F.col(f"a.{time_col}") - delta)
        & (F.col(f"b.{time_col}") <= F.col(f"a.{time_col}") + delta),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        # project the a-side event-time column AS-IS: a derived column
        # (e.g. greatest(a.ts, b.ts)) would lose the event-time marker
        # and break the downstream within-watermark dedup
        F.col(f"a.{time_col}").alias(time_col),
    )
    # collapse multi-band agreement to one row per pair (batch path's
    # distinct()); the upstream watermark propagates through the join,
    # so the dedup operator's state is watermark-bounded too
    # (re-declaring the watermark here is disallowed in Spark 4)
    return pairs.dropDuplicatesWithinWatermark(["id_a", "id_b"])
