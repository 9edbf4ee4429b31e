"""Streaming text-quality scoring: LM scores for documents ARRIVING
as a stream, against a frozen reference LM.

The batch operator (functions.text.unigram_logprob) fits the unigram
LM on the same corpus it scores.  The streaming deployment shape is
different: the LM is FROZEN from a reference corpus (yesterday's
crawl, the curated slice), and arriving documents score against it —
a stream-static join, no stream-side aggregation state at all.

``reference_unigram_lm`` packs the LM into a single-row static
DataFrame holding a ``map<word, logprob>``; ``stream_unigram_score``
attaches that row via a stream-static equi-join on a constant key and
folds each document's word array through the map per row.  Stateless
per-row scoring means append output mode, no watermark, and
stream == batch equality wherever the words exist in the reference
vocabulary (asserted in tests).  The one-row map is the same
"vocabulary ≪ corpus, broadcast it" contract the batch operator's
broadcast join already assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entwiner_spark.functions.text import words


def reference_unigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Freeze a unigram LM from a BATCH reference corpus: one row,
    ``(_one, _lm: map<word, ln(wc/total)>)`` — the static side of the
    stream-static score join."""
    w = docs.select(F.explode(words(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    freq = w.groupBy("word").agg(F.count(F.lit(1)).alias("_wc"))
    tot = freq.agg(F.sum("_wc").alias("_tot"))
    return (
        freq.crossJoin(F.broadcast(tot))
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("word"),
                        F.log(F.col("_wc").cast("double") / F.col("_tot")),
                    )
                )
            ).alias("_lm")
        )
        .withColumn("_one", F.lit(1))
    )


def stream_unigram_score(
    docs: DataFrame,
    lm_row: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Score a document stream against a frozen reference LM: per doc
    the mean log probability of its words (the t12 quality signal),
    with out-of-vocabulary words scored at ``oov_logprob``.

    Works identically on a batch DataFrame (the stream==batch test
    runs both through this same function).
    """
    # stage the filtered token array as a column: referenced 4x below
    # (aggregate input + three size()s), and a column reference costs
    # nothing where the raw expression would re-run split+filter each
    # time (the let_bound/staging discipline, functions/expr.py)
    ws = F.col("_ws")
    raw_score = F.aggregate(
        ws,
        F.lit(0.0),
        lambda acc, x: acc
        + F.coalesce(
            F.element_at(F.col("_lm"), x), F.lit(float(oov_logprob))
        ),
    ) / F.size(ws)
    # empty/whitespace-only docs have no words: score them 0.0
    # explicitly instead of the NULL a 0.0/0 division produces (the
    # batch t12 twin emits no row at all for these; here every stream
    # row must produce a defined output)
    score = F.when(F.size(ws) > 0, raw_score).otherwise(F.lit(0.0))
    return (
        docs.withColumn(
            "_ws", F.filter(words(F.col(text_col)), lambda x: x != F.lit(""))
        )
        .withColumn("_one", F.lit(1))
        .join(lm_row, "_one")
        .select(
            F.col(id_col),
            F.size(ws).cast("long").alias("n_words"),
            F.round(score, 6).alias("avg_logprob"),
        )
    )
