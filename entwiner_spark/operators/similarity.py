"""Similarity search over embedding columns (SURVEY.md §2.14).

Brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH bucketing as the scale path (bucket join replaces
the full cross product; recall tunable by #planes / multi-probe).

Dot products are generated as explicit fixed-dimension expression
chains (element_at(e,1)*q1 + ... left-associated) rather than
F.aggregate folds: the same chain is emitted for the DuckDB oracle, so
both engines add in the same order and produce bit-identical doubles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_literal(vec: Column, q: list[float]) -> Column:
    """<vec, q> with q inlined as literals; left-associated sum."""
    terms = [F.element_at(vec, i + 1) * F.lit(float(q[i])) for i in range(len(q))]
    return reduce(lambda a, b: a + b, terms)


def dot_cols(a: Column, b: Column, dim: int) -> Column:
    terms = [F.element_at(a, i) * F.element_at(b, i) for i in range(1, dim + 1)]
    return reduce(lambda x, y: x + y, terms)


def norm(vec: Column, dim: int) -> Column:
    return F.sqrt(dot_cols(vec, vec, dim))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    orderBy+limit compiles to TakeOrderedAndProject (distributed
    per-partition heaps + driver merge) — no global sort materializes.
    """
    import math

    dim = len(query)
    qn = math.sqrt(sum(x * x for x in query))
    v = _as_double(F.col(vec_col))
    cos = dot_literal(v, query) / (norm(v, dim) * F.lit(qn))
    return (
        emb.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every query row, its k nearest corpus rows by cosine.

    Broadcast the (small) query side; rank per query with a window.
    At 100 TB the corpus side stays partitioned and each partition
    keeps per-query heaps — the window is partitioned by query id, so
    no single-partition global sort exists.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("cv")
    )
    cos = dot_cols(F.col("qv"), F.col("cv"), dim) / (
        norm(F.col("qv"), dim) * norm(F.col("cv"), dim)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def hyperplane(p: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane p — shared with oracles."""
    return [((p * 31 + i * 17) % 7) - 3 for i in range(dim)]


def lsh_buckets(
    emb: DataFrame,
    dim: int,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern over ``planes``.

    Candidate generation for near-neighbor search: equal buckets ->
    candidates; a bucket-key groupBy replaces the O(n^2) cross join.
    """
    v = _as_double(F.col(vec_col))
    bucket = reduce(
        lambda acc, p: acc
        + F.when(
            dot_literal(v, [float(x) for x in hyperplane(p, dim)]) > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
        range(planes),
        F.lit(0).cast("long"),
    )
    return emb.select(F.col(id_col), bucket.alias("bucket"))
