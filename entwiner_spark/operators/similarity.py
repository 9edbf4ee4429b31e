"""Similarity search over embedding columns (SURVEY.md §2.14).

Brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH bucketing as the scale path (bucket join replaces
the full cross product; recall tunable by #planes / multi-probe).

Vector math is zip_with + aggregate left folds seeded at 0.0 — the
addition order equals the oracle's left-associated term chains
(0.0 + t1 == t1), so both engines produce bit-identical doubles.
(Explicit element_at chains were ~100x slower: past the codegen size
limit Catalyst falls back to per-op interpretation.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_literal(vec: Column, q: list[float]) -> Column:
    """<vec, q> with q inlined as an array literal.

    zip_with + aggregate (left fold from 0.0, so the addition order is
    exactly the oracle's left-associated chain — 0.0 + t1 == t1).
    Generated element_at chains are ~100x slower here: they overflow
    the codegen size limit and fall back to per-op interpretation.
    """
    lit = F.lit([float(x) for x in q])
    prods = F.zip_with(vec, lit, lambda x, qi: x.cast("double") * qi)
    return F.aggregate(prods, F.lit(0.0), lambda a, b: a + b)


def dot_literal_sql(vec_sql: str, q: list[float]) -> str:
    """SQL-string twin of ``dot_literal`` — parses to the identical
    Catalyst tree (zip_with + left-fold aggregate seeded at 0.0), so
    values stay bit-for-bit equal, but the whole expression crosses
    py4j as ONE string instead of hundreds of Column-API round trips
    (r16 §1.2 per-task→driver work: plan construction was the measured
    cost for the plane/bit fan-out queries, ~10x cheaper as SQL)."""
    arr = ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in q)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        "(x, qi) -> CAST(x AS DOUBLE) * qi), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )


def dot_cols(a: Column, b: Column, dim: int) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda x, y: x + y)


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
    # one SQL string instead of ~4x dim Column-API calls (see
    # dot_literal_sql); parsed tree and values identical
    v = f"`{vec_col}`"
    self_dot = (
        f"aggregate(zip_with({v}, {v}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (x, y) -> x + y)"
    )
    cos = (
        f"{dot_literal_sql(v, query)} / "
        f"(sqrt({self_dot}) * CAST({qn!r} AS DOUBLE))"
    )
    return (
        emb.select(F.col(id_col), F.expr(f"round({cos}, 6)").alias("cosine"))
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
    # norms are per-row: project them below the join, or each of the
    # |Q| x |corpus| scored pairs re-folds both 64-dim sums (PLANS.md
    # expression-form rule; bit-identical values either way)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("_cn"),
    )
    cos = dot_cols(F.col("qv"), F.col("cv"), dim) / (
        F.col("_qn") * F.col("_cn")
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
    # built as ONE SQL string (see dot_literal_sql): the planes x dim
    # term fan-out made Column-API construction the dominant cost of
    # the whole query (s4 bench: 0.46 s build vs 0.13 s execute);
    # the parsed tree and therefore every value is identical
    terms = " + ".join(
        f"(CASE WHEN {dot_literal_sql(f'`{vec_col}`', [float(x) for x in hyperplane(p, dim)])} > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p in range(planes)
    )
    bucket = F.expr(f"CAST(0 AS BIGINT) + {terms}")
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def lsh_neardup_pairs(
    emb: DataFrame,
    dim: int,
    planes: int = 4,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: str = "join",
) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH bucket join + exact
    cosine refine.

    The scale path for d6's all-pairs verify: vectors sharing a
    random-hyperplane sign bucket are candidates (equi-join on the
    bucket key — the same narrow-self-join discipline as MinHash-LSH,
    AQE skew-split / salting applicable), and only candidates pay the
    exact cosine.  Recall is tunable: fewer planes -> bigger buckets ->
    higher recall and more refine work.  Deterministic hyperplanes are
    shared with the SQL oracles, so the full pipeline (bucketing AND
    refine) is value-checkable cross-engine.

    ``refine`` picks the verify strategy (r9 stress profile,
    PLANS.md): ``"join"`` — the bucket self-equi-join with a
    per-pair Catalyst cosine; bit-identical add order with the SQL
    oracles, but every candidate pair materializes BOTH vectors
    through the join (~1 KB/pair at dim 64: the measured cost is the
    array copying, not the arithmetic — 98.5M candidates moved
    ~100 GB in 40 s at stress scale while the dot itself benched at
    0.25 µs/pair).  ``"matmul"`` — per-bucket blocked Gram matrix
    via Arrow ``applyInPandas``: each vector crosses the Python
    boundary ONCE (~50 MB total at stress scale, not 100 GB) and the
    n_b^2 refine runs as BLAS; float64 summation order differs from
    the left-fold oracle only in the last ulp, so use it for scale
    runs and keep ``"join"`` where bit-parity matters (both paths
    emit the same (id_a, id_b) set — asserted in tests and at stress
    scale).

    Zero-norm and NULL embeddings are filtered out before EITHER
    refine branch: a zero vector has no cosine direction (the join
    path's 0/0 produced NaN, which Spark orders above every double so
    ``>= threshold`` was vacuously true, while the matmul path's numpy
    NaN compare dropped it — and a NULL vector crashed ``np.stack``).
    Dropping them makes the two branches agree on degenerate input
    (no shipped corpus contains such rows, so oracle output is
    unchanged).
    """
    b = lsh_buckets(emb, dim, planes=planes, id_col=id_col, vec_col=vec_col)
    # norms are per-VECTOR, so fold them once before the join — inside
    # the join condition each candidate PAIR would re-fold both sides
    # (~3x the refine compute at stress scale); the expression is
    # unchanged, so values stay bit-identical for the oracles
    withb = (
        emb.select(F.col(id_col), F.col(vec_col))
        .join(b, id_col)
        .withColumn("_nrm", norm(F.col(vec_col), dim))
        # degenerate-vector guard (see docstring): NULL vec -> NULL
        # norm, zero vec -> 0.0; `> 0` drops both before either branch
        .filter(F.col("_nrm") > 0)
    )
    if refine == "matmul":
        return _matmul_refine(withb, threshold, id_col, vec_col)
    if refine != "join":
        raise ValueError(f"refine must be 'join' or 'matmul', got {refine!r}")
    a = withb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("_na"),
        F.col("bucket"),
    )
    c = withb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("_nb"),
        F.col("bucket"),
    )
    cos = dot_cols(F.col("va"), F.col("vb"), dim) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        a.join(c, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _matmul_refine(
    withb: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """Per-bucket cosine refine as a blocked Gram matrix (numpy BLAS)
    over ``applyInPandas`` — the candidate PAIRS never materialize as
    rows; each bucket moves its vectors across the Arrow boundary once
    and emits only the >= threshold pairs.  Row blocks of 1024 cap the
    in-flight Gram slab at block x n_b doubles, so a salted-down or
    naturally hot bucket of 100k vectors peaks at ~800 MB, not n_b^2.
    """
    import numpy as np
    import pandas as pd

    id_type = withb.schema[id_col].dataType.simpleString()
    schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"id_a": ids[:0], "id_b": ids[:0], "cosine": np.array([], "f8")}
            )
        order = np.argsort(ids)
        ids = ids[order]
        V = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        nrm = pdf["_nrm"].to_numpy()[order]
        out_a, out_b, out_c = [], [], []
        for lo in range(0, n, 1024):
            hi = min(lo + 1024, n)
            # rows lo:hi vs STRICTLY LATER columns (id_a < id_b via
            # the sorted order); the triangular mask trims the block
            G = (V[lo:hi] @ V[lo + 1:].T) / np.outer(nrm[lo:hi], nrm[lo + 1:])
            # HALF_UP like the join path's F.round (np.round is
            # half-to-even and would drop a pair whose cosine lands
            # exactly on a .5 tie at the 6th decimal)
            G6 = np.sign(G) * np.floor(np.abs(G) * 1e6 + 0.5) / 1e6
            r, c = np.nonzero(G6 >= threshold)
            keep = c >= r  # column index c maps to global lo+1+c
            r, c = r[keep], c[keep]
            out_a.append(ids[lo + r])
            out_b.append(ids[lo + 1 + c])
            out_c.append(G6[r, c])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return withb.groupBy("bucket").applyInPandas(fn, schema)


def l2sq_literal(vec: Column, c: list[float]) -> Column:
    """Squared L2 distance to a literal centroid; left-assoc chain."""
    lit = F.lit([float(x) for x in c])
    sq = F.zip_with(
        vec, lit, lambda x, ci: (x.cast("double") - ci) * (x.cast("double") - ci)
    )
    return F.aggregate(sq, F.lit(0.0), lambda a, b: a + b)


def l2sq_literal_sql(vec_sql: str, c: list[float]) -> str:
    """SQL-string twin of ``l2sq_literal`` (same parsed tree, same
    values) — see dot_literal_sql for why: the K x dim distance-chain
    fan-out made Column-API plan construction the dominant driver cost
    of the IVF/PQ family."""
    arr = ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in c)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        "(x, ci) -> (CAST(x AS DOUBLE) - ci) * (CAST(x AS DOUBLE) - ci)), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: nearest-centroid assignment.

    The centroid list is tiny and inlined as literals (broadcast by
    construction); one narrow projection per vector — the partition
    step of IVF-flat ANN.  Ties resolve to the lowest centroid index
    (strict < comparison), mirrored exactly by the SQL oracle.
    """
    vs = f"`{vec_col}`"
    # materialize the K distances as columns, then argmin via least +
    # first-equal CASE.  An iterative when(dk < best_d, ...) fold would
    # nest best_d inside each condition — a 3^K expression-tree blowup
    # that took Catalyst minutes at K=8.
    base = emb.select(
        F.col(id_col),
        *[
            F.expr(l2sq_literal_sql(vs, c)).alias(f"_d{k}")
            for k, c in enumerate(centroids)
        ],
    )
    # barrier: without it CollapseProject re-inlines every distance
    # chain into least() AND each equality test (~9x duplication),
    # pushing the projection past the codegen size limit into
    # interpreted mode.  The shuffled table is just (id, K doubles).
    base = base.repartition(F.col(id_col))
    m = F.least(*[F.col(f"_d{k}") for k in range(len(centroids))])
    expr = None
    for k in range(len(centroids)):
        cond = F.col(f"_d{k}") == m
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
    return base.select(F.col(id_col), expr.alias("centroid"))


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, scale, q).

    Storage path for embedding columns at 100 TB — 4x smaller than
    float32, 8x smaller than float64; dequantize as ``q * scale``.
    ``scale = max|x| / 127`` per vector (zero vectors get scale 1 so
    q stays all-zero instead of NaN).  Pure array expressions, one
    narrow projection, no shuffle.
    """
    v = _as_double(F.col(vec_col))
    raw = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    scale = F.when(raw == 0.0, F.lit(1.0)).otherwise(raw)
    # materialize scale BEFORE the quantizing transform: referencing
    # the scale expression inside the lambda re-evaluates the
    # array_max per element — O(d^2) per row (the unbound-expression
    # pitfall from PLANS.md).  Quantizing off the ROUNDED scale also
    # makes q reproducible from the stored (scale, q) pair alone.
    staged = emb.select(
        F.col(id_col), v.alias("_v"), F.round(scale, 9).alias("scale")
    )
    return staged.select(
        F.col(id_col),
        F.col("scale"),
        F.transform(
            F.col("_v"), lambda x: F.round(x / F.col("scale")).cast("int")
        ).alias("q"),
    )


def dequantize_int8(
    qdf: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Inverse of quantize_int8: (id, embedding) with elements q*scale."""
    return qdf.select(
        F.col(id_col),
        F.transform(F.col("q"), lambda x: x.cast("double") * F.col("scale")).alias(
            "embedding"
        ),
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: Lloyd's k-means as DataFrame ops.

    Replaces the fixed deterministic centroids with data-fitted ones —
    the quality knob for ivf_assign/ivf_topk recall.  Per iteration:

    - ASSIGN: the same K-distance-columns + least/first-equal argmin
      expression ivf_assign uses (codegen-safe at K=16+);
    - UPDATE: per-cluster mean as ``dim`` avg() aggregates in ONE
      groupBy — no explode, map-side partial aggregation, and the only
      driver-side data is the (k x dim) centroid matrix per iteration,
      independent of corpus size.  100 TB-safe by construction.

    Determinism: seeds are the k MINIMUM-md5(id) vectors — a
    deterministic hash-rank sample Catalyst plans as
    TakeOrderedAndProject (per-partition top-k, k rows to the driver;
    the r12-verdict fix for the old unpartitioned ``Window.orderBy``
    seeding, which funneled the whole training input through ONE task
    at scale) — and centroids are rounded to ``round_dp`` after every
    update, so a rerun (or a different partitioning of the same data)
    converges to identical quantized centroids despite float
    summation-order differences in avg().  md5 ranking also spreads
    seeds uniformly over the data regardless of id locality (adjacent
    ids are often near-duplicate vectors; evenly-spaced-by-id seeding
    inherited that bias).  Empty clusters keep their previous
    centroid.
    """
    n = emb.count()
    if n == 0:
        raise ValueError("cannot train k-means on an empty DataFrame")
    k = min(k, n)
    seed_rows = (
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(k)
        .collect()
    )
    cents = [[round(float(x), round_dp) for x in r["_v"]] for r in seed_rows]
    dim = len(cents[0])

    for _ in range(iterations):
        vs = f"`{vec_col}`"
        base = emb.select(
            F.col(id_col),
            _as_double(F.col(vec_col)).alias("_v"),
            *[
                F.expr(l2sq_literal_sql(vs, cents[j])).alias(f"_d{j}")
                for j in range(len(cents))
            ],
        )
        # same projection barrier as ivf_assign: stops CollapseProject
        # from re-inlining every distance chain into the argmin CASE
        base = base.repartition(F.col(id_col))
        m = F.least(*[F.col(f"_d{j}") for j in range(len(cents))])
        expr = None
        for j in range(len(cents)):
            cond = F.col(f"_d{j}") == m
            expr = F.when(cond, F.lit(j)) if expr is None else expr.when(cond, F.lit(j))
        stats = (
            base.select(expr.alias("_c"), "_v")
            .groupBy("_c")
            .agg(
                *[
                    F.round(F.avg(F.element_at("_v", i + 1)), round_dp).alias(f"a{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in stats:
            new[r["_c"]] = [float(r[f"a{i}"]) for i in range(dim)]
        if new == cents:
            break
        cents = new
    return cents


def wcss(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Within-cluster sum of squares for a centroid set — the k-means
    objective, for measuring training quality."""
    dists = [F.expr(l2sq_literal_sql(f"`{vec_col}`", c)) for c in centroids]
    return emb.select(F.least(*dists).alias("_d")).agg(F.sum("_d")).collect()[0][0]


def ivf_probe_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: each vector mapped to its ``probes``
    nearest centroids (one output row per probe).  Recall knob for
    ivf_topk — more probes search more buckets."""
    vs = f"`{vec_col}`"
    base = emb.select(
        F.col(id_col),
        *[
            F.expr(l2sq_literal_sql(vs, c)).alias(f"_d{k}")
            for k, c in enumerate(centroids)
        ],
    )
    base = base.repartition(F.col(id_col))
    pairs = F.array(
        *[
            F.struct(F.col(f"_d{k}").alias("d"), F.lit(k).alias("c"))
            for k in range(len(centroids))
        ]
    )
    ranked = F.slice(F.array_sort(pairs), 1, probes)
    return base.select(
        F.col(id_col), F.explode(ranked).alias("_p")
    ).select(F.col(id_col), F.col("_p.c").alias("centroid"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    dim: int,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """IVF-flat ANN: search the query's ``probes`` nearest coarse
    buckets (probes=1 keeps the single-probe oracle determinism; raise
    it for recall — each extra probe adds one bucket's candidates per
    query).
    """
    if probes > 1:
        qa = ivf_probe_assign(
            queries, centroids, probes, id_col, vec_col
        ).withColumnRenamed(id_col, "qid")
    else:
        qa = ivf_assign(queries, centroids, id_col, vec_col).withColumnRenamed(
            id_col, "qid"
        )
    ca = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed(
        id_col, "nid"
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("_qn"),
    ).join(F.broadcast(qa), "qid")
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("_cn"),
    ).join(ca, "nid")
    # per-row norms below the join (PLANS.md expression-form rule)
    cos = dot_cols(F.col("qv"), F.col("cv"), dim) / (
        F.col("_qn") * F.col("_cn")
    )
    scored = (
        c.join(F.broadcast(q), "centroid")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode (Jégou et al., PQ/IVFPQ): the vector
    split into ``m = len(codebooks)`` contiguous subvectors, each
    assigned to the nearest code of its OWN sub-codebook — m small ints
    replace the full vector, the storage layout that makes
    billion-vector ANN fit in memory (m=4 bytes vs 256 for 64 float32
    dims here).

    ``codebooks[s]`` is the list of code subvectors for subspace s;
    subspace widths come from the code vectors themselves and must sum
    to the embedding dim.  Same discipline as ivf_assign: codes inlined
    as broadcast-by-construction literals, distances materialized as
    columns behind a repartition codegen barrier, strict-< argmin with
    lowest-index ties (mirrored by the SQL oracle).  Output
    ``(id, code_0 … code_{m-1})`` — one narrow row per vector, no
    joins, no shuffle beyond the barrier.
    """
    base_cols = []
    offset = 1
    for s, cb in enumerate(codebooks):
        width = len(cb[0])
        if any(len(code) != width for code in cb):
            raise ValueError(f"codebook {s} has mixed subvector widths")
        sub = f"slice(`{vec_col}`, {offset}, {width})"
        for k, code in enumerate(cb):
            base_cols.append(
                F.expr(l2sq_literal_sql(sub, code)).alias(f"_d{s}_{k}")
            )
        offset += width
    base = emb.select(F.col(id_col), *base_cols).repartition(F.col(id_col))
    outs = []
    for s, cb in enumerate(codebooks):
        m = F.least(*[F.col(f"_d{s}_{k}") for k in range(len(cb))])
        expr = None
        for k in range(len(cb)):
            cond = F.col(f"_d{s}_{k}") == m
            expr = (
                F.when(cond, F.lit(k))
                if expr is None
                else expr.when(cond, F.lit(k))
            )
        outs.append(expr.cast("int").alias(f"code_{s}"))
    return base.select(F.col(id_col), *outs)


def random_projection(
    emb: DataFrame,
    dim: int,
    out_dim: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 5,
) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection: ``out_dim``
    coordinates ``rp_p = <vec, h_p> / sqrt(dim)`` over the same
    deterministic ``hyperplane`` family the LSH operators share with
    their oracles (integer weights in [-3, 3], so every product is
    exact in doubles).

    The dimensionality-reduction step in front of ANN / clustering:
    a 64-dim float vector becomes ``out_dim`` doubles with pairwise
    distances preserved in expectation.  Pure per-row projection —
    zero shuffles, whole-stage codegen, trivially scales (the 100 TB
    plan is a map over the scan).  Output: ``(id, rp0..rp{out_dim-1})``
    rounded to ``round_dp`` so cross-engine comparison is exact.
    """
    vs = f"`{vec_col}`"
    cols = [
        F.round(
            F.expr(dot_literal_sql(vs, [float(x) for x in hyperplane(p, dim)]))
            / F.sqrt(F.lit(float(dim))),
            round_dp,
        ).alias(f"rp{p}")
        for p in range(out_dim)
    ]
    return emb.select(F.col(id_col), *cols)


def standardize(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats_dp: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """Per-dimension z-score normalization (the feature-scaling step
    before k-means / PQ / linear probes): ``z_i = (x_i - mean_i) /
    std_i`` with population std, zero-variance dims mapped to 0.

    Spark-first shape: per-dim mean and mean-of-squares are computed
    as ``2*dim`` aggregate expressions over the raw scan — NO explode
    (the token-stream rule applied to vectors: a 64-dim explode would
    64x the shuffle input for what one wide aggregate row answers).
    The single stats row is broadcast back onto the scan and the
    normalized array is a pure per-row projection — one partial-agg
    pass + one map pass total at any scale.

    Cross-engine determinism: mean/mean-of-squares are rounded to
    ``stats_dp`` BEFORE use (aggregation order differs between
    engines at the last ulp; rounding the stats makes every
    downstream double bit-identical, not just close), and variance is
    written explicitly as ``s - m*m`` so both engines share the
    expression tree.
    """
    # SQL-string twins of the per-dim Column chains (r16 §1.2: the
    # 2*dim aggregates + dim CASE projections cost one py4j round trip
    # per expression NODE through the Column API — plan construction
    # dominated the query; the parsed trees are identical).
    vs = f"`{vec_col}`"

    def x(i: int) -> str:
        return f"CAST({vs}[{i}] AS DOUBLE)"

    stats = emb.agg(
        *[
            F.expr(f"round(avg({x(i)}), {stats_dp}) AS m{i}")
            for i in range(dim)
        ],
        *[
            F.expr(f"round(avg({x(i)} * {x(i)}), {stats_dp}) AS s{i}")
            for i in range(dim)
        ],
    )

    def z(i: int) -> str:
        var = f"s{i} - m{i} * m{i}"
        return (
            f"CASE WHEN {var} <= 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE round(({x(i)} - m{i}) / sqrt({var}), {round_dp}) END"
        )

    return emb.crossJoin(F.broadcast(stats)).selectExpr(
        f"`{id_col}`",
        "array(" + ", ".join(z(i) for i in range(dim)) + ") AS z",
    )


def ivfpq_encode(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ residual encode (Jégou et al.): assign each vector to
    its nearest coarse centroid, then product-quantize the RESIDUAL
    ``x - centroid`` — the index layout that makes billion-vector ANN
    fit in memory (coarse partition id + m sub-codes per vector).

    Three projections with repartition codegen barriers (the
    ivf_assign/pq_encode discipline — CollapseProject would otherwise
    re-inline every distance chain into least() and each equality
    test, blowing the codegen size limit):
      1. K coarse distances as columns;
      2. argmin centroid + residual ARRAY via a per-element CASE over
         the centroid literals;
      3. per-subspace PQ distance chains over residual slices,
         least + first-equal argmin.
    All per-row literal arithmetic — no joins, no shuffle beyond the
    barriers; the SQL oracle replays every chain in the same order.
    Output: ``(id, centroid, code_0..code_{m-1})``.
    """
    n_k = len(centroids)
    dim = len(centroids[0])
    vs = f"`{vec_col}`"
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        *[
            F.expr(l2sq_literal_sql(vs, c)).alias(f"_d{k}")
            for k, c in enumerate(centroids)
        ],
    ).repartition(F.col(id_col))
    # Argmin CASEs and the dim x K residual fan-out as SQL strings
    # (r16 §1.2 — same twin discipline as the distance chains above;
    # parsed trees identical, plan construction collapses).
    m_sql = "least(" + ", ".join(f"_d{k}" for k in range(n_k)) + ")"
    ci_sql = (
        "CASE "
        + " ".join(f"WHEN _d{k} = {m_sql} THEN {k}" for k in range(n_k))
        + " END"
    )

    def cent_case(i: int) -> str:
        return (
            "CASE "
            + " ".join(
                f"WHEN centroid = {k} THEN "
                f"CAST({float(centroids[k][i])!r} AS DOUBLE)"
                for k in range(n_k)
            )
            + " END"
        )

    staged = base.selectExpr(
        f"`{id_col}`", f"CAST(({ci_sql}) AS INT) AS centroid", "_v"
    ).repartition(F.col(id_col))
    resid = staged.selectExpr(
        f"`{id_col}`",
        "centroid",
        "array("
        + ", ".join(
            f"CAST(_v[{i}] AS DOUBLE) - ({cent_case(i)})"
            for i in range(dim)
        )
        + ") AS _r",
    ).repartition(F.col(id_col))
    offset, d_cols = 1, []
    for s, cb in enumerate(codebooks):
        width = len(cb[0])
        sub = f"slice(`_r`, {offset}, {width})"
        for k, code in enumerate(cb):
            d_cols.append(
                F.expr(l2sq_literal_sql(sub, code)).alias(f"_e{s}_{k}")
            )
        offset += width
    pqd = resid.select(F.col(id_col), F.col("centroid"), *d_cols).repartition(
        F.col(id_col)
    )
    outs = []
    for s, cb in enumerate(codebooks):
        ms = "least(" + ", ".join(
            f"_e{s}_{k}" for k in range(len(cb))
        ) + ")"
        case = (
            "CASE "
            + " ".join(
                f"WHEN _e{s}_{k} = {ms} THEN {k}" for k in range(len(cb))
            )
            + " END"
        )
        outs.append(f"CAST(({case}) AS INT) AS code_{s}")
    return pqd.selectExpr(f"`{id_col}`", "centroid", *outs)


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings to coarse centroids, then
    WITHIN each cluster drop vectors that are near-duplicates of a
    better-ranked member.  This is the deterministic
    first-ranked-wins variant: members rank by (distance to own
    centroid, id) and a vector is dropped when its cosine to ANY
    earlier-ranked cluster member is >= ``tau`` — so the member
    closest to the centroid always survives and the output is
    replayable (no RNG, no iteration order dependence).

    Scale shape: the O(n^2) similarity work is confined within
    clusters (the IVF trick applied to dedup — pair volume is
    sum-of-C(cluster_size, 2), tunable via the centroid count);
    centroid distances are inlined-literal chains per row, the
    pairwise stage is one equi-join on the cluster id, and no stage
    ever compares vectors across clusters.  Output
    ``(id, centroid, crank, kept)`` — the training-data curation
    decision per vector, joinable back to the documents table.
    """
    n_k = len(centroids)
    dim = len(centroids[0])
    vs = f"`{vec_col}`"
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        *[
            F.expr(l2sq_literal_sql(vs, c)).alias(f"_d{k}")
            for k, c in enumerate(centroids)
        ],
    ).repartition(F.col(id_col))
    m = F.least(*[F.col(f"_d{k}") for k in range(n_k)])
    ci = None
    for k in range(n_k):
        cond = F.col(f"_d{k}") == m
        ci = F.when(cond, F.lit(k)) if ci is None else ci.when(cond, F.lit(k))
    a = base.select(
        F.col(id_col),
        ci.cast("int").alias("centroid"),
        m.alias("_dc"),
        F.col("_v"),
    )
    w = Window.partitionBy("centroid").orderBy("_dc", id_col)
    ranked = a.withColumn("crank", F.row_number().over(w))
    x = ranked.select(
        "centroid",
        F.col(id_col).alias("_xid"),
        F.col("_v").alias("_xv"),
        F.col("crank").alias("_xr"),
    )
    y = ranked.select(
        "centroid",
        F.col("_v").alias("_yv"),
        F.col("crank").alias("_yr"),
    )
    cos = dot_cols(F.col("_xv"), F.col("_yv"), dim) / (
        norm(F.col("_xv"), dim) * norm(F.col("_yv"), dim)
    )
    dup = (
        x.join(y, "centroid")
        .filter(F.col("_yr") < F.col("_xr"))
        .filter(F.round(cos, 6) >= tau)
        .select(F.col("_xid"))
        .distinct()
    )
    return (
        ranked.join(dup, ranked[id_col] == dup["_xid"], "left")
        .select(
            F.col(id_col),
            F.col("centroid"),
            F.col("crank").cast("long").alias("crank"),
            F.col("_xid").isNull().alias("kept"),
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ADC search (Jégou et al. — asymmetric distance
    computation): the corpus exists ONLY as its compressed IVF-PQ
    encoding (coarse centroid id + m sub-codes, via
    :func:`ivfpq_encode`); each query's approximate distance to a
    corpus vector is computed against the RECONSTRUCTION
    ``centroid + code`` without ever touching the original corpus
    vector — the query path that serves billion-vector ANN from the
    compressed index alone.

    ``adc_dist(q, x) = sum_s ||(q - cent_cx)_sub_s - codebook_s[code_s]||^2``

    Plan shape: the encode is the s12 per-row literal pipeline; the
    search joins the encoded corpus to THREE tiny broadcast sides
    (centroid table, per-subspace code tables, the query set) and
    ranks with one per-query window — the only shuffle.  Returns
    ``(qid, nid, rank, adc_dist)`` with rank <= k, deterministic via
    6-dp rounding before the (adc_dist, nid) ordering.
    """
    spark = corpus.sparkSession
    enc = ivfpq_encode(corpus, centroids, codebooks, id_col, vec_col)
    # materialize the index: a repartition barrier is NOT enough here —
    # the optimizer still traverses the combined encode+search tree
    # (hundreds of literal distance chains x five joins) and OOMs.
    # Severing the plan mirrors the real IVF-PQ lifecycle anyway: the
    # compressed index is BUILT once and PERSISTED, then every query
    # serves against the materialized codes, never the encode plan.
    enc = enc.withColumnRenamed(id_col, "nid").localCheckpoint(eager=True)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "centroid int, _cv array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv")
    )
    j = enc.join(F.broadcast(cdf), "centroid").crossJoin(F.broadcast(q))
    for s, cb in enumerate(codebooks):
        sdf = spark.createDataFrame(
            [(ki, [float(x) for x in code]) for ki, code in enumerate(cb)],
            f"code_{s} int, _cb{s} array<double>",
        )
        j = j.join(F.broadcast(sdf), f"code_{s}")
    r = F.zip_with(
        F.col("_qv"), F.col("_cv"), lambda a, b: a.cast("double") - b
    )
    total = None
    off = 1
    for s, cb in enumerate(codebooks):
        width = len(cb[0])
        sub = F.slice(r, off, width)
        ds = F.aggregate(
            F.zip_with(
                sub, F.col(f"_cb{s}"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        total = ds if total is None else total + ds
        off += width
    scored = (
        j.filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(total, 6).alias("adc_dist"))
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "nid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "adc_dist")
    )
