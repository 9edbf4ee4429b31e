"""Deterministic sampling operators for training-data pipelines.

Corpus curation needs REPRODUCIBLE samples: `df.sample()` depends on
partition layout and seed plumbing, so two runs over a re-partitioned
100 TB corpus disagree.  These operators derive membership from a
cryptographic hash of a key column instead — the sample is a pure
function of the data, stable across partitioning, cluster size, and
engine (the md5-prefix trick has a bit-identical DuckDB twin, see
catalog samp1/samp2).

Reference parity: the reference engine has no sampling surface; these
are part of the LLM-pipeline superset (SURVEY.md §2.14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_col(key_col: str):
    """Lowercase md5 hex of the key — identical string in DuckDB."""
    return F.md5(F.col(key_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    keep_rank: bool = True,
) -> DataFrame:
    """Exact-size per-stratum sample: the n_per_stratum rows with the
    smallest md5(key) in each stratum (ties broken by the key itself).

    Hash-rank sampling is uniform within each stratum yet fully
    deterministic.  One shuffle on the strata columns; rank is a
    running row_number, so map-side the partition only needs a sort.
    Skewed strata are ordinary window skew — AQE handles moderate
    cases; for a pathological stratum pre-filter with hash_sample to
    ~4x the target size first (two cheap passes beat one skewed sort).
    """
    w = Window.partitionBy(*strata_cols).orderBy(_hash_col(key_col), F.col(key_col))
    out = df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= n_per_stratum
    )
    return out if keep_rank else out.drop("rk")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5(key) prefix
    falls below the fraction threshold.

    Granularity is 1/65536 (first 4 hex chars); membership is a pure
    per-row predicate — no shuffle, no state, pushdown-friendly — and
    REPEATABLE: the same row is in the sample on every run and every
    engine, which is what makes held-out splits auditable.  Fixed-width
    lowercase hex compares lexicographically as its numeric value, so
    the engine-portable form is a plain string comparison.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = format(int(fraction * 65536), "04x")
    return df.filter(F.substring(_hash_col(key_col), 1, 4) < F.lit(threshold))


def token_budget_sample(
    df: DataFrame,
    group_cols: list[str],
    token_col: str,
    budget: int,
    key_col: str,
) -> DataFrame:
    """Token-budget mixture sampling: within each group (source,
    language, domain …) keep documents in deterministic md5-rank order
    until the group's token budget is exhausted — the corpus-mixture
    construction step ("1B tokens of web, 200M of code") of a training
    pipeline, made reproducible the same way as stratified_sample.

    A document is kept iff the running token total INCLUDING it stays
    <= budget (strict cap, no overshoot).  One shuffle on the group
    columns; the cumulative sum is a running window frame computed in
    a single sort pass per group.  Emits ``cum_tokens`` so the cut is
    auditable.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_col(key_col), F.col(key_col)
    )
    return (
        df.withColumn(
            "cum_tokens", F.sum(F.col(token_col)).over(w).cast("long")
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.01
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/holdout split by hashed key: complementary
    hash_sample predicates, so the two sides partition the corpus
    exactly (no row in both, none dropped) regardless of partitioning
    or re-runs."""
    threshold = format(int(holdout_fraction * 65536), "04x")
    pred = F.substring(_hash_col(key_col), 1, 4) < F.lit(threshold)
    return df.filter(~pred), df.filter(pred)


def temperature_sample(
    df: DataFrame, group_col: str, key_col: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-balanced mixture sampling (the mT5/XLM-R recipe:
    sampling share p_s ∝ n_s^alpha, alpha < 1 flattens the source
    distribution so low-resource groups aren't drowned out).  Realized
    as a per-group deterministic Bernoulli rate
    ``rate_s = (n_s / min_n)^(alpha-1)`` — the smallest group keeps
    everything, larger groups are down-sampled toward the tempered
    share — using the same md5-prefix membership predicate as
    hash_sample, so the sample is repeatable and auditable.

    Scale shape: ONE small group-count aggregate broadcast back onto
    the scan; membership is a per-row predicate (no shuffle of the
    corpus, no state).  Rates are rounded to 6 dp before the 16-bit
    threshold compare so both engines make identical keep decisions
    (pow() may differ in the last ulp across libms).  Output: the
    kept rows + their group ``rate``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0,1], got {alpha}")
    stats = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_s"))
    mn = stats.agg(F.min("_n_s").alias("_min_n"))
    rates = stats.crossJoin(F.broadcast(mn)).select(
        F.col(group_col),
        F.round(
            F.pow(F.col("_n_s") / F.col("_min_n"), F.lit(alpha - 1.0)), 6
        ).alias("rate"),
    )
    h16 = F.conv(
        F.substring(_hash_col(key_col), 1, 4), 16, 10
    ).cast("long")
    return df.join(F.broadcast(rates), group_col).filter(
        h16 < F.floor(F.col("rate") * 65536)
    )


def weighted_sample(
    df: DataFrame, weight_col: str, k: int, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res): each row gets priority
    ``u^(1/weight)`` with ``u`` the md5-derived uniform fraction, and
    the top-k priorities are the sample — heavier rows win
    proportionally more often, yet membership is repeatable and
    auditable like every sampler here.

    Priorities are rounded to 9 dp BEFORE the ordering compare
    (pow() may differ in the last ulp across libms — the samp4
    discipline) with the key as tiebreak, so both engines select the
    identical k rows.  Plan: pure per-row expression +
    TakeOrderedAndProject — no shuffle, no RNG state.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # u^(1/w) is only a sampling priority for POSITIVE weights: w < 0
    # inverts the ranking (frac^negative > 1) and w = 0 NULLs the row.
    # Validate LAZILY inside the plan (raise_error fires on the first
    # bad row during the one real pass) — the old eager min() action
    # doubled the scan cost of every call.
    w = F.when(
        F.col(weight_col) <= 0,
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample requires positive weights; {weight_col} = "
                ),
                F.col(weight_col).cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.col(weight_col))
    h16 = F.conv(F.substring(_hash_col(key_col), 1, 4), 16, 10).cast("long")
    frac = (h16 + F.lit(0.5)) / F.lit(65536.0)
    pri = F.round(F.pow(frac, F.lit(1.0) / w), 9)
    return (
        df.select(F.col(key_col), F.col(weight_col), pri.alias("_k"))
        .orderBy(F.col("_k").desc(), key_col)
        .limit(k)
        .select(
            F.col(key_col),
            F.col(weight_col),
            F.round("_k", 6).alias("priority"),
        )
    )
