"""Keyed mutation operators (SURVEY.md §2.9 M1-M6).

The reference does per-PK SQL UPDATEs with schema evolution
(/root/reference/entwiner/geopackage/feature_table.py:237-263) and
keyed upserts via REPLACE INTO (:601-613).  On immutable Parquet the
equivalents are join-based rewrites (Delta MERGE semantics without
Delta):

- ``update_columns``  = MERGE ... WHEN MATCHED THEN UPDATE
- ``upsert``          = MERGE ... WHEN MATCHED UPDATE / NOT MATCHED INSERT
- ``delete_keys``     = MERGE ... WHEN MATCHED THEN DELETE (anti join)

All are single-shuffle joins on the key; the updates side is typically
small -> broadcast.  Unlike the reference's DiGraphDB.update_edges
(graphs/digraphdb/__init__.py:164-167, self-described as not working),
these are functional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def update_columns(
    target: DataFrame,
    updates: DataFrame,
    key: list[str],
    broadcast: bool = True,
    null_overwrites: bool = False,
) -> DataFrame:
    """Keyed column update (M1/M2): non-key columns of ``updates``
    overwrite matching rows; unmatched rows pass through unchanged.
    New columns in ``updates`` are added (schema evolution, NULL for
    unmatched rows) — the ALTER TABLE analogue.

    NULL semantics: by default an update value of NULL keeps the old
    value (sparse-update semantics — updates carry only the fields they
    set, like the reference's keyed UPDATE of provided keys,
    feature_table.py:237-260).  Pass ``null_overwrites=True`` for
    strict MERGE WHEN MATCHED semantics where NULL clears the column —
    implemented with a match flag so matched rows take the update value
    verbatim.  ``updates`` must be unique on ``key`` (duplicates would
    multiply matched target rows through the join).
    """
    upd = updates.dropDuplicates(key)
    upd = F.broadcast(upd) if broadcast else upd
    upd_cols = [c for c in updates.columns if c not in key]
    matched = upd.withColumn("_matched", F.lit(True))
    t, u = target.alias("t"), matched.alias("u")
    joined = t.join(u, key, "left_outer")
    out_cols = [F.col(f"t.{c}") for c in key]
    for c in target.columns:
        if c in key:
            continue
        if c in upd_cols:
            if null_overwrites:
                new_val = F.when(
                    F.col("u._matched"), F.col(f"u.{c}")
                ).otherwise(F.col(f"t.{c}"))
            else:
                new_val = F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}"))
            out_cols.append(new_val.alias(c))
        else:
            out_cols.append(F.col(f"t.{c}"))
    for c in upd_cols:
        if c not in target.columns:
            out_cols.append(F.col(f"u.{c}"))
    return joined.select(*out_cols)


def upsert(target: DataFrame, incoming: DataFrame, key: list[str]) -> DataFrame:
    """REPLACE INTO semantics (S5/U2): incoming rows win on key
    conflict, others inserted.  Schema union via unionByName."""
    t = target.join(incoming.select(*key), key, "left_anti")
    return t.unionByName(incoming, allowMissingColumns=True)


def delete_keys(target: DataFrame, keys: DataFrame, key: list[str]) -> DataFrame:
    """Keyed delete (M5/M6 analogue): anti join on the key set."""
    return target.join(keys.select(*key), key, "left_anti")


def set_edge_attr(
    edges: DataFrame, u: str, v: str, attr: str, value
) -> DataFrame:
    """Single-edge attribute set (M3): d[key] = value through the
    mapping protocol in the reference (graphs/digraphdb/edges.py:25-39).
    value=None clears the attribute (reference delete sets NULL).
    """
    hit = (F.col("_u") == u) & (F.col("_v") == v)
    return edges.withColumn(
        attr, F.when(hit, F.lit(value)).otherwise(F.col(attr) if attr in edges.columns else F.lit(None))
    )


def scd2_history(
    df: DataFrame,
    key: list[str],
    state_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history construction: collapse
    a keyed change stream into effectivity intervals
    ``(key, state, effective_from, effective_to)`` where consecutive
    rows with the SAME state merge into one interval (gaps-and-islands)
    and the current interval has ``effective_to = NULL`` — the standard
    warehouse history table built from a mutation/CDC log, i.e. the
    queryable form of the reference's keyed-update stream (M1/M2).

    Plan shape: one shuffle on the key; island detection (lag +
    conditional running sum), the per-island aggregate, and the
    effective_to lead all reuse the same key partitioning, so Catalyst
    plans a single exchange with three window sorts.  Deterministic
    given a unique tiebreak column for same-timestamp changes.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w_seq = Window.partitionBy(*key).orderBy(*order)
    changed = (
        F.lag(F.col(state_col)).over(w_seq).isNull()
        | (F.lag(F.col(state_col)).over(w_seq) != F.col(state_col))
    ).cast("int")
    islands = df.select(
        *key,
        F.col(state_col),
        F.col(ts_col),
        F.sum(changed).over(w_seq).alias("_island"),
    )
    iv = islands.groupBy(*key, "_island").agg(
        # all rows of an island share the state by construction
        F.min(state_col).alias(state_col),
        F.min(ts_col).alias("effective_from"),
    )
    w_next = Window.partitionBy(*key).orderBy("_island")
    return iv.select(
        *key,
        state_col,
        "effective_from",
        F.lead("effective_from").over(w_next).alias("effective_to"),
    )
