"""Physical-plan inspection helpers (the PLANS.md audit tooling).

``plan_summary`` condenses ``explain("formatted")`` to the lines that
matter for scale review: scans (with pushed filters + read schema),
exchanges, join strategies, top-k operators, and codegen spans.
``assert_pushed_filters`` turns the "is the filter reaching parquet?"
check into a testable invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEY_MARKERS = (
    "Scan parquet",
    "PushedFilters",
    "ReadSchema",
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "HashAggregate(keys",
    "TakeOrderedAndProject",
    "WholeStageCodegen",
    "Window",
    # scale red flags: all-pairs joins and Python execution nodes must
    # be visible to the audit, not silently filtered out
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
)


def _formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_summary(df: DataFrame, width: int = 160) -> list[str]:
    """Key physical-plan lines, in plan order."""
    out = []
    for line in _formatted_plan(df).splitlines():
        ls = line.strip()
        if any(m in ls for m in _KEY_MARKERS):
            out.append(ls[:width])
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    return sum(
        1
        for line in plan_summary(df)
        if line.startswith("Exchange") or line.startswith("+- Exchange")
        or ") Exchange" in line
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Raise AssertionError unless every fragment appears in some
    PushedFilters line — i.e. the predicate reached the parquet scan."""
    pushed = [l for l in plan_summary(df) if "PushedFilters" in l]
    joined = " ".join(pushed)
    missing = [f for f in fragments if f not in joined]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan: {missing}; pushed lines: {pushed}"
        )
