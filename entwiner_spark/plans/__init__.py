from entwiner_spark.plans.explain import (
    assert_pushed_filters,
    count_exchanges,
    hof_reeval_violations,
    optimized_plan,
    plan_summary,
)

__all__ = [
    "assert_pushed_filters",
    "count_exchanges",
    "hof_reeval_violations",
    "optimized_plan",
    "plan_summary",
]
