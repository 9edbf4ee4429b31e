from entwiner_spark.plans.explain import plan_summary, assert_pushed_filters

__all__ = ["plan_summary", "assert_pushed_filters"]
