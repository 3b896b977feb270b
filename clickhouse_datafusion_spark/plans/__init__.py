from clickhouse_datafusion_spark.plans.explain import (
    estimated_scan_partitions,
    executed_metrics,
    executed_plan,
    output_rows,
    plan_report,
    assert_pushed_filters,
    assert_pruned_schema,
    assert_broadcast_join,
    assert_no_cartesian,
)

__all__ = [
    "estimated_scan_partitions",
    "executed_metrics",
    "executed_plan",
    "output_rows",
    "plan_report",
    "assert_pushed_filters",
    "assert_pruned_schema",
    "assert_broadcast_join",
    "assert_no_cartesian",
]
