from mapreduceimpl_spark.plans.introspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    executed_plan_str,
    explain_str,
    scan_read_schema,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "executed_plan_str",
    "explain_str",
    "scan_read_schema",
]
