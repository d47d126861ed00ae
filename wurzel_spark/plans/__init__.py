from wurzel_spark.plans.inspect import (  # noqa: F401
    assert_no_sort_merge_join,
    assert_pushed_filter,
    assert_read_schema_only,
    broadcast_join_count,
    plan_report,
    plan_text,
)
