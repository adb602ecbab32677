from refluxdb_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_sort_merge_join,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_single_shuffle,
    assert_wholestage_codegen,
    count_exchanges,
    explain_str,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_sort_merge_join",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "assert_single_shuffle",
    "assert_wholestage_codegen",
    "count_exchanges",
    "explain_str",
]
