"""Physical-plan inspection: make plan quality a *tested* property.

At 100 TB the difference between a broadcast join and a shuffled join,
or between a pushed and un-pushed filter, is the difference between
minutes and hours. These helpers read the executed plan so tests can
assert the plan shape an operator was designed for — catching silent
regressions (a filter that stops reaching the scan, a join that falls
back to sort-merge) the moment they appear.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE reuse not
    double-counted)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the scan's PushedFilters list."""
    plan = explain_str(df, "formatted")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; PushedFilters: {pushed!r}"


def assert_read_schema_only(df: DataFrame, columns: set[str], table_hint: str = "") -> None:
    """Assert the parquet ReadSchema prunes to exactly ``columns`` —
    a scan reading more than the projection needs is a column-pruning
    regression."""
    plan = explain_str(df, "formatted")
    for line in plan.splitlines():
        if "ReadSchema" in line and (not table_hint or table_hint in line):
            read = set(re.findall(r"(\w+):", line.split("ReadSchema")[1]))
            extra = read - columns - {"struct"}
            assert not extra, f"scan reads unpruned columns {extra}: {line.strip()}"
            return
    raise AssertionError("no ReadSchema found in plan")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    """Assert the plan contains >= at_least broadcast joins (and warn
    loudly if a SortMergeJoin crept in where we expect broadcasts)."""
    plan = explain_str(df, "simple")
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, plan:\n{plan}"


def assert_no_sort_merge_join(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"


def assert_single_shuffle(df: DataFrame) -> None:
    """Assert the plan shuffles at most once — the design contract of
    single-shuffle operators (asof_join, sessionize, moving_agg)."""
    n = count_exchanges(df)
    assert n <= 1, f"expected <= 1 shuffle, found {n}:\n{explain_str(df, 'simple')}"


def assert_wholestage_codegen(df: DataFrame) -> None:
    """Assert at least one WholeStageCodegen span exists (the operator
    body runs generated code, not interpreted rows). Under AQE the
    codegen markers (``*(n)`` prefixes) only appear in the *final*
    plan, so this executes the DataFrame first — use on small/test
    inputs."""
    df.collect()
    plan = explain_str(df, "simple")
    assert "*(" in plan or "WholeStageCodegen" in plan, f"no codegen spans:\n{plan}"
