"""Physical-plan inspection — the 100 TB design rules, made checkable.

The reference has no optimizer (SURVEY.md §4.1); this engine's whole scale
story is that Catalyst produces the right physical plan when queries are
declared well. These helpers turn "the right plan" into assertions that
tests/test_plan_quality.py pins per query:

- dimension joins broadcast (no fact-side shuffle),
- no sort-merge join where a broadcast is expected,
- predicates and projections reach the parquet scan (PushedFilters /
  ReadSchema),
- the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, *, final: bool = False) -> str:
    """The physical plan string. ``final=True`` executes *this* DataFrame's
    own query execution first (a derived action would not mutate it) so
    AQE's runtime re-plan (coalesced partitions, demoted/promoted joins,
    codegen spans) is visible instead of the pre-execution skeleton."""
    if final:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanStats:
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    exchanges: int
    codegen_spans: int
    pushed_filters: tuple[str, ...]
    read_schemas: tuple[str, ...]


def plan_stats(df: DataFrame, *, final: bool = False) -> PlanStats:
    plan = physical_plan(df, final=final)
    return PlanStats(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        # AQE reuses/inserts exchanges at runtime; count distinct operator
        # mentions, not reuse markers
        exchanges=len(re.findall(r"\bExchange\b", plan)),
        # whole-stage codegen shows as `*(n) Operator` in the plan string
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", plan))),
        # match to `]` or end-of-line — the scan line may be width-truncated
        # mid-list
        pushed_filters=tuple(re.findall(r"PushedFilters: \[([^\]\n]*)", plan)),
        # the FileScan line is width-truncated, so ReadSchema may be cut off;
        # the scanned column list at the line head is always present
        read_schemas=tuple(re.findall(r"FileScan parquet \[([^\]]*)\]", plan)),
    )


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column pruning)."""
    return [
        {field.split("#")[0].strip() for field in schema.split(",") if field.strip()}
        for schema in plan_stats(df).read_schemas
    ]
