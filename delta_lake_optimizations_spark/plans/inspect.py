"""Physical-plan inspection (reference T4, ``EXPLAIN EXTENDED`` /
``docs/02-lab-optimizations.md:644-665``) — machine-readable, so tests can
assert plan QUALITY (broadcasts chosen, filters pushed, codegen wide,
no single-partition funnels) instead of eyeballing ``explain()`` output.

This is the engine's guard-rail for the 100 TB mindset: a plan that scans
all columns for a 2-column projection, or funnels rows through one
partition, fails a test here long before it fails on a cluster.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict[str, Any]:
    """Parse the formatted physical plan into assertable facts."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)
    simple = df._jdf.queryExecution().executedPlan().toString()

    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            pushed.extend(p.strip() for p in body.split(","))

    read_schemas = re.findall(r"ReadSchema:\s*(\S+)", text)

    return {
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", text)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", text)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", text)),
        "exchanges": len(re.findall(r"\bExchange\b", simple)),
        "single_partition": "SinglePartition" in simple,
        "global_window": bool(re.search(r"Window\b(?![A-Za-z])", simple))
        and "SinglePartition" in simple,
        "pushed_filters": pushed,
        "read_schemas": read_schemas,
        "wholestage_codegen_stages": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))),
        "scans": len(re.findall(r"Scan parquet", text)),
    }


def assert_no_single_partition_funnel(df: DataFrame) -> None:
    s = plan_summary(df)
    if s["single_partition"] and s["global_window"]:
        raise AssertionError(
            "plan funnels all rows through one partition (global window) — "
            "use operators.ranking for global ranks"
        )


def read_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column-pruning check:
    a scan reading all columns for a 2-column projection is wrong)."""
    out = []
    for schema in plan_summary(df)["read_schemas"]:
        out.append(set(re.findall(r"(\w+):", schema)))
    return out
