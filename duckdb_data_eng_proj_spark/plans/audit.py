"""Helpers to read a DataFrame's physical plan as data.

Built on the formatted explain string (stable across Spark 3.x/4.x),
so assertions stay readable: "this query broadcasts", "this scan reads
two columns", "this pipeline shuffles exactly once".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-Catalyst, pre-AQE-finalization)."""
    jdf = df._jdf
    # go through queryExecution to avoid capturing stdout from .explain()
    explain_mode = (
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan column sets actually read from parquet (pruning check)."""
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", physical_plan(df)):
        fields = m.group(1)
        cols.append(
            {f.split(":")[0].strip() for f in fields.split(",") if ":" in f}
        )
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\)\s+Exchange", plan))


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
