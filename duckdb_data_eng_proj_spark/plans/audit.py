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


def walk_physical(node):
    """Yield every node of a JVM SparkPlan tree, descending through
    AdaptiveSparkPlanExec.

    Under AQE, ``executedPlan()`` is a childless AdaptiveSparkPlan
    LEAF — ``children()`` is empty and a naive walk visits exactly one
    node (ADVICE r12: this made the broadcast-subtree audit vacuous).
    The real plan hangs off ``initialPlan``/``executedPlan`` instead,
    so descend through whichever accessor this Spark build exposes.
    """
    yield node
    if "AdaptiveSparkPlan" in node.nodeName():
        for attr in ("initialPlan", "executedPlan", "inputPlan"):
            try:
                inner = getattr(node, attr)()
            except Exception:
                continue
            yield from walk_physical(inner)
            return
    ch = node.children()
    for i in range(ch.size()):
        yield from walk_physical(ch.apply(i))


def joins_under_broadcast(df: DataFrame) -> list[list[str]]:
    """Join nodes sitting inside any BroadcastExchange subtree.

    The bright-line 100 TB rule (the dedup_lsh_tune lesson): a
    broadcast's VALUE being k rows is not enough — its whole subtree
    executes inside the broadcast future and must finish within
    spark.sql.broadcastTimeout, so a join pipeline under a broadcast
    dies on a timeout at exactly the data volumes where it matters.
    Returns one list of join nodeNames per offending exchange; [] is
    the only acceptable answer for a shipped operator.
    """
    plan = df._jdf.queryExecution().executedPlan()
    flags: list[list[str]] = []
    for node in walk_physical(plan):
        if "BroadcastExchange" in node.nodeName():
            joins = [
                n.nodeName()
                for n in walk_physical(node)
                if "Join" in n.nodeName()
            ]
            if joins:
                flags.append(joins[:3])
    return flags
