"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``duckdb_data_eng_proj_spark``; this module is
a thin adapter over its operator registry (one entry per SURVEY.md §2
row — see duckdb_data_eng_proj_spark/queries/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402

FLAGSHIP = "win_partition_sum"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q5-analog monthly volume share) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {qid: spec.fn for qid, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle is not None}
