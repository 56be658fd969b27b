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

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402

FLAGSHIP = "win_partition_sum"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q5-analog monthly volume share) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def _verified_green() -> set[str]:
    """Query ids that already have an all-green row in a past
    CORRECTNESS_r*.json (rows+schema+hash, or rows for oracle-less).

    Used purely for enumeration order: if a driver run truncates or
    times out, the never-yet-verified ids must come first so every
    round widens the hard correctness signal instead of re-proving
    round-1 rows (VERDICT r1 "What's missing" #1).
    """
    green: set[str] = set()
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle" and row.get("spark_rows") is not None:
                # Oracle-less entries get their rows-only check every run;
                # count them as verified-for-ordering so they stop crowding
                # out genuinely never-verified oracled ids (VERDICT r2 #2).
                green.add(qid)
                continue
            if err:
                continue
            if row.get("rows_match") and row.get("schema_match", True) and (
                row.get("hash_match") or qid not in REGISTRY or REGISTRY[qid].oracle is None
            ):
                green.add(qid)
    return green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Never-driver-verified ids enumerate first (registry order within
    each group) so a truncated verify run still covers new ground.
    """
    green = _verified_green()
    ordered = [qid for qid in REGISTRY if qid not in green] + [
        qid for qid in REGISTRY if qid in green
    ]
    return {qid: REGISTRY[qid].fn for qid in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle is not None}
