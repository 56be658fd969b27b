"""Registry plumbing for oracle-checked operator queries.

Every operator from SURVEY.md §2 is registered here as a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) the equivalent DuckDB oracle SQL over the
same parquet tables. The driver hash-compares both sides at sf0.01;
``tests/test_oracle_parity.py`` replicates that check locally.

Determinism rules (so order-insensitive value hashes match):
- Never SUM/AVG raw doubles across rows (floating addition is
  order-dependent under parallelism). Cast to DECIMAL first — exact,
  associative — then cast the final result back explicitly so both
  engines agree on the result type.
- Per-row double arithmetic is fine (same IEEE ops both engines).
- Ratio-of-aggregates: compute numerator/denominator exactly, divide
  once as DOUBLE, ROUND to fixed decimals on both sides.
- Alias every computed column identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from duckdb_data_eng_proj_spark.io.sources import load_table


@dataclass(frozen=True)
class QuerySpec:
    id: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(qid: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``qid``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if qid in REGISTRY:
            raise ValueError(f"duplicate query id: {qid}")
        REGISTRY[qid] = QuerySpec(qid, fn, oracle, doc or (fn.__doc__ or ""), tuple(tags))
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand testdata table loader."""
    return load_table(spark, sf_dir, name)
