"""Oracle result-type guard: no DECIMAL / HUGEINT result columns.

The driver's value hasher serializes DuckDB HUGEINT/DECIMAL
differently from Spark's 64-bit integers and doubles even when the
values are identical — the round-1 hash-failure root cause, and the
r6/r7 ts_gap_fill lesson (DuckDB silently widens SUM(BIGINT) to
HUGEINT, so a single missing CAST re-introduces the hazard).
`scripts/type_sweep.py` is the full cross-engine audit; this test
pins its fatal class cheaply (DuckDB DESCRIBE only, no Spark session,
no execution) so a new operator can't regress it unnoticed.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.io.sources import TESTDATA_TABLES
from duckdb_data_eng_proj_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Types whose cross-engine serialization is not bit-identical to a
# Spark result type. UHUGEINT/UBIGINT included: same width hazard.
_FATAL = ("HUGEINT", "UHUGEINT", "UBIGINT", "INT128", "DECIMAL")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _flat_fatal(type_str: str) -> bool:
    up = str(type_str).upper()
    return any(f in up for f in _FATAL)


@pytest.mark.parametrize(
    "qid", [q for q in sorted(REGISTRY) if REGISTRY[q].oracle is not None]
)
def test_oracle_emits_no_hash_hazardous_types(duck, qid):
    rel = duck.sql(REGISTRY[qid].oracle)
    bad = {
        col: str(ty)
        for col, ty in zip(rel.columns, rel.types)
        if _flat_fatal(ty)
    }
    assert not bad, (
        f"{qid}: oracle result columns {bad} use a type the driver "
        "hasher serializes differently across engines — CAST the "
        "aggregate/expression to BIGINT or DOUBLE in the oracle SQL "
        "(DuckDB widens SUM(BIGINT)->HUGEINT and integer AVG/'/' "
        "to DECIMAL silently)"
    )
