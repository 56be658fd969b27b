"""Golden-output parity: the ETL vs the reference's committed outputs.

The reference run that produced /root/reference/output/ happened on
2026-01-23 at 12:30:57 Berlin time (visible in every processed_at).
Injecting that clock (run_ts + as_of_date, SURVEY.md G5) makes every
column — including the ratio doubles and months_since_disbursement —
bit-reproducible, so the comparison is exact text normalization, not
a tolerance band.

Normalization mirrors DuckDB's CSV text: shortest-roundtrip doubles
(Python repr == DuckDB's output), lowercase booleans, ISO dates,
'[a, b, NULL]' lists. Golden CSVs are re-read all-VARCHAR so quoting
distinguishes NULL (unquoted empty) from '' (quoted).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from duckdb_data_eng_proj_spark.etl import run_pipeline
from duckdb_data_eng_proj_spark.etl.analytics import ANALYTICS

REF = "/root/reference"
GOLD = f"{REF}/output"
RUN_TS = dt.datetime(2026, 1, 23, 12, 30, 57)
AS_OF = dt.date(2026, 1, 23)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference goldens not available"
)


@pytest.fixture(scope="module")
def result(spark):
    return run_pipeline(
        spark,
        f"{REF}/data/applications_expanded.csv",
        f"{REF}/data/lms_updates_expanded.csv",
        run_ts=RUN_TS,
        as_of_date=AS_OF,
    )


def _norm_spark(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ", ".join("NULL" if x is None else str(x) for x in v) + "]"
    return str(v)


def _golden(name: str):
    con = duckdb.connect()
    cur = con.execute(
        f"SELECT * FROM read_csv('{GOLD}/{name}.csv', header=true, all_varchar=true)"
    )
    cols = [d[0] for d in cur.description]
    rows = [
        tuple("∅" if v is None else v for v in row) for row in cur.fetchall()
    ]
    con.close()
    return cols, rows


def _compare(df, name: str):
    gcols, grows = _golden(name)
    assert df.columns == gcols, f"{name}: column order {df.columns} != {gcols}"
    srows = [tuple(_norm_spark(v) for v in row) for row in df.collect()]
    assert len(srows) == len(grows), f"{name}: {len(srows)} rows vs {len(grows)}"
    s_sorted, g_sorted = sorted(srows), sorted(grows)
    mism = [(a, b) for a, b in zip(s_sorted, g_sorted) if a != b]
    assert not mism, f"{name}: first diffs {mism[:2]}"


def test_cleaned_applications_golden(result):
    _compare(result.cleaned_applications, "cleaned_applications")


def test_loan_portfolio_golden(result):
    _compare(result.loan_portfolio, "loan_portfolio")


def test_data_quality_report_golden(result):
    _compare(result.data_quality_report, "data_quality_report")


def test_quarantine_count(result):
    assert result.raw_applications_bad.count() == 1
    assert result.raw_applications_good.count() == 199


# Row counts from executing the reference's queries.sql against its
# own takehome.duckdb (SURVEY.md §2.9, verified run).
_EXPECTED_QUERY_ROWS = {"q0": 52, "q1": 24, "q2": 14, "q3": 10, "q4": 5, "q5": 23}


@pytest.mark.parametrize("qid", sorted(ANALYTICS))
def test_analytics_row_counts(result, qid):
    fn = ANALYTICS[qid]
    if qid == "q0":
        df = fn(result.loan_portfolio, result.data_quality_report)
    else:
        df = fn(result.loan_portfolio)
    assert df.count() == _EXPECTED_QUERY_ROWS[qid]
