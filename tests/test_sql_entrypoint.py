"""SQL entry-point equivalence: spark.sql texts ≡ DataFrame forms.

A reference user's workflow is SQL over the pipeline outputs
(queries.sql); these tests prove the Spark SQL dialect versions return
exactly the DataFrame API results, so either surface is valid.
"""

from __future__ import annotations

import os

import pytest

from duckdb_data_eng_proj_spark.etl.analytics import ANALYTICS
from duckdb_data_eng_proj_spark.etl.sql_queries import SQL_QUERIES, run_sql_query
from tests.test_etl_golden import GOLD, result  # noqa: F401  (fixture)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference data not available"
)


@pytest.mark.parametrize("qid", sorted(SQL_QUERIES))
def test_sql_equals_dataframe(result, qid):  # noqa: F811
    sql_df = run_sql_query(
        result.loan_portfolio.sparkSession,
        qid,
        result.loan_portfolio,
        result.data_quality_report,
    )
    fn = ANALYTICS[qid]
    if qid == "q0":
        df = fn(result.loan_portfolio, result.data_quality_report)
    else:
        df = fn(result.loan_portfolio)
    assert sql_df.columns == df.columns
    s_rows = sorted(map(str, sql_df.collect()))
    d_rows = sorted(map(str, df.collect()))
    assert s_rows == d_rows
