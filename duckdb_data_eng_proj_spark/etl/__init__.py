"""The reference loan-portfolio ETL, re-expressed Spark-first.

Five composite stages (SURVEY.md §2.9): quarantine split, application
cleaning, LMS cleaning, portfolio join, quality report — plus the six
analytical queries (reference: queries.sql:1-245). Golden-output
parity against /root/reference/output/ is tested in
tests/test_etl_golden.py with an injected clock (SURVEY.md G5).
"""

from duckdb_data_eng_proj_spark.etl.loan_pipeline import (  # noqa: F401
    APP_COLUMNS,
    LMS_COLUMNS,
    PipelineResult,
    run_pipeline,
)
