"""Streaming checks: batch-replay equivalence + windowed agg parity.

The batch-replay law (SURVEY.md §5): after a streaming query drains
every input file, its output must equal the batch pipeline run on the
union of those files. This is the correctness contract that makes the
streaming path trustworthy without separate golden data.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from duckdb_data_eng_proj_spark.etl.loan_pipeline import clean_lms, dupe_keys
from duckdb_data_eng_proj_spark.io.sources import read_csv_all_varchar
from duckdb_data_eng_proj_spark.queries.streaming_q import split_lms_csv
from duckdb_data_eng_proj_spark.streaming import stream_clean_lms

REF = "/root/reference"
RUN_TS = dt.datetime(2026, 1, 23, 12, 30, 57)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/data"), reason="reference data not available"
)


def test_stream_ingest_batch_replay_equivalence(spark):
    src = f"{REF}/data/lms_updates_expanded.csv"
    days_dir = split_lms_csv(src)
    streamed = stream_clean_lms(spark, days_dir, run_ts=RUN_TS)

    from duckdb_data_eng_proj_spark.etl.loan_pipeline import LMS_COLUMNS

    raw = read_csv_all_varchar(spark, src, LMS_COLUMNS, extra="column8")
    batch = clean_lms(
        raw,
        dupe_keys(raw, "loan_id", exclude_blank=True),
        dupe_keys(raw, "application_id", exclude_blank=True),
        run_ts=RUN_TS,
    )

    s_rows = sorted(map(str, streamed.collect()))
    b_rows = sorted(map(str, batch.collect()))
    assert len(s_rows) == len(b_rows) == 177
    assert s_rows == b_rows
