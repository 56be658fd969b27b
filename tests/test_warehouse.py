"""Persistent-warehouse contract: saveAsTable writes real parquet under
the database LOCATION and the catalog name resolves to it — the Spark
equivalent of the reference keeping takehome.duckdb on disk
(pipeline.py:12,35) for queries.sql to hit in a later session."""

from __future__ import annotations

import glob
import os

from duckdb_data_eng_proj_spark.io.scratch import scratch_dir
from duckdb_data_eng_proj_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_persist_roundtrip_writes_parquet(spark):
    df = REGISTRY["src_table_persist"].fn(spark, SF_DIR)
    rows = {r.c_mktsegment: r.n_cust for r in df.collect()}
    assert sum(rows.values()) > 0

    # physical files exist under the explicit database location
    files = glob.glob(os.path.join(scratch_dir("warehouse"), "customer_stage", "*.parquet"))
    assert files, "managed table left no parquet under the db LOCATION"

    # and they are self-describing: a raw parquet read (no catalog)
    # yields the same row count — what a later session would see
    raw = spark.read.parquet(os.path.dirname(files[0]))
    assert raw.count() == spark.table("graft_wh.customer_stage").count()
    assert set(raw.columns) == {"c_custkey", "c_mktsegment", "c_acctbal"}
