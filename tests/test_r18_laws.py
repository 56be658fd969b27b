"""Round-18 law tests.

1. ext_dedup_exact keep-first is EXACT NULLS LAST (ADVICE r17): the
   r17 sentinel emulation ('9999-12-31 23:59:59') tied with a genuine
   max-date ts — a timed row AT the sentinel instant and a timeless
   row collapsed to the same struct key, so keep-first fell to
   event_id across the timed/timeless boundary instead of always
   preferring the timed row. The boolean-first struct-min
   (ts IS NULL, ts, event_id) has no such collision instant. The law
   drives the registered fn and the registered oracle over a max-date
   vintage where the two forms DIFFER, so a regression to the
   sentinel fails loudly on both the cross-engine hash and the
   explicit survivor assertion.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.queries import REGISTRY


def _maxdate_events(spark, tmp_path):
    """events vintage: one (user, type) group holding a genuine ts at
    the old sentinel instant AND timeless rows; one all-timeless
    group; one ordinary group. Schema mirrors the generated table's
    dedup-relevant columns (extra columns are never selected)."""
    rows = [
        # group A: sentinel-instant ts must BEAT every NULL ts, and the
        # smaller event_id must NOT win from the timeless side.
        (1, 100, "click", "9999-12-31 23:59:59"),
        (2, 100, "click", None),
        (0, 100, "click", None),
        # group B: all timeless -> tie falls to smallest event_id.
        (7, 200, "view", None),
        (5, 200, "view", None),
        # group C: ordinary earliest-ts keep-first.
        (9, 300, "click", "2024-01-02 00:00:00"),
        (8, 300, "click", "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts_s string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    out = os.path.join(str(tmp_path), "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_dedup_exact_nulls_last_at_max_date(spark, tmp_path):
    sf_dir = _maxdate_events(spark, tmp_path)
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in REGISTRY["ext_dedup_exact"].fn(spark, sf_dir).collect()
    }
    # The timed row wins group A even AT the max-date instant; the
    # r17 sentinel form kept event_id 0 here (timeless, smaller id).
    assert got == {(100, "click"): 1, (200, "view"): 5, (300, "click"): 9}


def test_dedup_exact_maxdate_vintage_matches_oracle(spark, tmp_path):
    sf_dir = _maxdate_events(spark, tmp_path)
    spark_rows = sorted(
        tuple(r)
        for r in REGISTRY["ext_dedup_exact"].fn(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    duck_rows = sorted(
        tuple(r) for r in con.execute(REGISTRY["ext_dedup_exact"].oracle).fetchall()
    )
    con.close()
    assert spark_rows == duck_rows
