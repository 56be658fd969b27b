"""Seeded cross-engine fuzz of date_trunc bucketing.

Every time-bucketing operator — ts_gap_fill's hourly grid,
ext_win_tumbling, ts_resample_ohlc candles, evt_cohort_retention's
first-active-day, the monthly cohort flagship — relies on
`F.date_trunc` and DuckDB `date_trunc` landing every instant in the
same bucket. This fuzz sweeps random timestamps across 1970–2100
(plus epoch, leap-day, quarter/year boundary-adjacent instants, and
sub-second values) through hour/day/week/month/quarter/year
truncation and asserts identical bucket timestamps.

The one structural divergence is RETURN TYPE, not value: DuckDB
date_trunc('month'|'quarter'|'year') returns DATE while Spark returns
TIMESTAMP (the SKILL.md gotcha) — so both sides are normalized
through CAST(... AS TIMESTAMP), exactly as every registry oracle
spells it. Week truncation is pinned to Monday-start on both engines
by construction of the generated cases.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_UNITS = ["hour", "day", "week", "month", "quarter", "year"]


def _gen_ts(n: int, seed: int) -> list:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        base = dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 4_102_444_800)  # through 2100
        )
        if rng.random() < 0.3:  # park next to a boundary
            unit = rng.choice(["hour", "day"])
            base = base.replace(minute=0, second=0) if unit == "hour" else base.replace(
                hour=0, minute=0, second=0
            )
            base += dt.timedelta(seconds=rng.choice([-1, 0, 1]))
        if rng.random() < 0.25:  # fractional-second instant
            base = base.replace(microsecond=rng.randint(1, 999_999))
            out.append(base.strftime("%Y-%m-%d %H:%M:%S.%f"))
        else:
            out.append(base.strftime("%Y-%m-%d %H:%M:%S"))
    out += [
        "1970-01-01 00:00:00",
        "2024-02-29 23:59:59",
        "2024-02-29 23:59:59.999999",  # max-fraction boundary instant
        "2023-12-31 23:59:59.000001",  # min-fraction boundary instant
        "2023-01-01 00:00:00",     # year/quarter/month/week all collide
        "2024-01-01 00:00:00",     # Monday: week == day == year
        "2023-12-31 23:59:59",
    ]
    return out


def test_date_trunc_buckets_match_duckdb(spark):
    cases = _gen_ts(400, seed=1066)
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    sel = [F.col("s")] + [
        F.date_trunc(u, F.col("s").cast("timestamp")).cast("string").alias(u)
        for u in _UNITS
    ]
    got = {r.s: tuple(r[u] for u in _UNITS) for r in df.select(*sel).collect()}
    con = duckdb.connect()
    sql = "SELECT " + ", ".join(
        f"CAST(CAST(date_trunc('{u}', CAST(? AS TIMESTAMP)) AS TIMESTAMP) "
        "AS VARCHAR)"
        for u in _UNITS
    )
    for s in cases:
        want = con.execute(sql, [s] * len(_UNITS)).fetchone()
        assert got[s] == tuple(want), f"{s}: {got[s]} != {want}"


def test_month_trunc_return_type_divergence():
    """The reason every oracle writes CAST(date_trunc(...) AS
    TIMESTAMP): DuckDB returns DATE for month-and-coarser units."""
    con = duckdb.connect()
    (t,) = con.execute(
        "SELECT typeof(date_trunc('month', TIMESTAMP '2023-06-15 12:00:00'))"
    ).fetchone()
    assert t == "DATE"
    (t2,) = con.execute(
        "SELECT typeof(date_trunc('hour', TIMESTAMP '2023-06-15 12:00:00'))"
    ).fetchone()
    assert t2 == "TIMESTAMP"
