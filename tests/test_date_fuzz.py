"""Seeded cross-engine fuzz of tolerant DATE parsing.

The reference's cleaning stage date-parses string feeds via TRY_CAST
(pipeline.py:136-141); this pins where Spark's `try_cast("date")`
agrees with DuckDB's TRY_CAST(DATE) — random valid dates across
0001–9999, leap-year edges, invalid month/day combos, non-padded
parts, time-suffixed and whitespace-padded forms — and asserts the
KNOWN disagreements stay as they are:

- '2023/01/31': DuckDB parses slash dates, Spark nulls (the SURVEY
  "known deliberate divergences" entry — invisible on the reference
  data, which is ISO-only);
- '2023-01-31x': DuckDB tolerates trailing garbage after a complete
  date, Spark requires full-string consumption;
- '23-01-31': DuckDB reads a 2-digit year as year 23, Spark nulls;
- '+2023-01-31': Spark accepts an explicit plus sign, DuckDB nulls.

Collection hazard, pinned explicitly: BOTH engines parse non-positive
years ('-0001-01-01'), but the value cannot round-trip to a Python
date (PySpark raises `date.fromordinal(<1)` at collect; DuckDB falls
back to the string '0002-01-01 (BC)'), and the two renderings differ —
a hash compare over such a column diverges even though both parses
"succeeded". Any operator that date-parses untrusted strings and
collects must cast to string first or bound the year; every registry
operator parses machine-generated ISO dates, where the case cannot
arise.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _gen(n: int, seed: int) -> list:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        y = rng.randint(1, 9999)
        m = rng.randint(1, 14)       # sometimes invalid
        d = rng.randint(1, 33)       # sometimes invalid
        style = rng.random()
        if style < 0.5:
            s = f"{y:04d}-{m:02d}-{d:02d}"
        elif style < 0.65:
            s = f"{y:04d}-{m}-{d}"   # non-padded parts
        elif style < 0.8:
            s = f"{y:04d}-{m:02d}-{d:02d} {rng.randint(0, 23):02d}:30:00"
        elif style < 0.9:
            s = f"  {y:04d}-{m:02d}-{d:02d}  "
        else:
            s = f"{y:04d}-{m:02d}-{d:02d}T12:00:00"
        out.append(s)
    # deterministic leap-year edges every run
    out += ["2024-02-29", "2023-02-29", "2000-02-29", "1900-02-29",
            "0001-01-01", "9999-12-31"]
    return out


def test_date_parsing_matches_duckdb(spark):
    cases = _gen(500, seed=14_08_2026)
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    # compare through string rendering: avoids the year<=0 ordinal
    # crash and the +10000 display difference is out of generated range
    got = {
        r.s: r.d
        for r in df.select(
            "s", F.col("s").try_cast("date").cast("string").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    for s in cases:
        (want,) = con.execute(
            "SELECT CAST(TRY_CAST(? AS DATE) AS VARCHAR)", [s]
        ).fetchone()
        assert got[s] == want, f"date({s!r}): spark={got[s]} duck={want}"


def test_known_date_divergences_stay_divergent(spark):
    con = duckdb.connect()
    cases = ["2023/01/31", "2023-01-31x", "23-01-31", "+2023-01-31",
             "-0001-01-01"]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {
        r.s: r.d
        for r in df.select(
            "s", F.col("s").try_cast("date").cast("string").alias("d")
        ).collect()
    }
    duck = {
        s: con.execute(
            "SELECT CAST(TRY_CAST(? AS DATE) AS VARCHAR)", [s]
        ).fetchone()[0]
        for s in cases
    }
    assert got["2023/01/31"] is None and duck["2023/01/31"] == "2023-01-31"
    assert got["2023-01-31x"] is None and duck["2023-01-31x"] == "2023-01-31"
    assert got["23-01-31"] is None and duck["23-01-31"] == "0023-01-31"
    assert got["+2023-01-31"] == "2023-01-31" and duck["+2023-01-31"] is None
    # the collection hazard: BOTH engines parse year<=0, but the
    # values are unshippable-to-Python as dates (Spark raises at
    # collect; DuckDB falls back to a string) and render incompatibly
    # — any hash compare over such a column would diverge
    assert got["-0001-01-01"] == "-0001-01-01"
    assert duck["-0001-01-01"] == "0002-01-01 (BC)"
