"""Seeded cross-engine fuzz of the total-cast shims.

The reference's whole cleaning model rests on never-throwing casts
(pipeline.py:136-141). `functions.scalars.try_int_duckdb` re-creates
DuckDB's TRY_CAST(... AS INTEGER) on Spark (decimal strings round
half-away instead of nulling); Spark's own `try_cast("double")`
matches DuckDB's TRY_CAST(DOUBLE) directly. This fuzz checks both
over generated numeric-ish strings — whitespace, signs, decimals,
exponents, overflow at the INT32/INT64 boundaries, inf/nan spellings,
empty/garbage — asserting value-identical results per input.

Known residual divergences, steered around and asserted as EXPECTED
(so a behavior change on either engine surfaces here):
- hex '0x1A', binary '0b101', underscore grouping '1_000': DuckDB
  parses these numeric-literal syntaxes, Java/Spark does not
  (shim docstring documents hex; all three are the same class);
- '+-3': DuckDB TRY_CAST(DOUBLE) parses sign-stacked strings
  (= -3.0), Spark nulls them.
None of these appears in the reference's feeds (machine-generated
fixed-point decimals).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.functions.scalars import try_int_duckdb

_CLASSES = [
    lambda rng: str(rng.randint(-(10**4), 10**4)),
    lambda rng: str(rng.randint(-(2**33), 2**33)),          # straddles INT32
    lambda rng: str(rng.randint(-(2**65), 2**65)),          # straddles INT64
    lambda rng: f"{rng.randint(-(10**6), 10**6) / 100:.2f}",  # fixed-point
    lambda rng: f"{rng.uniform(-1e4, 1e4):.6f}",
    lambda rng: f"{rng.uniform(-5, 5):.3f}e{rng.randint(-10, 10)}",
    lambda rng: f"  {rng.randint(0, 999)}  ",               # padded
    lambda rng: f"+{rng.randint(0, 999)}",
    lambda rng: f"00{rng.randint(0, 99)}",                  # leading zeros
    lambda rng: f".{rng.randint(1, 999)}",                  # bare fraction
    lambda rng: f"{rng.randint(1, 999)}.",                  # trailing dot
    lambda rng: rng.choice(["Infinity", "-Infinity", "inf", "-inf", "NaN", "nan"]),
    lambda rng: rng.choice(["", "  ", "abc", "12abc", "NULL", "null", "1,000", "½"]),
    lambda rng: rng.choice(["1e400", "-1e400", "1e-400"]),  # double over/underflow
]


def _gen(n: int, seed: int) -> list:
    rng = random.Random(seed)
    return [rng.choice(_CLASSES)(rng) for _ in range(n)]


def test_total_casts_match_duckdb(spark):
    cases = _gen(600, seed=7_2026)
    # the documented residual classes, asserted separately below
    residual = ["0x1A", "0b101", "1_000", "+-3"]

    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {
        r.s: (r.i, r.d)
        for r in df.select(
            "s",
            try_int_duckdb(F.col("s")).alias("i"),
            F.col("s").try_cast("double").alias("d"),
        ).collect()
    }

    con = duckdb.connect()
    for s in cases:
        want_i, want_d = con.execute(
            "SELECT TRY_CAST(? AS INTEGER), TRY_CAST(? AS DOUBLE)", [s, s]
        ).fetchone()
        have_i, have_d = got[s]
        assert have_i == want_i, f"int({s!r}): spark={have_i} duck={want_i}"
        if want_d != want_d:  # NaN on the DuckDB side
            assert have_d != have_d, f"double({s!r}): spark={have_d} duck=nan"
        else:
            assert have_d == want_d, f"double({s!r}): spark={have_d} duck={want_d}"

    # Residual divergences stay divergent — a change here means an
    # engine's parser moved and the shim docs need revisiting.
    rdf = spark.createDataFrame([(c,) for c in residual], ["s"])
    rr = {
        r.s: (r.i, r.d)
        for r in rdf.select(
            "s",
            try_int_duckdb(F.col("s")).alias("i"),
            F.col("s").try_cast("double").alias("d"),
        ).collect()
    }
    assert rr["0x1A"] == (None, None)
    assert con.execute("SELECT TRY_CAST('0x1A' AS INTEGER)").fetchone()[0] == 26
    assert rr["0b101"] == (None, None)
    assert con.execute("SELECT TRY_CAST('0b101' AS INTEGER)").fetchone()[0] == 5
    assert rr["1_000"] == (None, None)
    assert con.execute("SELECT TRY_CAST('1_000' AS INTEGER)").fetchone()[0] == 1000
    assert rr["+-3"] == (None, None)
    assert con.execute("SELECT TRY_CAST('+-3' AS DOUBLE)").fetchone()[0] == -3.0
