"""Seeded cross-engine fuzz of the r12 per-row DOUBLE expression trees.

Three r12 operators rest on the claim that per-row double math with
IDENTICAL fully-parenthesized expression trees is cross-engine exact
(registry.py determinism rules): txt_bm25_topk's idf x saturation,
dedup_lsh_tune's banding S-curve 1-(1-s^r)^b by repeated squaring,
and ml_perceptron_round's 1e-6 component quantizer. The oracle rows
prove equality on the testdata DISTRIBUTION; this fuzz proves it on
adversarial grids — extreme counts, floor-boundary-hugging similarity
values, negative zero, subnormal-scale components — where one ULP of
tree divergence would flip a floor and break the value hash.
"""

from __future__ import annotations

import math
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries.extras_r12 import (
    _TUNE_GRID,
    _tune_p_col,
    _tune_p_sql,
)
from duckdb_data_eng_proj_spark.queries.extras_r12c import (
    _BM25_TERM_U_SQL,
    _bm25_idf_col,
    _bm25_sat_col,
)


def test_bm25_term_score_tree_matches_duckdb(spark):
    """floor((idf * sat) * 1e6) must agree for any plausible
    (tf, df, dl, n, tt) — including corpus-scale counts far beyond
    the testdata's and df ~ n (idf near its minimum)."""
    rng = random.Random(12_2026)
    rows = []
    for _ in range(400):
        n = rng.choice([1, 2, 10, 500, 10**6, 10**9])
        df = rng.randint(1, n)
        avg = rng.choice([5, 30, 200, 5000])
        tt = n * avg + rng.randint(0, avg)
        dl = rng.randint(1, max(1, min(tt, 20 * avg)))
        tf = rng.randint(1, min(dl, 10**6))
        rows.append((tf, df, dl, n, tt))
    # hand-built boundary cases
    rows += [
        (1, 1, 1, 1, 1),
        (1, 10**9, 1, 10**9, 10**9),
        (10**6, 1, 10**6, 10**9, 10**12),
    ]

    df_s = spark.createDataFrame(
        rows, "tf bigint, df bigint, dl bigint, n bigint, tt bigint"
    )
    got = [
        r.u
        for r in df_s.select(
            F.floor((_bm25_idf_col() * _bm25_sat_col()) * F.lit(1000000.0))
            .cast("bigint")
            .alias("u")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (tf BIGINT, df BIGINT, dl BIGINT, n BIGINT, tt BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    want = [
        r[0]
        for r in con.execute(f"SELECT {_BM25_TERM_U_SQL} FROM t").fetchall()
    ]
    assert got == want


def test_scurve_tree_matches_duckdb(spark):
    """floor((1 - (1 - s^r)^b) * 1e6) must agree for every grid config
    over s in [0, 1] — dense coverage plus values engineered to sit a
    hair around representable floor boundaries."""
    rng = random.Random(8_2026)
    ss = [i / 997 for i in range(998)]
    ss += [rng.random() for _ in range(500)]
    ss += [0.0, 1.0, 0.2, 0.5, 1.0 - 2**-52, 2**-52, 0.9999999]
    rows = [(s,) for s in ss]

    df_s = spark.createDataFrame(rows, "s double")
    sel = [
        F.floor(_tune_p_col(F.col("s"), nb, rpb) * F.lit(1000000.0))
        .cast("bigint")
        .alias(f"c{nb}x{rpb}")
        for nb, rpb in _TUNE_GRID
    ]
    got = [tuple(r) for r in df_s.select(*sel).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    cols = ", ".join(
        f"CAST(floor({_tune_p_sql(nb, rpb)} * 1000000.0) AS BIGINT)"
        for nb, rpb in _TUNE_GRID
    )
    want = con.execute(f"SELECT {cols} FROM t").fetchall()
    assert got == [tuple(w) for w in want]


def test_component_quantizer_matches_duckdb(spark):
    """floor(CAST(x AS DOUBLE) * 1e6) over float32 components must
    agree — negative zero, tiny magnitudes, and values whose *1e6
    product lands within one ULP of an integer are the danger zone."""
    rng = random.Random(4_2026)
    vals = [rng.uniform(-1.0, 1.0) for _ in range(600)]
    vals += [0.0, -0.0, 1e-7, -1e-7, 0.5252062082290649, -0.5252062082290649,
             1.0, -1.0, 2**-30, -(2**-30), 0.9999995, -0.9999995]
    # squeeze through float32 like the embedding column does
    import struct

    f32 = [struct.unpack("f", struct.pack("f", v))[0] for v in vals]
    rows = [(v,) for v in f32]

    df_s = spark.createDataFrame(rows, "x float")
    got = [
        r.u
        for r in df_s.select(
            F.floor(F.col("x").cast("double") * F.lit(1000000.0))
            .cast("bigint")
            .alias("u")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x FLOAT)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) FROM t"
        ).fetchall()
    ]
    assert got == want
    # and the replay-side contract: Python floor of the same tree
    for v, g in zip(f32, got):
        assert math.floor(float(v) * 1000000.0) == g
