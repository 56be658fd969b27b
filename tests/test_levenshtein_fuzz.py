"""Seeded cross-engine fuzz of levenshtein semantics.

Two registry operators compare edit distances across engines:
fn_string_suite's name_seg_dist (queries/extras.py:330) and
dedup_fuzzy_edit's candidate verification (queries/training.py:1612).
This fuzz proves the engines agree exactly on ASCII — random pairs
with random single-char edits, transposes, prefixes, and unrelated
strings — which is the domain both ops actually run on (the driver's
testdata is verifiably pure ASCII, asserted below).

Pinned residual: the engines COUNT DIFFERENT UNITS outside ASCII.
Spark's levenshtein is code-point-based ('é'→'e' = 1 edit) while
DuckDB's is byte-based (2 edits for the 2-byte é; 4 for an emoji).
A non-ASCII corpus would need a normalization step (or a byte-level
Spark distance) before the oracle comparison — the test encodes the
boundary so the hazard is discovered here and not in a driver hash
mismatch.
"""

from __future__ import annotations

import os
import random
import string
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _mutate(s: str, rng: random.Random) -> str:
    if not s:
        return rng.choice(string.ascii_lowercase)
    op = rng.randrange(4)
    i = rng.randrange(len(s))
    if op == 0:      # substitute
        return s[:i] + rng.choice(string.ascii_lowercase) + s[i + 1:]
    if op == 1:      # delete
        return s[:i] + s[i + 1:]
    if op == 2:      # insert
        return s[:i] + rng.choice(string.ascii_lowercase) + s[i:]
    if i + 1 < len(s):  # transpose
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    return s


def _gen_pairs(n: int, seed: int) -> list:
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        a = "".join(
            rng.choice(string.ascii_lowercase + string.digits + " .,!-_")
            for _ in range(rng.randint(0, 24))
        )
        roll = rng.random()
        if roll < 0.5:
            b = a
            for _ in range(rng.randint(1, 5)):
                b = _mutate(b, rng)
        elif roll < 0.7:
            b = a[: rng.randint(0, len(a))]
        else:
            b = "".join(
                rng.choice(string.ascii_lowercase) for _ in range(rng.randint(0, 20))
            )
        pairs.append((a, b))
    return pairs


def test_levenshtein_matches_duckdb_on_ascii(spark):
    pairs = _gen_pairs(500, seed=31337)
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    )
    got = {
        r.i: r.lev
        for r in df.select("i", F.levenshtein("a", "b").alias("lev")).collect()
    }
    con = duckdb.connect()
    for i, (a, b) in enumerate(pairs):
        (want,) = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
        assert got[i] == want, f"lev({a!r},{b!r}): spark={got[i]} duck={want}"


def test_levenshtein_units_diverge_outside_ascii(spark):
    df = spark.createDataFrame([("é", "e"), ("🙂", "x")], ["a", "b"])
    got = [r.lev for r in df.select(F.levenshtein("a", "b").alias("lev")).collect()]
    assert got == [1, 1]  # code points
    con = duckdb.connect()
    assert con.execute("SELECT levenshtein('é', 'e')").fetchone()[0] == 2  # bytes
    assert con.execute("SELECT levenshtein('🙂', 'x')").fetchone()[0] == 4


def test_levenshtein_operator_domains_are_ascii():
    """The green driver rows for the two levenshtein ops are valid
    precisely because their input columns are pure ASCII — assert
    that property of the testdata so a regenerated dataset that
    breaks it fails loudly here."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for table, col in [("documents", "text"), ("customer", "c_name"),
                       ("customer", "c_mktsegment")]:
        (n,) = con.execute(
            rf"SELECT count(*) FROM read_parquet('{sf}/{table}.parquet') "
            rf"WHERE regexp_matches({col}, '[^\x00-\x7F]')"
        ).fetchone()
        assert n == 0, f"{table}.{col}: {n} non-ASCII rows — levenshtein " \
                       "oracle parity no longer guaranteed"
