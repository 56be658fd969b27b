"""Seeded cross-engine fuzz of the BPE greedy-merge fold.

txt_bpe_apply's merge application is a per-word string fold over
unit-separator text: greedy left-to-right, non-overlapping, merged
symbols never re-merge within a pass (the Sennrich rule). The Spark
spelling (`_bpe_fold_col`, F.aggregate) and the DuckDB spelling
(`_bpe_fold_sql`, list_reduce over a prepended-'' seed) must agree
BIT-FOR-BIT on every word for every merge pair — one divergent fold
changes every later round's pair statistics and the learned merges.

This fuzz generates symbol sequences engineered to hit the fold's
edge cases — overlapping self-pairs ('aaa' with merge (a,a)),
adjacent repeats ('abab'), symbols equal to earlier MERGED output
('ab' as a literal symbol next to pair (a,b)), multi-char symbols,
single-symbol and empty-adjacent shapes — plus random words over a
tiny alphabet (maximizing pair hits), and random merge pairs
including pairs absent from the data. Equality is asserted
three-way: Spark fold == DuckDB fold == the independent pure-Python
greedy (the law tests' reference implementation).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries.extras_r13 import (
    _bpe_fold_col,
    _bpe_fold_sql,
)
from tests.test_r13_laws import _bpe_merge_word

_SYMS = ["a", "b", "c", "ab", "bc", "aa", "x"]


def _gen_cases(n: int, seed: int) -> list:
    rng = random.Random(seed)
    cases = []
    # directed edge cases first
    directed = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["ab", "a", "b"], "a", "b"),  # literal 'ab' next to the pair
        (["a", "b", "ab"], "a", "b"),
        (["b", "a"], "a", "b"),  # reversed order: no merge
        (["a"], "a", "a"),  # single symbol
        (["x"], "a", "b"),  # pair absent
        (["aa", "a", "a"], "a", "a"),  # merged-looking prefix symbol
        (["a", "ab", "b"], "ab", "b"),  # multi-char left side
    ]
    cases.extend(directed)
    for _ in range(n):
        k = rng.randint(1, 12)
        word = [rng.choice(_SYMS) for _ in range(k)]
        a, b = rng.choice(_SYMS), rng.choice(_SYMS)
        cases.append((word, a, b))
    return cases


def test_bpe_fold_three_way(spark):
    cases = _gen_cases(300, seed=31337)
    rows = [(i, s, a, b) for i, (s, a, b) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "id long, s array<string>, a string, b string"
    )
    got_spark = {
        r.id: list(r.out)
        for r in df.select("id", _bpe_fold_col().alias("out")).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, [%s], '%s', '%s')"
            % (i, ", ".join(f"'{x}'" for x in s), a, b)
            for i, (s, a, b) in enumerate(cases)
        )
        + ") v(id, s, a, b)"
    )
    got_duck = dict(
        con.execute(
            f"SELECT id, {_bpe_fold_sql('a', 'b')} FROM t"
        ).fetchall()
    )

    for i, (s, a, b) in enumerate(cases):
        want = _bpe_merge_word(s, a, b)
        assert got_spark[i] == want, (i, s, a, b, got_spark[i], want)
        assert got_duck[i] == want, (i, s, a, b, got_duck[i], want)


# ---------------------------------------------------------------------------
# Sequential trained-table fuzz (round 14): txt_bpe_train applies a
# CHAIN of merges, where later merges consume symbols earlier merges
# minted. One divergent intermediate fold changes every later round's
# statistics — so the three-way equality must hold for sequential
# application, not just single merges. Directed cases seed chains that
# re-merge minted symbols ((a,b) then (ab,c)), retire operands, and
# collide with literal symbols; random cases draw 3-merge chains over
# the small alphabet.

_CHAIN_ROUNDS = 3


def _gen_chain_cases(n: int, seed: int) -> list:
    rng = random.Random(seed)
    directed = [
        # minted symbol feeds the next merge: classic trained table
        (["a", "b", "c", "a", "b", "c"], [("a", "b"), ("ab", "c"), ("abc", "abc")]),
        # second merge's left operand is the first merge's output
        (["a", "a", "a", "a"], [("a", "a"), ("aa", "aa"), ("aaaa", "a")]),
        # literal 'ab' symbol vs minted 'ab' collision across rounds
        (["ab", "a", "b", "c"], [("a", "b"), ("ab", "c"), ("b", "c")]),
        # retirement: all 'a','b' consumed round 1, later merges no-op
        (["a", "b", "a", "b"], [("a", "b"), ("a", "b"), ("ab", "ab")]),
        # interleaved: (b,c) first, then (a,bc)
        (["a", "b", "c", "b", "c"], [("b", "c"), ("a", "bc"), ("bc", "bc")]),
    ]
    cases = list(directed)
    for _ in range(n):
        k = rng.randint(1, 12)
        word = [rng.choice(_SYMS) for _ in range(k)]
        merges = []
        pool = list(_SYMS)
        for _r in range(_CHAIN_ROUNDS):
            a, b = rng.choice(pool), rng.choice(pool)
            merges.append((a, b))
            pool.append(a + b)  # minted symbols join the pool
        cases.append((word, merges))
    return cases


def test_bpe_fold_chain_three_way(spark):
    cases = _gen_chain_cases(200, seed=41414)
    rows = [
        (i, s, [m[0] for m in ms], [m[1] for m in ms])
        for i, (s, ms) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, "id long, s array<string>, as array<string>, bs array<string>"
    )
    for r in range(_CHAIN_ROUNDS):
        df = (
            df.withColumn("a", F.element_at("as", r + 1))
            .withColumn("b", F.element_at("bs", r + 1))
            .withColumn("s", _bpe_fold_col())
        )
    got_spark = {r.id: list(r.s) for r in df.select("id", "s").collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, [%s], [%s], [%s])"
            % (
                i,
                ", ".join(f"'{x}'" for x in s),
                ", ".join(f"'{a}'" for a, _ in ms),
                ", ".join(f"'{b}'" for _, b in ms),
            )
            for i, (s, ms) in enumerate(cases)
        )
        + ") v(id, s, \"as\", bs)"
    )
    inner = "SELECT id, \"as\", bs, s FROM t"
    for r in range(_CHAIN_ROUNDS):
        fold = _bpe_fold_sql(f'"as"[{r + 1}]', f"bs[{r + 1}]")
        inner = f'SELECT id, "as", bs, {fold} AS s FROM ({inner})'
    got_duck = dict(con.execute(f"SELECT id, s FROM ({inner})").fetchall())

    for i, (s, ms) in enumerate(cases):
        want = list(s)
        for a, b in ms:
            want = _bpe_merge_word(want, a, b)
        assert got_spark[i] == want, (i, s, ms, got_spark[i], want)
        assert got_duck[i] == want, (i, s, ms, got_duck[i], want)
