"""Seeded cross-engine fuzz of the grid-cell interval-overlap join.

join_interval_overlap's correctness rests on two claims the sf
testdata exercises only lightly:
  (1) cell decomposition + the first-cell rule count every
      overlapping pair EXACTLY once (pairs spanning 2-3 shared cells
      must not double-count; pairs meeting exactly at a cell boundary
      must not drop), and
  (2) the closed-interval overlap predicate and overlap-length
      arithmetic agree between engines on boundary geometry.

This fuzz generates adversarial interval sets — endpoints ON cell
boundaries (s or e ≡ 0 mod w), single-day intervals, intervals
exactly touching (e_a == s_b), nested intervals, identical duplicate
intervals, and random sets — and asserts three-way equality per key:
the Spark operator pipeline == the DuckDB inequality self-join == an
independent pure-Python brute force.

The Spark arm runs the REAL operator body (same cell width, same
first-cell rule) over a temp parquet lineitem with engineered
(shipdate, partkey) values, so the fuzz cannot drift from production.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile
from datetime import date, timedelta

import duckdb

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r14 import _IVL_CELL_DAYS

_EPOCH = date(1992, 1, 1)
_W = _IVL_CELL_DAYS


def _gen_intervals(seed: int) -> list[tuple[int, int, int]]:
    """(suppkey, s, e) rows: each key is one adversarial scenario.
    Widths must satisfy the operator's derivation e = s + 1 + pk % 21,
    i.e. width-1 in [1, 21]."""
    rng = random.Random(seed)
    rows: list[tuple[int, int, int]] = []
    k = 0
    # boundary-pinned: starts and ends exactly on cell edges
    rows += [(k, 0, _W), (k, _W, 2 * _W), (k, 2 * _W - 1, 2 * _W)]
    k += 1
    # exact touch: e_a == s_b (closed intervals -> overlap of 1 day)
    rows += [(k, 10, 20), (k, 20, 30), (k, 31, 40)]
    k += 1
    # nested + duplicate intervals
    rows += [(k, 50, 70), (k, 55, 60), (k, 55, 60), (k, 50, 70)]
    k += 1
    # wide spanners crossing 2 cells each, all mutually overlapping
    rows += [(k, 3, 24), (k, 10, 31), (k, 17, 38)]
    k += 1
    # random keys
    for _ in range(12):
        n = rng.randint(2, 14)
        for _i in range(n):
            s = rng.randint(0, 80)
            rows.append((k, s, s + 1 + rng.randint(0, 20)))
        k += 1
    return rows


def _brute(rows):
    by_k = {}
    for k, s, e in rows:
        by_k.setdefault(k, []).append((s, e))
    out = {}
    for k, ivs in by_k.items():
        n = tot = 0
        for i in range(len(ivs)):
            for j in range(i + 1, len(ivs)):
                (sa, ea), (sb, eb) = ivs[i], ivs[j]
                if sa <= eb and sb <= ea:
                    n += 1
                    tot += min(ea, eb) - max(sa, sb) + 1
        if n:
            out[k] = (n, tot)
    return out


def _to_lineitem(rows):
    """Encode (k, s, e) into the operator's input contract:
    l_shipdate = epoch + s; l_partkey ≡ width-1 (mod 21) with
    width-1 = e - s - 1 in [0, 20]; unique (orderkey, linenumber)."""
    recs = []
    for i, (k, s, e) in enumerate(rows):
        recs.append(
            {
                "l_orderkey": i,
                "l_linenumber": 1,
                "l_suppkey": k,
                "l_partkey": e - s - 1,
                "l_shipdate": _EPOCH + timedelta(days=s),
            }
        )
    return recs


def test_interval_overlap_fuzz_three_way(spark):
    rows = _gen_intervals(seed=271828)
    recs = _to_lineitem(rows)
    sdf = spark.createDataFrame(
        [
            (
                r["l_orderkey"],
                r["l_linenumber"],
                r["l_suppkey"],
                r["l_partkey"],
                r["l_shipdate"].isoformat(),
            )
            for r in recs
        ],
        "l_orderkey long, l_linenumber int, l_suppkey long, "
        "l_partkey long, ship string",
    ).selectExpr(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_partkey",
        "CAST(ship AS TIMESTAMP) AS l_shipdate",
    )
    tmp = tempfile.mkdtemp(prefix="ivl_fuzz_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "lineitem.parquet")
        )

        got_spark = {
            r.suppkey: (r.n_pairs, r.overlap_days)
            for r in REGISTRY["join_interval_overlap"].fn(spark, tmp).collect()
        }

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp, 'lineitem.parquet')}/*.parquet')"
        )
        got_duck = {
            k: (n, d)
            for k, n, d in con.execute(
                REGISTRY["join_interval_overlap"].oracle
            ).fetchall()
        }

        want = _brute(rows)
        assert got_spark == want
        assert got_duck == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
