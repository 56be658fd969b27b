"""Law tests for the round-8 primitives (extras_r8.py).

Three properties the oracle-parity sweep can't see because both engines
could drift together or the law lives above any single dataset:

- ts_ewma's integer recursion is a pure fold: `_ewma_pdf` must equal a
  straight time-ordered fold regardless of incoming row order, and the
  truncating `//` must agree with DuckDB's floor `//` on every sign
  (negative sums happen — events.value is signed).
- agg_reservoir_sample's audit property: growing the data can only
  DISPLACE previously sampled rows, never resurrect an unsampled one —
  for S ⊆ S', topk(S') ∩ S ⊆ topk(S). That's the claim the operator
  docstring makes ("re-running over grown data keeps previously
  sampled rows stable modulo hash displacement").
- ml_naive_bayes' micro-unit log: `round(ln(x)·1e6)` must land on the
  same BIGINT in Spark and DuckDB for every integer the model can feed
  it (counts, totals, doc counts) — the rounding-boundary hazard the
  implementation comment (extras_r8.py) estimates at ~1e-7; this
  sweeps the actual input domain so the estimate is checked, not
  trusted.
"""

from __future__ import annotations

import os
import random
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.queries.extras_r8 import (
    _RES_K,
    _RES_MULT,
    _RES_SALT,
    _ewma_pdf,
)


# ---------------------------------------------------------------------------
# ts_ewma


def _trunc_div10(num):
    return -((-num) // 10) if num < 0 else num // 10


def _fold(values):
    acc, out = None, []
    for v in values:
        acc = v if acc is None else _trunc_div10(3 * v + 7 * acc)
        out.append(acc)
    return out


def test_ewma_is_an_order_insensitive_fold():
    rng = random.Random(81)
    for _ in range(40):
        n = rng.randint(1, 60)
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.sample(range(100_000), n), unit="h"
        )
        vals = [rng.randint(-10_000_00, 10_000_00) for _ in range(n)]
        pdf = pd.DataFrame({"user_id": 1, "bucket_ts": ts, "v_c100": vals})
        shuffled = pdf.sample(frac=1.0, random_state=rng.randint(0, 9999))
        got = _ewma_pdf(shuffled)
        ordered = pdf.sort_values("bucket_ts")
        assert list(got["ewma_c100"]) == _fold(list(ordered["v_c100"]))
        assert list(got["bucket_ts"]) == list(ordered["bucket_ts"])


def test_ewma_div_matches_duckdb_on_every_sign(oracle_con):
    # The recursion's one arithmetic op: (3v + 7y) // 10. DuckDB's //
    # TRUNCATES toward zero on negatives (-6542 // 10 = -654) while
    # Python's floors (-655) — the original floor-based _ewma_pdf
    # diverged on negative state; this pins the truncating fix.
    cases = [(v, y) for v in (-1007, -10, -3, -1, 0, 1, 3, 10, 997)
             for y in (-503, -7, -1, 0, 1, 7, 509)]
    rows = oracle_con.execute(
        "SELECT (3 * v + 7 * y) // 10 FROM (SELECT "
        "unnest(?) AS v, unnest(?) AS y)",
        [[c[0] for c in cases], [c[1] for c in cases]],
    ).fetchall()
    for (v, y), (duck,) in zip(cases, rows):
        assert duck == _trunc_div10(3 * v + 7 * y), (v, y)


# ---------------------------------------------------------------------------
# agg_reservoir_sample


def _topk(ids, k=_RES_K):
    return set(
        sorted(ids, key=lambda i: ((i * _RES_MULT + _RES_SALT) % 2**32, i))[:k]
    )


def test_reservoir_grown_data_only_displaces():
    rng = random.Random(82)
    for _ in range(60):
        base = {rng.randrange(10**9) for _ in range(rng.randint(1, 80))}
        grown = base | {rng.randrange(10**9) for _ in range(rng.randint(0, 80))}
        # every base row still sampled after growth was sampled before
        assert _topk(grown) & base <= _topk(base)
        # and the sample never exceeds k
        assert len(_topk(grown)) == min(_RES_K, len(grown))


# ---------------------------------------------------------------------------
# ml_naive_bayes


def test_log_microunits_agree_across_engines(spark, oracle_con):
    # Domain: Laplace counts (1..~1e4), totals t+v (~1e3..1e7), doc
    # counts. Sweep 1..20000 dense plus a log-spaced tail to 1e9.
    xs = list(range(1, 20_001)) + [
        int(1.17**k) for k in range(64, 134)
    ]
    duck = [
        r[0]
        for r in oracle_con.execute(
            "SELECT CAST(round(ln(x) * 1000000, 0) AS BIGINT) "
            "FROM (SELECT unnest(?) AS x) ORDER BY x",
            [sorted(set(xs))],
        ).fetchall()
    ]
    sdf = spark.createDataFrame([(x,) for x in sorted(set(xs))], "x long")
    got = [
        r[0]
        for r in sdf.select(
            F.round(F.log(F.col("x")) * 1_000_000, 0).cast("long")
        ).collect()
    ]
    assert got == duck


# ---------------------------------------------------------------------------
# ts_holt_linear


def test_holt_is_an_order_insensitive_fold_with_signed_trend():
    from duckdb_data_eng_proj_spark.queries.extras_r8 import (
        _holt_pdf,
        _trunc_div10 as td10,
    )

    def fold(values):
        l = b = None
        out = []
        for v in values:
            if l is None:
                l, b = v, 0
            else:
                lp = l
                l = td10(3 * v + 7 * (l + b))
                b = td10(2 * (l - lp) + 8 * b)
            out.append((l, b))
        return out

    rng = random.Random(83)
    saw_negative_trend = False
    for _ in range(40):
        n = rng.randint(1, 60)
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.sample(range(100_000), n), unit="h"
        )
        vals = [rng.randint(-10_000_00, 10_000_00) for _ in range(n)]
        pdf = pd.DataFrame({"user_id": 1, "bucket_ts": ts, "v_c100": vals})
        shuffled = pdf.sample(frac=1.0, random_state=rng.randint(0, 9999))
        got = _holt_pdf(shuffled)
        ordered = pdf.sort_values("bucket_ts")
        want = fold(list(ordered["v_c100"]))
        assert list(zip(got["level_c100"], got["trend_c100"])) == want
        saw_negative_trend |= any(b < 0 for _, b in want)
    # the property the EWMA bug taught us to demand: the sweep must
    # actually EXERCISE negative state, not just permit it
    assert saw_negative_trend


# ---------------------------------------------------------------------------
# evt_rfm_scores — cross-engine NTILE + epoch parity


def test_ntile_bucket_sizing_agrees_across_engines(spark, oracle_con):
    # evt_rfm_scores' quintiles assume both engines size NTILE buckets
    # identically given the same total order (equal buckets, remainder
    # distributed to the FRONT tiles). Sweep awkward n (n < k, n = k,
    # n % k != 0) with a deterministic order and compare tile columns.
    for n in (1, 2, 4, 5, 6, 7, 11, 23, 100, 101, 104):
        duck = oracle_con.execute(
            f"SELECT i, NTILE(5) OVER (ORDER BY i) FROM range({n}) t(i) "
            "ORDER BY i"
        ).fetchall()
        sdf = spark.range(n).select(F.col("id").alias("i"))
        from pyspark.sql import Window as W

        got = [
            (r[0], r[1])
            for r in sdf.select(
                "i", F.ntile(5).over(W.orderBy("i")).alias("t")
            ).orderBy("i").collect()
        ]
        assert got == [(a, b) for a, b in duck], n


def test_epoch_seconds_agree_across_engines(spark, oracle_con):
    # evt_rfm_scores' recency arithmetic: DuckDB epoch(ts) and Spark
    # unix_timestamp(ts) must land on the same BIGINT for the same
    # instant (both sides read the events parquet through their own
    # timestamp normalization; a timezone skew here would shift every
    # r_days by hours). Random instants across 1990–2035 incl. DST
    # boundaries in common zones.
    # Fractional seconds INCLUDED (ADVICE r8): DuckDB epoch() returns
    # DOUBLE and bare CAST rounds to nearest, so a ≥.5s fraction lands
    # 1s above Spark's truncating unix_timestamp — the oracles must
    # spell floor(epoch(ts)), and this sweep holds them to it.
    rng = random.Random(84)
    stamps = [
        "2024-03-10 02:30:00", "2024-11-03 01:30:00",  # US DST edges
        "2024-03-31 02:30:00", "2024-10-27 02:30:00",  # EU DST edges
        "1990-01-01 00:00:00", "2035-12-31 23:59:59",
        "2024-06-15 12:00:00.500000",  # exact half-second
        "2024-06-15 12:00:00.499999", "2024-06-15 12:00:00.999999",
    ] + [
        (
            pd.Timestamp("1990-01-01")
            + pd.Timedelta(
                seconds=rng.randint(0, 1_450_000_000),
                microseconds=rng.randint(0, 999_999),
            )
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
        for _ in range(200)
    ]
    duck = [
        r[0]
        for r in oracle_con.execute(
            "SELECT CAST(floor(epoch(CAST(s AS TIMESTAMP))) AS BIGINT) "
            "FROM (SELECT unnest(?) AS s)",
            [stamps],
        ).fetchall()
    ]
    sdf = spark.createDataFrame([(s,) for s in stamps], "s string")
    got = [
        r[0]
        for r in sdf.select(
            F.unix_timestamp(F.col("s").cast("timestamp"))
        ).collect()
    ]
    assert got == duck


# ---------------------------------------------------------------------------
# round(double, 0) — the cent-unit conversion every fixed-point op uses


def test_double_round_parity_across_engines(spark, oracle_con):
    # ts_ewma / ts_holt_linear / evt_rfm_scores (and the older cent-
    # unit operators) all enter integer arithmetic through
    # round(value * 100, 0). Both engines see the SAME IEEE double
    # product, so parity needs only that round() itself agrees —
    # including on exactly-representable halves of either sign
    # (Spark HALF_UP vs DuckDB round-half-away must coincide) and on
    # near-half products like 1.005 * 100 = 100.49999....
    rng = random.Random(85)
    xs = [2.5, -2.5, 0.5, -0.5, 3.5, -3.5, 1e15 + 0.5, -(1e15 + 0.5)]
    xs += [round(rng.uniform(-1e6, 1e6), 2) * 100 for _ in range(300)]
    xs += [rng.uniform(-1e4, 1e4) for _ in range(300)]
    xs += [v * 100 for v in (1.005, 2.675, -1.005, 0.615, -0.615)]
    duck = [
        r[0]
        for r in oracle_con.execute(
            "SELECT CAST(round(x, 0) AS BIGINT) "
            "FROM (SELECT unnest(?) AS x)",
            [xs],
        ).fetchall()
    ]
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r[0]
        for r in sdf.select(F.round(F.col("x"), 0).cast("long")).collect()
    ]
    mismatches = [
        (x, d, g) for x, d, g in zip(xs, duck, got) if d != g
    ]
    assert not mismatches, mismatches[:10]


# ---------------------------------------------------------------------------
# agg_reservoir_sample — 16/16 long-division hash must survive 100 TB ids


def test_reservoir_hash_decomposition_exact_and_overflow_free(spark, oracle_con):
    # The naive event_id * 2654435761 overflows int64 at ~3.47e9 (ADVICE
    # r8) — DuckDB raises, Spark wraps/throws by ANSI mode. The shipped
    # 16/16 decomposition must (a) equal the naive value mod 2^32 for
    # every id, (b) run on BOTH engines for ids up to int64 max without
    # error, (c) keep the rank order of existing sub-2^32 ids unchanged.
    from duckdb_data_eng_proj_spark.queries.extras_r8 import (
        _RES_MH, _RES_ML, _RES_MULT, _RES_SALT,
    )

    rng = random.Random(86)
    ids = [0, 1, 2**31, 2**32 - 1, 2**32, 3_470_000_000, 2**62, 2**63 - 1]
    # Negative ids too (ADVICE r9): DuckDB % follows the dividend's
    # sign where Spark pmod / Python % floor — the oracle's double-mod
    # must land every engine on the same non-negative residue.
    ids += [-1, -5, -(2**31), -(2**32), -(2**32) - 7, -(2**63)]
    ids += [rng.randrange(0, 2**63) for _ in range(500)]
    ids += [-rng.randrange(1, 2**63) for _ in range(100)]
    expect = [((i % 2**32) * _RES_MULT + _RES_SALT) % 2**32 for i in ids]

    duck = [
        r[0]
        for r in oracle_con.execute(
            "SELECT (((((i % 4294967296) + 4294967296) % 4294967296) "
            f"* {_RES_MH} % 65536) * 65536 "
            f"+ (((i % 4294967296) + 4294967296) % 4294967296) "
            f"* {_RES_ML} + {_RES_SALT}) % 4294967296 "
            "FROM (SELECT unnest(?) AS i)",
            [ids],
        ).fetchall()
    ]
    sdf = spark.createDataFrame([(i,) for i in ids], "i long")
    a = F.pmod(F.col("i"), F.lit(4294967296))
    h = F.pmod(
        F.pmod(a * F.lit(_RES_MH), F.lit(65536)) * F.lit(65536)
        + a * F.lit(_RES_ML)
        + F.lit(_RES_SALT),
        F.lit(4294967296),
    )
    got = [r[0] for r in sdf.select(h).collect()]
    assert duck == expect
    assert got == expect
