"""Round-17 law tests: the F.round halfway-double decision.

The r16 review empirically confirmed the one systematic cross-engine
rounding gap left: Spark's F.round(double, d) rounds the SHORTEST
DECIMAL REPR half-up (BigDecimal.valueOf(d) → setScale(HALF_UP)),
while DuckDB's round(double, d) rounds the EXACT BINARY value —
repro: double 0.28499999999999998 (shortest repr '0.285', exact
binary 0.2849999999999999755…) → Spark round(x,2)=0.29, DuckDB 0.28.

r17 decision (measured, BASELINE §Round 17):

- ADOPTED oracle form for display roundings of derived doubles:
  ``CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), d) AS
  DOUBLE)`` — DuckDB's double→VARCHAR cast prints the same shortest
  repr Spark rounds, the VARCHAR→DECIMAL parse is exact, and decimal
  round is HALF_UP on both engines. The Spark side stays plain
  F.round (its semantics ARE the spec). Fuzz below: 0 divergences
  across the adversarial shortest-repr-half class incl. negatives
  and d=0, where plain round diverges at 2–6%.
- REJECTED: decimal-cast on BOTH sides (round(CAST(x AS
  DECIMAL(38,15)), d)) — Spark's double→decimal also shortest-reprs
  while DuckDB's is exact-binary, so the divergence just moves to
  digit 15 and fires for every |x| > ~1 in the class (measured:
  71.365 → Spark 71.37, DuckDB 71.36).
- GRANDFATHERED with documented safety arguments:
  (a) cents conversions ``round(money * 100, 0)`` — the generator
      emits ≤2-decimal money/value columns, so the product is within
      ~4e-9 of an integer, never near a halfway (pinned below);
  (b) micro-unit ``round(ln(x) * 1e6, 0)`` sites (ml_naive_bayes,
      txt_entropy, zipf, …) and the composite integer-unit CASE arms
      (agg_regr_linear ppm) — same ~1e-11/value class, conversion
      deferred to each module's next flip;
  (c) un-flipped modules (relational, tpch, tpch_full, scalar_fns,
      etl/, extensions, streaming_q, udf_multimodal, etl_composites,
      extras_r10b, extras_r12) — converting them would re-enqueue
      their driver evidence for a ~1e-11 risk; convert when they
      next flip for a real reason.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_REPRO = 0.28499999999999998
_WRAP = "CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), {d}) AS DOUBLE)"


def test_halfway_repro_divergence_documented():
    """The class exists: DuckDB's plain round on the repro value gives
    0.28 where Spark (shortest-repr HALF_UP) gives 0.29. If this ever
    stops failing-to-agree, an engine changed its rounding and the
    whole decision should be revisited."""
    con = duckdb.connect()
    plain = con.execute(
        f"SELECT round(CAST({_REPRO!r} AS DOUBLE), 2)"
    ).fetchone()[0]
    assert plain == 0.28  # DuckDB: exact-binary round
    wrapped = con.execute(
        f"SELECT {_WRAP.format(d=2)}".replace(
            "CAST(x AS VARCHAR)", f"CAST(CAST({_REPRO!r} AS DOUBLE) AS VARCHAR)"
        )
    ).fetchone()[0]
    assert wrapped == 0.29  # adopted form: Spark semantics


def test_halfway_repro_spark_side(spark):
    df = spark.createDataFrame([(_REPRO,)], "x double")
    got = df.select(F.round("x", 2).alias("r")).collect()[0].r
    assert got == 0.29


def _spark_vs_wrapped(spark, xs, d):
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    got = [r.r for r in df.select(F.round("x", d).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in xs])
    want = [
        w[0]
        for w in con.execute(
            f"SELECT {_WRAP.format(d=d)} FROM t"
        ).fetchall()
    ]
    return [(x, g, w) for x, g, w in zip(xs, got, want) if g != w]


def test_wrapped_round_parity_adversarial(spark):
    """Spark F.round vs the adopted oracle form over the
    shortest-repr-half class (the class where plain round diverges at
    2-6%), plus broad random values, at every precision the repo
    uses, both signs."""
    rng = random.Random(17)
    for d in (0, 2, 4, 6):
        xs = []
        while len(xs) < 300:
            k = rng.randrange(10 ** (d + 3))
            if k % 10 != 5:
                continue
            v = k / 10 ** (d + 1)
            xs.append(v if rng.random() < 0.5 else -v)
        xs += [rng.uniform(-1e6, 1e6) for _ in range(150)]
        xs += [rng.uniform(-1, 1) for _ in range(150)]
        bad = _spark_vs_wrapped(spark, xs, d)
        assert not bad, (d, bad[:5])


def test_cents_grandfather_condition():
    """round(money * 100, 0) stays grandfathered ONLY while the
    generator emits ≤2-decimal money/value columns: the product is
    then within ~1e-8 of an integer, nowhere near a halfway case. A
    regen that starts emitting ≥3-decimal values breaks this pin
    loudly and the cents sites join the conversion queue."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # the smallest generated dir the suite always has
    sf = sf if os.path.exists(sf) else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for tbl, col in (
        ("events", "value"),
        ("orders", "o_totalprice"),
        ("lineitem", "l_quantity"),
        ("lineitem", "l_extendedprice"),
    ):
        resid = con.execute(
            f"SELECT COALESCE(MAX(abs({col} * 100 - round({col} * 100, 0))), 0)"
            f" FROM read_parquet('{sf}/{tbl}.parquet')"
        ).fetchone()[0]
        assert resid < 1e-4, (tbl, col, resid)


# ---------------------------------------------------------------------------
# r17 new-op laws (§9.0b item 3)

import math  # noqa: E402

import pytest  # noqa: E402

from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    )


def test_matryoshka_degrades_to_brute_force(spark):
    """With the coarse budget c >= corpus size the two-stage search
    must equal brute-force ext_sim_topk EXACTLY (same queries, same
    k, same tie-break): the prefix stage then filters nothing, so any
    difference would mean the rescore itself is wrong. Run on the
    generated vintage, where the fixed-dim/zero-norm guards are
    vacuous for both ops."""
    from duckdb_data_eng_proj_spark.queries.extras_r17 import _mrl_df

    exhaustive = _mrl_df(spark, SF_DIR, c=10**9)
    brute = REGISTRY["ext_sim_topk"].fn(spark, SF_DIR)
    assert _rows(exhaustive) == _rows(brute)


def test_matryoshka_rank_structure(spark):
    """Ranks are exactly 1..K per query and cosines are
    non-increasing in rank (the rescore is a true top-k)."""
    from duckdb_data_eng_proj_spark.queries.extras_r17 import _MRL_K

    rows = REGISTRY["vec_matryoshka_search"].fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, _MRL_K + 1)), q
        sims = [r.cos_sim for r in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:])), q


@pytest.fixture(scope="module")
def zero_prefix_dir(tmp_path_factory):
    """An embeddings vintage with a vector (vec_id 3, a QUERY id)
    whose first 16 dims are all zero but whose full norm is fine —
    the guard class unique to prefix search: its coarse cosine is
    undefined while every other family would accept it."""
    import duckdb as _duck
    import random as _random

    d = tmp_path_factory.mktemp("zeroprefix")
    rng = _random.Random(23)
    rows = []
    for vid in range(40):
        emb = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        if vid == 3:
            emb = [0.0] * 16 + emb[16:]
        rows.append((vid, emb, vid % 5))
    con = _duck.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    con.execute(f"COPY embeddings TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


def test_matryoshka_zero_prefix_cross_engine(spark, zero_prefix_dir):
    """Spark fn and DuckDB oracle agree value-exactly on the
    zero-prefix vintage: vec_id 3 is excluded symmetrically (as both
    query and corpus vector) by the pnrm > 0 guard."""
    import duckdb as _duck

    spec = REGISTRY["vec_matryoshka_search"]
    sdf = spec.fn(spark, zero_prefix_dir)
    got = _rows(sdf)
    # col-sorted tuples: (cos_sim, neighbor_id, query_id, rank) —
    # vec 3 must appear neither as query nor as neighbor
    assert all(r[1] != 3 and r[2] != 3 for r in got)
    con = _duck.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{zero_prefix_dir}/embeddings.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [dd[0] for dd in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert got == want


def test_scene_cut_replays_closed_form(spark):
    """The decode-path cuts equal the closed-form mod-256 wrap count
    for every doc: frame k's luma is (seed + 11k) % 256, so a cut
    fires exactly where the ramp wraps (jump 245 > 64 vs in-ramp 11)."""
    rows = REGISTRY["mm_scene_cut"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        seed = (r.doc_id * 7) % 256
        lums = [(seed + 11 * k) % 256 for k in range(r.n_frames)]
        cuts = [
            k + 1
            for k in range(len(lums) - 1)
            if abs(lums[k + 1] - lums[k]) > 64
        ]
        assert r.n_cuts == len(cuts), r
        assert r.first_cut == (cuts[0] if cuts else None), r
        assert r.cut_idx_sum == sum(cuts), r
        if r.n_frames == 1:
            assert (r.n_cuts, r.first_cut, r.cut_idx_sum) == (0, None, 0)


@pytest.mark.parametrize(
    ("qid", "budget"),
    [
        # two narrow Arrow stages (synthesize + decode/diff with the
        # per-doc aggregation inside the batch), no shuffle
        ("mm_scene_cut", 0),
        # the corpus-widening repartition + one query-keyed rank
        # exchange shared by both windows; the query batch broadcasts
        # without a repartition of its own
        ("vec_matryoshka_search", 2),
    ],
)
def test_r17_op_exchange_budget(spark, qid, budget):
    from duckdb_data_eng_proj_spark.plans import count_exchanges

    df = REGISTRY[qid].fn(spark, SF_DIR)
    n = count_exchanges(df)
    assert n <= budget, f"{qid}: {n} exchanges > budget {budget}"


# ---------------------------------------------------------------------------
# degenerate-variance semantics (r17): Spark's ANSI mode ABORTS double
# division-by-zero where DuckDB yields NaN/inf (and DuckDB's decimal
# cast aborts on 'nan') — so zero-variance inputs were a loud
# cross-engine split. The pinned rule: statistics are NULL (corr,
# slope/intercept, wavg) or filtered out (z-score) when their
# defining variance/weight is not strictly positive, identically on
# both engines.


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory):
    """A vintage that drives the guarded expressions degenerate:
    lineitem with a CONSTANT-quantity returnflag group (zero x
    variance) and events whose hourly counts are all equal per type
    (z-score variance 0)."""
    import duckdb as _duck

    d = tmp_path_factory.mktemp("nonfinite")
    con = _duck.connect()
    con.execute(
        "CREATE TABLE lineitem(l_orderkey BIGINT, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE, l_returnflag VARCHAR)"
    )
    rows = [(i, 5.0, 100.0 + i, 0.01, "A") for i in range(20)]
    rows += [(100 + i, float(1 + i), 200.0 + 3 * i, 0.02, "N") for i in range(20)]
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY lineitem TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    ev = []
    eid = 0
    for h in range(4):  # 4 hourly buckets, 3 events each -> var = 0
        for k in range(3):
            eid += 1
            ev.append((eid, f"2024-03-01 {10 + h:02d}:{5 * k:02d}:00", 1, "view", 1.0, "{}"))
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", ev)
    con.execute(f"COPY events TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


def _norm_nan(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("qid", ["agg_corr_exact", "evt_anomaly_zscore"])
def test_degenerate_variance_cross_engine(spark, nonfinite_dir, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, nonfinite_dir)  # must not ANSI-abort
    got = _norm_nan(
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    con = duckdb.connect()
    for tbl in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{nonfinite_dir}/{tbl}.parquet')"
        )
    cur = con.execute(spec.oracle)  # must not decimal-cast-abort
    cols = [dd[0] for dd in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = _norm_nan(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert got == want
    if qid == "agg_corr_exact":
        # the constant-quantity group is PRESENT with a NULL corr
        assert any("None" in r for r in got), got
    else:
        # the zero-variance series produces no anomaly rows at all
        assert got == [], got


# ---------------------------------------------------------------------------
# blank-text vintage (r17 extension of the adversarial-vintage
# program): documents that EXIST but tokenize to nothing — empty
# string, whitespace-only, punctuation-only. Explode-based ops drop
# such docs on both engines; per-doc stats must agree on NULL vs 0 vs
# absent, and no division by a zero token count may abort either side.


@pytest.fixture(scope="module")
def blank_text_dir(tmp_path_factory):
    import duckdb as _duck
    import random as _random

    d = tmp_path_factory.mktemp("blanktext")
    rng = _random.Random(31)
    words = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(24):
        if i % 6 == 0:
            text = ""
        elif i % 6 == 1:
            text = "   \t  "
        elif i % 6 == 2:
            text = "!!! ... ###"
        else:
            text = " ".join(rng.choice(words) for _ in range(10))
        rows.append((i, text, ["en", "de"][i % 2], f"src{i % 3}", len(text)))
    con = _duck.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars INT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY documents TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "qid",
    [
        "txt_quality_score",
        "txt_rep_signals",
        "txt_entropy",
        "txt_readability",
        "txt_top_tokens",
        "txt_oov_rate",
        "dedup_simhash",
        "txt_fingerprint",
        "txt_code_detect",
        "txt_lang_id",
        # the fingerprint/fuzzy-key consumers (r17 blank-text fixes)
        "pipe_modality_split",
        "pipe_corpus_clean",
    ],
)
def test_blank_text_cross_engine(spark, blank_text_dir, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, blank_text_dir)
    got = _norm_nan(
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{blank_text_dir}/documents.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [dd[0] for dd in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = _norm_nan(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# malformed-props vintage: the r7 divergence atlas says DuckDB's JSON
# fns THROW on invalid JSON where Spark's Jackson paths yield NULL —
# pinned here as "tolerant extraction is the spec" (json_valid guards
# in the oracles).


@pytest.fixture(scope="module")
def bad_json_dir(tmp_path_factory):
    import duckdb as _duck

    d = tmp_path_factory.mktemp("badjson")
    con = _duck.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, '{"k": 55, "x": 1}'),
        (2, "2024-01-01 10:01:00", 1, "view", 1.0, '{"k": 7}'),
        (3, "2024-01-01 10:02:00", 1, "view", 1.0, "{"),          # malformed
        (4, "2024-01-01 10:03:00", 1, "view", 1.0, ""),            # empty
        (5, "2024-01-01 10:04:00", 1, "view", 1.0, None),          # NULL
        (6, "2024-01-01 10:05:00", 1, "view", 1.0, '{"x": 9}'),   # missing k
        (7, "2024-01-01 10:06:00", 1, "view", 1.0, "not json at all"),
    ]
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY events TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize("qid", ["ext_json_extract", "js_from_json"])
def test_malformed_json_cross_engine(spark, bad_json_dir, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, bad_json_dir)
    got = _norm_nan(
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{bad_json_dir}/events.parquet')"
    )
    cur = con.execute(spec.oracle)  # must not throw on invalid JSON
    cols = [dd[0] for dd in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = _norm_nan(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# negative-value + tied-timestamp vintage: the extras_r8 docstrings
# note the generated data never drives a bucket sum negative — the
# truncating-division pins (_trunc_div10, DuckDB `//` == Spark DIV on
# negatives) were proven by pure-python laws but never driven through
# BOTH engines on hostile data. Ties at identical (user_id, ts) also
# exercise every (ts, event_id) tiebreak.


@pytest.fixture(scope="module")
def negative_value_dir(tmp_path_factory):
    import duckdb as _duck
    import random as _random

    d = tmp_path_factory.mktemp("negval")
    rng = _random.Random(37)
    con = _duck.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    rows = []
    eid = 0
    types = ["view", "click", "purchase", "error", "signup"]
    for u in (1, 2, 3):
        for h in range(6):
            for k in range(4):
                eid += 1
                # mostly-negative cents, some ties at :00 seconds
                v = round(rng.uniform(-80, 20), 2)
                minute = 0 if k < 2 else 7 * k  # two events tie per hour
                rows.append(
                    (
                        eid,
                        f"2024-04-0{u} {8 + h:02d}:{minute:02d}:00",
                        u,
                        types[eid % 5],
                        v,
                        '{"k": %d}' % (eid % 100),
                    )
                )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY events TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "qid",
    [
        "ts_ewma",           # truncating recursion on SIGNED state
        "ts_holt_linear",    # trend goes negative on any decline
        "ts_anomaly_mad",    # |2v - med| over negative cents
        "ts_changepoint_cusum",
        "ts_resample_ohlc",
        "ts_gap_fill",
        "win_moving_avg",
        "evt_rfm_scores",    # m_c100 negative monetary scores
        "ext_sessionize",    # tied timestamps, event_id tiebreak
        "ts_downsample_lttb",  # y cents negative, tied ts
    ],
)
def test_negative_value_cross_engine(spark, negative_value_dir, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, negative_value_dir)
    got = _norm_nan(
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{negative_value_dir}/events.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [dd[0] for dd in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = _norm_nan(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert got == want
    # the vintage is actually hostile: negative values reached the output
    if qid in ("ts_ewma", "ts_holt_linear", "ts_anomaly_mad"):
        assert any("-" in "".join(r) for r in got), "no negatives exercised"
