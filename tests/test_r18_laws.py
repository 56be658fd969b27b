"""Round-18 law tests.

0. The three r18 operators (txt_rerank_proximity,
   ext_contamination_report, sim_ann_ivf_rebalance): pure-Python
   closed-form replays (the r17 scene-cut pattern — an independent
   single-threaded implementation over the same parquet must produce
   the identical result set), cross-op coherence laws, and
   exchange-budget pins.
1. ext_dedup_exact keep-first is EXACT NULLS LAST (ADVICE r17): the
   r17 sentinel emulation ('9999-12-31 23:59:59') tied with a genuine
   max-date ts — a timed row AT the sentinel instant and a timeless
   row collapsed to the same struct key, so keep-first fell to
   event_id across the timed/timeless boundary instead of always
   preferring the timed row. The boolean-first struct-min
   (ts IS NULL, ts, event_id) has no such collision instant. The law
   drives the registered fn and the registered oracle over a max-date
   vintage where the two forms DIFFER, so a regression to the
   sentinel fails loudly on both the cross-engine hash and the
   explicit survivor assertion.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.queries import REGISTRY


def _maxdate_events(spark, tmp_path):
    """events vintage: one (user, type) group holding a genuine ts at
    the old sentinel instant AND timeless rows; one all-timeless
    group; one ordinary group. Schema mirrors the generated table's
    dedup-relevant columns (extra columns are never selected)."""
    rows = [
        # group A: sentinel-instant ts must BEAT every NULL ts, and the
        # smaller event_id must NOT win from the timeless side.
        (1, 100, "click", "9999-12-31 23:59:59"),
        (2, 100, "click", None),
        (0, 100, "click", None),
        # group B: all timeless -> tie falls to smallest event_id.
        (7, 200, "view", None),
        (5, 200, "view", None),
        # group C: ordinary earliest-ts keep-first.
        (9, 300, "click", "2024-01-02 00:00:00"),
        (8, 300, "click", "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts_s string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    out = os.path.join(str(tmp_path), "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_dedup_exact_nulls_last_at_max_date(spark, tmp_path):
    sf_dir = _maxdate_events(spark, tmp_path)
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in REGISTRY["ext_dedup_exact"].fn(spark, sf_dir).collect()
    }
    # The timed row wins group A even AT the max-date instant; the
    # r17 sentinel form kept event_id 0 here (timeless, smaller id).
    assert got == {(100, "click"): 1, (200, "view"): 5, (300, "click"): 9}


def test_dedup_exact_maxdate_vintage_matches_oracle(spark, tmp_path):
    sf_dir = _maxdate_events(spark, tmp_path)
    spark_rows = sorted(
        tuple(r)
        for r in REGISTRY["ext_dedup_exact"].fn(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    duck_rows = sorted(
        tuple(r) for r in con.execute(REGISTRY["ext_dedup_exact"].oracle).fetchall()
    )
    con.close()
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# r18 new-op laws

import math
import re

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_tokens(text):
    """Mirror operators.textops.tokens: lower → trim → split \\s+ →
    drop empty."""
    if text is None:
        return []
    return [w for w in re.split(r"\s+", text.strip().lower()) if w != ""]


def test_rerank_proximity_python_replay(spark):
    """Independent single-threaded replay of both stages over the same
    parquet — candidate generation, min pair distance, micro-unit
    proximity, final ordering — must reproduce the op exactly."""
    from duckdb_data_eng_proj_spark.queries.extras_r12c import (
        _BM25_QUERIES,
        _BM25_TERMS,
    )
    from duckdb_data_eng_proj_spark.queries.extras_r18 import (
        _RERANK_C,
        _RERANK_K,
    )
    from duckdb_data_eng_proj_spark.queries import REGISTRY

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    termset = set(_BM25_TERMS)
    # positions of query-vocabulary terms per doc (1-based)
    pos = {}  # doc_id -> term -> [i]
    for row in tbl:
        for i, tok in enumerate(_py_tokens(row["text"]), start=1):
            if tok in termset:
                pos.setdefault(row["doc_id"], {}).setdefault(tok, []).append(i)
    expected = []
    for qid, terms in _BM25_QUERIES:
        s1 = []
        for doc_id, tp in pos.items():
            n_terms = sum(1 for w in terms if w in tp)
            if n_terms:
                s1.append((doc_id, n_terms))
        s1.sort(key=lambda r: (-r[1], r[0]))
        cands = s1[:_RERANK_C]
        fin = []
        for doc_id, n_terms in cands:
            tp = pos[doc_id]
            prox = 0
            ts = sorted(w for w in terms if w in tp)
            for x in range(len(ts)):
                for y in range(x + 1, len(ts)):
                    md = min(
                        abs(i - j) for i in tp[ts[x]] for j in tp[ts[y]]
                    )
                    prox += 1000000 // (1 + md)
            fin.append((doc_id, n_terms, prox))
        fin.sort(key=lambda r: (-r[1], -r[2], r[0]))
        for rank, (doc_id, n_terms, prox) in enumerate(fin[:_RERANK_K], 1):
            expected.append((qid, doc_id, n_terms, prox, rank))
    got = sorted(
        tuple(r)
        for r in REGISTRY["txt_rerank_proximity"].fn(spark, SF_DIR).collect()
    )
    assert got == sorted(expected)


def test_rerank_single_term_docs_score_zero_prox(spark):
    """A candidate matching exactly one query term has no pairs —
    prox_u must be 0, never NULL."""
    from duckdb_data_eng_proj_spark.queries import REGISTRY

    rows = REGISTRY["txt_rerank_proximity"].fn(spark, SF_DIR).collect()
    assert rows, "empty rerank result"
    for r in rows:
        assert r.prox_u is not None and r.prox_u >= 0
        if r.n_terms == 1:
            assert r.prox_u == 0


def test_contamination_report_coheres_with_decontaminate(spark):
    """Cross-op coherence: the union of per-set hit docs IS the set
    ext_decontaminate drops — train count minus survivors equals the
    distinct contaminated-doc count across eval sets, and each set's
    n_hit_docs is bounded by it. ppm re-derives from the row's own
    count and the train total."""
    from duckdb_data_eng_proj_spark.queries import REGISTRY
    from duckdb_data_eng_proj_spark.queries.registry import t
    from duckdb_data_eng_proj_spark.operators.textops import tokens, word_ngrams

    report = {
        r.eval_set: r
        for r in REGISTRY["ext_contamination_report"].fn(spark, SF_DIR).collect()
    }
    d = t(spark, SF_DIR, "documents")
    n_train = d.filter(F.col("doc_id") % 50 != 0).count()
    survivors = REGISTRY["ext_decontaminate"].fn(spark, SF_DIR).count()
    # union of contaminated docs, recomputed without set labels
    eval_g = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(word_ngrams(tokens(F.col("text")), 5)).alias("g"))
        .distinct()
    )
    union_hits = (
        d.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", F.explode(word_ngrams(tokens(F.col("text")), 5)).alias("g"))
        .join(eval_g, "g")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_train - survivors == union_hits
    assert max(r.n_hit_docs for r in report.values()) <= union_hits
    for r in report.values():
        assert r.hit_docs_ppm == r.n_hit_docs * 1000000 // n_train
        assert r.n_hit_grams <= r.n_eval_grams


def _fold_dot_py(a, b):
    """Left fold in doubles — the exact order both engines use."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def test_ivf_rebalance_python_replay(spark):
    """Full single-threaded replay: assignment, thresholds, farthest
    member, split move counts, nearest sibling — bit-identical fold
    cosines, identical tie-breaks, identical integer thresholds."""
    from duckdb_data_eng_proj_spark.queries import REGISTRY
    from duckdb_data_eng_proj_spark.queries.extras_r18 import (
        _REB_DIM,
        _REB_K,
        _REB_SEED_LIMIT,
    )

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in tbl
        if len(r["embedding"]) == _REB_DIM
    }
    nrm = {v: math.sqrt(_fold_dot_py(e, e)) for v, e in vecs.items()}
    cents = {
        v: e
        for v, e in vecs.items()
        if v < _REB_SEED_LIMIT and v % 3 != 0 and nrm[v] > 0
    }
    # assignment: (cos DESC, cid) argmax
    asg = {}  # vec_id -> (cid, cos)
    for v, e in vecs.items():
        if nrm[v] <= 0:
            continue
        best = min(
            (
                (-(_fold_dot_py(e, ce) / (nrm[v] * nrm[c])), c)
                for c, ce in cents.items()
            )
        )
        asg[v] = (best[1], -best[0])
    cells = {c: [] for c in cents}
    for v, (c, cos) in asg.items():
        cells[c].append((v, cos))
    total = sum(len(m) for m in cells.values())
    balanced = (total + _REB_K - 1) // _REB_K
    expected = []
    for c in sorted(cents):
        n = len(cells[c])
        if 4 * n > 5 * balanced:
            action = "split"
            f_vid = min(cells[c], key=lambda r: (r[1], r[0]))[0]
            fe, fn_ = vecs[f_vid], nrm[f_vid]
            moved = sum(
                1
                for v, cos in cells[c]
                if _fold_dot_py(vecs[v], fe) / (nrm[v] * fn_) > cos
            )
            expected.append((c, n, action, f_vid, moved))
        elif 4 * n < 3 * balanced:
            pid = min(
                (
                    (-(_fold_dot_py(cents[c], ce) / (nrm[c] * nrm[o])), o)
                    for o, ce in cents.items()
                    if o != c
                )
            )[1]
            expected.append((c, n, "merge", pid, n))
        else:
            expected.append((c, n, "keep", None, 0))
    got = [
        tuple(r)
        for r in REGISTRY["sim_ann_ivf_rebalance"].fn(spark, SF_DIR).collect()
    ]
    assert sorted(got) == sorted(
        (c, n, a, p, m) for c, n, a, p, m in expected
    )


def test_ivf_rebalance_actions_fire_on_testdata(spark):
    """The thresholds must actually exercise all three arms on the
    generated data (an all-keep report would certify nothing)."""
    from duckdb_data_eng_proj_spark.queries import REGISTRY

    acts = {
        r.action
        for r in REGISTRY["sim_ann_ivf_rebalance"].fn(spark, SF_DIR).collect()
    }
    assert "keep" in acts and ("split" in acts or "merge" in acts), acts


@pytest.mark.parametrize(
    "qid,budget",
    [
        # postings-sized exchanges only: stage-1 distinct+agg+rank,
        # pair-min agg; the candidate table broadcasts back
        ("txt_rerank_proximity", 4),
        # hits-side double countDistinct (expand) dominates; every
        # corpus-scale exchange output is benchmark- or hit-sized
        ("ext_contamination_report", 7),
        # percell agg + 16-row window + moved agg + grid window +
        # result-sized assembly
        ("sim_ann_ivf_rebalance", 6),
    ],
)
def test_r18_op_exchange_budget(spark, qid, budget):
    from duckdb_data_eng_proj_spark.plans import count_exchanges
    from duckdb_data_eng_proj_spark.queries import REGISTRY

    df = REGISTRY[qid].fn(spark, SF_DIR)
    n = count_exchanges(df)
    assert n <= budget, f"{qid}: {n} exchanges > budget {budget}"


# ---------------------------------------------------------------------------
# ADVICE r17 item 4: the shared shortest-repr round wrapper
# CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), d) AS DOUBLE)
# HARD-ABORTS the DuckDB oracle when x is non-finite ('nan'/'inf'
# fail the DECIMAL parse) or |x| >= ~1e20 (DECIMAL(38,18) overflow).
# That abort is the INTENDED loud failure, not a bug: every site that
# can see a non-finite value guards it explicitly (the r17 degenerate-
# variance rule NULLs corr/slope/wavg when the defining variance is
# not positive), so a wrapper abort means a NEW unguarded non-finite
# path appeared — a value divergence about to hide. This pin
# documents the contract so the abort is never "fixed" into silence.

_R17_WRAP = "CAST(round(CAST(CAST({x} AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE)"


@pytest.mark.parametrize(
    "bad", ["CAST('nan' AS DOUBLE)", "CAST('inf' AS DOUBLE)", "1e25"]
)
def test_round_wrapper_aborts_loudly_on_nonfinite(bad):
    con = duckdb.connect()
    try:
        with pytest.raises(Exception) as exc:
            con.execute(f"SELECT {_R17_WRAP.format(x=bad)}").fetchall()
        assert "Conversion" in type(exc.value).__name__ or "onversion" in str(
            exc.value
        ) or "out of range" in str(exc.value).lower(), exc.value
    finally:
        con.close()


def test_round_wrapper_exact_on_finite_values():
    """The wrapper is byte-for-byte the adopted oracle form on finite
    doubles — including the repro value the r17 decision was made on."""
    con = duckdb.connect()
    try:
        (v,) = con.execute(
            f"SELECT {_R17_WRAP.format(x='0.28499999999999998')}"
        ).fetchone()
        assert v == 0.285  # shortest-repr HALF_UP, Spark's semantics
    finally:
        con.close()


# ---------------------------------------------------------------------------
# r18 new-op hostile-vintage cross-engine laws (the r17 pattern:
# the sweep certifies the whole registry once per round; these pin
# the three new ops' hostile behavior in the permanent suite —
# blank/whitespace/punctuation-only/NULL text for the two text ops,
# a zero-norm and an off-contract 32-dim embedding for the IVF op).


@pytest.fixture(scope="module")
def r18_hostile_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("r18_hostile")


def _write_hostile_tables(spark, base):
    docs = []
    terms = ["join", "merge", "hash", "scan", "filter", "table"]
    for i in range(60):
        if i % 7 == 0:
            text = None
        elif i % 7 == 1:
            text = ""
        elif i % 7 == 2:
            text = "   "
        elif i % 7 == 3:
            text = "!!! ??? ..."
        elif i % 7 == 4:
            text = terms[i % len(terms)]  # single-term doc
        else:
            text = " ".join(terms[(i + k) % len(terms)] for k in range(8))
        docs.append((i, text, "en", "web", len(text or "")))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    embs = []
    for v in range(40):
        if v == 5:
            emb = [0.0] * 64  # zero norm, on-contract dim
        elif v == 9:
            emb = [float((v * 7 + k) % 13) / 4.0 for k in range(32)]  # off-dim
        else:
            emb = [float((v * 31 + k * 3) % 17) / 8.0 - 1.0 for k in range(64)]
        embs.append((v, emb, v % 4))
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")


def _both_engines(spark, base, qid):
    spec = REGISTRY[qid]
    got = sorted(
        tuple(None if v is None else v for v in r)
        for r in spec.fn(spark, str(base))
        .select(*sorted(spec.fn(spark, str(base)).columns))
        .collect()
    )
    con = duckdb.connect()
    for t_ in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t_} AS SELECT * FROM "
            f"read_parquet('{base}/{t_}.parquet/*.parquet')"
        )
    cur = con.execute(spec.oracle)
    cols = [x[0] for x in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    return got, want


@pytest.mark.parametrize(
    "qid",
    ["txt_rerank_proximity", "ext_contamination_report", "sim_ann_ivf_rebalance"],
)
def test_r18_ops_hostile_vintage_cross_engine(spark, r18_hostile_dir, qid):
    base = r18_hostile_dir / qid
    _write_hostile_tables(spark, str(base))
    got, want = _both_engines(spark, base, qid)
    assert got == want, (got[:3], want[:3])
