"""Algorithmic laws for the round-12 third-batch operators.

Same adversarial posture as tests/test_r12_laws.py / test_r12b_laws.py:
the oracle rows prove cross-engine equality; these tests prove the
shared definition is the RIGHT one, via independent pure-Python
replays and structural laws on sf0.001.

- txt_bm25_topk: full pure-Python replay (whitespace tokenize ->
  dl/tt/n + query-term tf/df -> the identical per-term double
  expression trees -> floor to micro-units -> exact integer sum ->
  (score DESC, doc_id) rank), plus monotonicity/structure laws
  (ranks dense from 1, idf positivity, n_terms bounded by the
  query's term count).
- agg_assoc_pairs: full pure-Python replay (distinct basket-item
  pairs -> a-priori support floor -> per-basket pair counts ->
  exact integer floor-division metrics -> (lift DESC, item_a,
  item_b) top-50), plus the a-priori law (every output item clears
  the support floor), the bound law pair_baskets <= min(a_baskets,
  b_baskets), and conf >= support.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from itertools import combinations

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r12c import (
    _ASSOC_MIN_PAIR,
    _ASSOC_SUP_PERMILLE,
    _ASSOC_TOPK,
    _BM25_K,
    _BM25_QUERIES,
    _BM25_TERMS,
)
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# txt_bm25_topk


def _py_tokens(text):
    if text is None:
        return []
    return [w for w in re.split(r"\s+", text.lower().strip()) if w != ""]


def _bm25_replay(oracle_con):
    """Independent replay of the whole operator in pure Python."""
    docs = oracle_con.execute("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: _py_tokens(tx) for d, tx in docs}
    dl = {d: len(tk) for d, tk in toks.items() if tk}
    n = len(dl)
    tt = sum(dl.values())
    tf = defaultdict(Counter)  # doc -> term -> tf
    dfc = Counter()  # term -> df
    for d, tk in toks.items():
        hits = [w for w in tk if w in _BM25_TERMS]
        c = Counter(hits)
        for w, k in c.items():
            tf[d][w] = k
            dfc[w] += 1
    out = {}
    for qid, ws in _BM25_QUERIES:
        scored = []
        for d, c in tf.items():
            score_u = 0
            n_terms = 0
            for w in ws:
                if w not in c:
                    continue
                n_terms += 1
                tfd, dfd, dld = float(c[w]), float(dfc[w]), float(dl[d])
                nd, ttd = float(n), float(tt)
                idf = ((2.0 * nd) - (2.0 * dfd) + 1.0) / ((2.0 * dfd) + 1.0)
                sat = (tfd * 2.2) / (
                    tfd + (1.2 * (0.25 + (((0.75 * dld) * nd) / ttd)))
                )
                score_u += math.floor((idf * sat) * 1000000.0)
            if n_terms:
                scored.append((d, n_terms, score_u))
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rk, (d, n_terms, score_u) in enumerate(scored[:_BM25_K], 1):
            out[(qid, d)] = (n_terms, score_u, rk)
    return out


def test_bm25_python_replay(spark, oracle_con):
    got = {
        (r.query_id, r.doc_id): (r.n_terms, r.score_u, r.rk)
        for r in REGISTRY["txt_bm25_topk"].fn(spark, SF_DIR).collect()
    }
    assert got == _bm25_replay(oracle_con)


def test_bm25_structure(spark):
    rows = REGISTRY["txt_bm25_topk"].fn(spark, SF_DIR).collect()
    assert rows, "sf0.001 must rank at least one doc"
    qterms = dict(_BM25_QUERIES)
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
        # rational idf is strictly positive, saturation is positive,
        # so every matched term contributes a non-negative floor
        assert r.score_u >= 0
        assert 1 <= r.n_terms <= len(qterms[r.query_id])
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BM25_K
        # ranks follow (score DESC, doc_id) — no inversions
        for a, b in zip(rs, rs[1:]):
            assert (a.score_u, -a.doc_id) >= (b.score_u, -b.doc_id) or (
                a.score_u > b.score_u
            ) or (a.score_u == b.score_u and a.doc_id < b.doc_id)


# ---------------------------------------------------------------------------
# agg_assoc_pairs


def _assoc_replay(oracle_con):
    pairs_raw = oracle_con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    item_n = Counter()
    for bk, it in pairs_raw:
        if it not in baskets[bk]:
            baskets[bk].add(it)
            item_n[it] += 1
    nb = len(baskets)
    freq = {
        it: c
        for it, c in item_n.items()
        if c * 1000 >= nb * _ASSOC_SUP_PERMILLE
    }
    pc = Counter()
    for items in baskets.values():
        kept = sorted(it for it in items if it in freq)
        for a, b in combinations(kept, 2):
            pc[(a, b)] += 1
    rows = []
    for (a, b), k in pc.items():
        if k < _ASSOC_MIN_PAIR:
            continue
        ca, cb = freq[a], freq[b]
        rows.append(
            (
                a,
                b,
                k,
                ca,
                cb,
                (k * 1000000) // nb,
                (k * 1000000) // ca,
                (k * 1000000) // cb,
                ((k * nb) * 1000000) // (ca * cb),
            )
        )
    rows.sort(key=lambda r: (-r[8], r[0], r[1]))
    return rows[:_ASSOC_TOPK]


def test_assoc_python_replay(spark, oracle_con):
    got = [
        (
            r.item_a,
            r.item_b,
            r.pair_baskets,
            r.a_baskets,
            r.b_baskets,
            r.support_u,
            r.conf_ab_u,
            r.conf_ba_u,
            r.lift_u,
        )
        for r in REGISTRY["agg_assoc_pairs"].fn(spark, SF_DIR).collect()
    ]
    assert got == _assoc_replay(oracle_con)


def test_assoc_laws(spark, oracle_con):
    rows = REGISTRY["agg_assoc_pairs"].fn(spark, SF_DIR).collect()
    nb = oracle_con.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()[0]
    for r in rows:
        assert r.item_a < r.item_b
        # a pair can't outnumber either member (containment bound)
        assert r.pair_baskets <= min(r.a_baskets, r.b_baskets)
        assert r.pair_baskets >= _ASSOC_MIN_PAIR
        # a-priori floor: both members are frequent
        assert r.a_baskets * 1000 >= nb * _ASSOC_SUP_PERMILLE
        assert r.b_baskets * 1000 >= nb * _ASSOC_SUP_PERMILLE
        # confidence >= support (a_baskets <= nb), both capped at 1e6
        assert r.support_u <= r.conf_ab_u <= 1000000
        assert r.support_u <= r.conf_ba_u <= 1000000


# ---------------------------------------------------------------------------
# ml_perceptron_round


def _perceptron_replay(oracle_con):
    """Independent pure-Python replay of both unrolled rounds."""
    from duckdb_data_eng_proj_spark.queries.extras_r12c import (
        _PCT_DIM,
        _PCT_POS,
    )

    rows = oracle_con.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    pts = []
    for vid, label, emb in rows:
        if len(emb) != _PCT_DIM:
            continue
        yy = 1 if label == _PCT_POS else -1
        xu = [math.floor(float(x) * 1000000.0) for x in emb]
        pts.append((vid, yy, xu))
    w1 = [0] * _PCT_DIM
    for _, yy, xu in pts:
        for d in range(_PCT_DIM):
            w1[d] += yy * xu[d]
    mis = [
        (vid, yy, xu)
        for vid, yy, xu in pts
        if yy * sum(w1[d] * xu[d] for d in range(_PCT_DIM)) <= 0
    ]
    w2 = list(w1)
    for _, yy, xu in mis:
        for d in range(_PCT_DIM):
            w2[d] += yy * xu[d]
    return w1, w2, len(mis)


def test_perceptron_python_replay(spark, oracle_con):
    got = REGISTRY["ml_perceptron_round"].fn(spark, SF_DIR).collect()
    w1, w2, nm = _perceptron_replay(oracle_con)
    assert [r.dim for r in got] == list(range(len(w1)))
    for r in got:
        assert r.w1_u == w1[r.dim], (r.dim, r.w1_u, w1[r.dim])
        assert r.w2_u == w2[r.dim], (r.dim, r.w2_u, w2[r.dim])
        assert r.n_miscls == nm


def test_perceptron_update_law(spark):
    """w2 - w1 must be exactly the mistake-set signed feature sum; in
    particular w2 == w1 iff no vector is misclassified by w1 — and
    with w0 = 0 round 1 counts EVERY vector as a mistake, so w1 is
    never the zero update unless the table is empty."""
    rows = REGISTRY["ml_perceptron_round"].fn(spark, SF_DIR).collect()
    assert rows, "sf0.001 embeddings must train"
    nm = rows[0].n_miscls
    assert all(r.n_miscls == nm for r in rows)
    if nm == 0:
        assert all(r.w2_u == r.w1_u for r in rows)
    else:
        assert any(r.w2_u != r.w1_u for r in rows)
