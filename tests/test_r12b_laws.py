"""Algorithmic laws for the round-12 second-batch operators.

Same adversarial posture as tests/test_r11_laws.py / test_r12_laws.py:
the oracle rows prove cross-engine equality; these tests prove the
shared definition is the RIGHT one, via independent pure-Python
replays and structural laws on sf0.001.

- ts_autocorr: full pure-Python replay (dense hourly series, exact
  integer moments, the same left-to-right double scalar math), the
  pair-count law n_pairs = n_hours - lag, and the |acf| <= 1 bound.
- txt_bpe_merge_round: full pure-Python replay (regex pretokenize ->
  Counter vocab -> positional pair counts + non-overlapping replace
  saves -> (count DESC, pair ASC) rank), plus the structural
  positional-vs-replace inequalities.
- graph_bfs_seed_distance: full Python BFS replay over the operator's
  own verified pair graph, the seed law (level 0 = exactly the
  doc_id % 11 = 0 docs), and the min-level frontier law (every
  level-k node has a level-(k-1) neighbor and none closer).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r6 import _PRETOK_RE
from duckdb_data_eng_proj_spark.queries.extras_r12b import (
    _ACF_LAGS,
    _BFS_ROUNDS,
    _BFS_SEED_MOD,
    _BFS_THR,
    _BPE_TOP,
)
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# ts_autocorr


def _hourly_series(oracle_con):
    """Dense per-type hourly count series, replayed independently."""
    rows = oracle_con.execute(
        "SELECT event_type, date_trunc('hour', ts) AS b, COUNT(*) AS c "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    by_type = defaultdict(dict)
    for et, b, c in rows:
        by_type[et][b] = c
    series = {}
    for et, d in by_type.items():
        lo, hi = min(d), max(d)
        out, cur = [], lo
        while cur <= hi:
            out.append(d.get(cur, 0))
            cur += timedelta(hours=1)
        series[et] = out
    return series


def _acf_exact(xs, k):
    """Replay of the operator's scalar math: exact integer moments,
    then the identical double expression order."""
    pairs = [(xs[i - k], xs[i]) for i in range(k, len(xs))]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = float(sum(x * y for x, y in pairs))
    sxx = float(sum(x * x for x, _ in pairs))
    syy = float(sum(y * y for _, y in pairs))
    vx = sxx - float(sx) * sx / n
    vy = syy - float(sy) * sy / n
    if not (vx > 0 and vy > 0):
        return n, None
    cov = sxy - float(sx) * sy / n
    return n, cov / math.sqrt(vx * vy)


def test_autocorr_python_replay(spark, oracle_con):
    got = {
        (r.event_type, r.lag): r
        for r in REGISTRY["ts_autocorr"].fn(spark, SF_DIR).collect()
    }
    series = _hourly_series(oracle_con)
    expected_keys = set()
    for et, xs in series.items():
        for k in _ACF_LAGS:
            if len(xs) <= k:
                continue
            expected_keys.add((et, k))
            n, acf = _acf_exact(xs, k)
            r = got[(et, k)]
            assert r.n_pairs == n == len(xs) - k
            if acf is None:
                assert r.acf is None
            else:
                assert abs(r.acf - acf) <= 1e-6, (et, k, r.acf, acf)
    assert set(got) == expected_keys


def test_autocorr_bounds_and_ordering(spark):
    rows = REGISTRY["ts_autocorr"].fn(spark, SF_DIR).collect()
    assert rows, "sf0.001 must produce at least one (type, lag) row"
    assert rows == sorted(rows, key=lambda r: (r.event_type, r.lag))
    for r in rows:
        assert r.lag in _ACF_LAGS
        assert r.n_pairs >= 1
        if r.acf is not None:
            # rounding to 6 decimals can graze the bound by <= 5e-7
            assert abs(r.acf) <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# txt_bpe_merge_round


def _bpe_replay(oracle_con):
    texts = [
        t for (t,) in oracle_con.execute("SELECT text FROM documents").fetchall()
    ]
    rx = re.compile(_PRETOK_RE)
    vocab = Counter()
    for txt in texts:
        # SQL trim() strips spaces only — not \n\t — so replay must too
        for w in rx.findall(txt.lower().strip(" ")):
            if len(w) >= 2:
                vocab[w] += 1
    pair_count = Counter()
    vocab_words = Counter()
    tokens_saved = Counter()
    for w, freq in vocab.items():
        pairs_in_w = Counter(w[i : i + 2] for i in range(len(w) - 1))
        for p, pc in pairs_in_w.items():
            pair_count[p] += freq * pc
            vocab_words[p] += 1
            tokens_saved[p] += freq * ((len(w) - len(w.replace(p, ""))) // 2)
    ranked = sorted(pair_count, key=lambda p: (-pair_count[p], p))[:_BPE_TOP]
    return [
        (i + 1, p, pair_count[p], vocab_words[p], tokens_saved[p])
        for i, p in enumerate(ranked)
    ]


def test_bpe_merge_round_python_replay(spark, oracle_con):
    got = [
        (r.rank, r.pair, r.pair_count, r.vocab_words, r.tokens_saved)
        for r in REGISTRY["txt_bpe_merge_round"].fn(spark, SF_DIR).collect()
    ]
    assert got == _bpe_replay(oracle_con)


def test_bpe_merge_round_structural_laws(spark):
    rows = REGISTRY["txt_bpe_merge_round"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= _BPE_TOP
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # rank order is (count DESC, pair ASC)
    keyed = [(-r.pair_count, r.pair) for r in rows]
    assert keyed == sorted(keyed)
    for r in rows:
        assert len(r.pair) == 2
        # non-overlapping merge saves never exceed positional counts,
        # and a pair occurs at least once in each vocab word counted
        assert 1 <= r.tokens_saved <= r.pair_count
        assert 1 <= r.vocab_words <= r.pair_count


# ---------------------------------------------------------------------------
# graph_bfs_seed_distance


def _python_bfs(edges, seeds, rounds):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lvl = {s: 0 for s in seeds}
    frontier = set(seeds)
    for i in range(1, rounds + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj[u]
        nxt -= lvl.keys()
        for v in nxt:
            lvl[v] = i
        frontier = nxt
    return lvl


def test_bfs_python_replay(spark):
    from duckdb_data_eng_proj_spark.queries.corpus import _near_dup_pairs
    from duckdb_data_eng_proj_spark.queries.registry import t

    got = {
        r.doc_id: r.lvl
        for r in REGISTRY["graph_bfs_seed_distance"].fn(spark, SF_DIR).collect()
    }
    edges = [
        (r.doc_a, r.doc_b)
        for r in _near_dup_pairs(spark, SF_DIR, _BFS_THR).collect()
    ]
    seeds = [
        r.doc_id
        for r in t(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % _BFS_SEED_MOD == 0)
        .collect()
    ]
    assert got == _python_bfs(edges, seeds, _BFS_ROUNDS)
    # the sf0.001 graph must actually exercise expansion
    assert max(got.values()) >= 1


def test_bfs_seed_and_frontier_laws(spark):
    from duckdb_data_eng_proj_spark.queries.corpus import _near_dup_pairs
    from duckdb_data_eng_proj_spark.queries.registry import t

    rows = REGISTRY["graph_bfs_seed_distance"].fn(spark, SF_DIR).collect()
    lvl = {r.doc_id: r.lvl for r in rows}
    seeds = {
        r.doc_id
        for r in t(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % _BFS_SEED_MOD == 0)
        .collect()
    }
    # level 0 is exactly the seed set (isolated seeds included)
    assert {d for d, v in lvl.items() if v == 0} == seeds
    adj = defaultdict(set)
    for r in _near_dup_pairs(spark, SF_DIR, _BFS_THR).collect():
        adj[r.doc_a].add(r.doc_b)
        adj[r.doc_b].add(r.doc_a)
    for d, v in lvl.items():
        if v == 0:
            continue
        neigh = {lvl[n] for n in adj[d] if n in lvl}
        # reached the first possible round: a (v-1)-neighbor exists,
        # and nothing closer than v-1 (else it would be level < v)
        assert v - 1 in neigh, (d, v, neigh)
        assert not any(n < v - 1 for n in neigh), (d, v, neigh)
        assert 1 <= v <= _BFS_ROUNDS
