"""Algorithmic laws for the round-14 operators (the BPE tokenizer
story end-to-end).

Same adversarial posture as tests/test_r13_laws.py: the oracle rows
prove cross-engine equality; these tests prove the shared definition
is the RIGHT one, via independent pure-Python replays and structural
laws on sf0.001.

- txt_bpe_train: full pure-Python replay of the 6-merge trainer
  (weighted adjacent-pair argmax, greedy non-overlapping merge,
  measured distinct-symbol inventory per round), plus structural laws
  (merged = sym_a || sym_b; pair_freq monotone non-increasing;
  tokens_after strictly decreasing with theorem-grade conservation
  when sym_a != sym_b; vocab_symbols bounded by charset + rank) and
  the PREFIX law: rounds 1-3 of the trainer equal txt_bpe_apply's
  ledger row-for-row (same argmax path — the trainer extends, never
  diverges).
- txt_bpe_encode_docs: full pure-Python replay of the per-document
  encode (fold every word through the 3 learned merges in rank
  order), plus the cross-op CONSERVATION law: summed per-document
  encoded lengths equal the vocab-side corpus token count
  txt_bpe_apply reports after round 3 (the two ops measure the same
  quantity from opposite sides), summed chars_total equals the
  pre-merge corpus symbol count, and per-row sanity
  (n_words <= toks_encoded <= chars_total, saved_permille exact).
"""

from __future__ import annotations

from collections import Counter

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r14 import (
    _BPE_TRAIN_MERGES,
    _ENC_ROUNDS,
)
from duckdb_data_eng_proj_spark.queries.training import _TOKS_CTE
from tests.conftest import SF_DIR
from tests.test_r13_laws import _bpe_merge_word, _py_tokens


def _train_replay(oracle_con, rounds):
    """Pure-Python BPE trainer: returns (per-round rows, final
    word->symbols state). Row = (rank, a, b, merged, pair_freq,
    vocab_symbols, tokens_after)."""
    docs = oracle_con.execute("SELECT text FROM documents").fetchall()
    vocab = Counter()
    for (tx,) in docs:
        for w in _py_tokens(tx):
            if "\x1f" not in w:
                vocab[w] += 1
    state = {w: list(w) for w in vocab}
    rows = []
    for r in range(1, rounds + 1):
        pf = Counter()
        for w, syms in state.items():
            c = vocab[w]
            for x, y in zip(syms, syms[1:]):
                pf[(x, y)] += c
        (a, b), f = min(pf.items(), key=lambda kv: (-kv[1], kv[0]))
        state = {w: _bpe_merge_word(s, a, b) for w, s in state.items()}
        toks = sum(vocab[w] * len(s) for w, s in state.items())
        syms = {x for s in state.values() for x in s}
        rows.append((r, a, b, a + b, f, len(syms), toks))
    return rows, state, vocab


def test_bpe_train_python_replay(spark, oracle_con):
    got = sorted(
        (
            r.merge_rank,
            r.sym_a,
            r.sym_b,
            r.merged,
            r.pair_freq,
            r.vocab_symbols,
            r.tokens_after,
        )
        for r in REGISTRY["txt_bpe_train"].fn(spark, SF_DIR).collect()
    )
    want, _, _ = _train_replay(oracle_con, _BPE_TRAIN_MERGES)
    assert got == want


def test_bpe_train_structural_laws(spark, oracle_con):
    rows = sorted(
        REGISTRY["txt_bpe_train"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.merge_rank,
    )
    assert [r.merge_rank for r in rows] == list(
        range(1, _BPE_TRAIN_MERGES + 1)
    )
    # chars0/charset0 derive from the SHARED production tokenizer CTE
    # (with v0's chr(31) word filter), not an inline re-spelling, so a
    # tokenizer change can't leave the law testing a stale definition
    # (ADVICE r14).
    (chars0,) = oracle_con.execute(
        f"WITH {_TOKS_CTE}, "
        "u AS (SELECT unnest(tk) AS w FROM toks) "
        "SELECT CAST(SUM(len(w)) AS BIGINT) FROM u "
        "WHERE NOT contains(w, chr(31))"
    ).fetchone()
    (charset0,) = oracle_con.execute(
        f"WITH {_TOKS_CTE}, "
        "u AS (SELECT unnest(tk) AS w FROM toks) "
        "SELECT COUNT(DISTINCT ch) FROM "
        "(SELECT unnest(string_split(w, '')) AS ch FROM u "
        "WHERE NOT contains(w, chr(31)))"
    ).fetchone()
    prev, prev_f = chars0, None
    for r in rows:
        assert r.merged == r.sym_a + r.sym_b, r
        # conservation (theorem when sym_a != sym_b, bound otherwise
        # — the self-overlap subtlety, ADVICE r13)
        assert prev - r.pair_freq <= r.tokens_after < prev, r
        if r.sym_a != r.sym_b:
            assert r.tokens_after == prev - r.pair_freq, r
        prev = r.tokens_after
        if prev_f is not None:
            assert r.pair_freq <= prev_f, r
        prev_f = r.pair_freq
        # each merge mints at most one new symbol and retires 0-2
        assert r.vocab_symbols <= charset0 + r.merge_rank, r
        assert r.pair_freq > 0, r


def test_bpe_train_prefix_equals_apply_ledger(spark):
    """Rounds 1-N of the trainer follow the SAME argmax path as
    txt_bpe_apply — the learned table is an extension, not a fork."""
    train = {
        r.merge_rank: (r.sym_a, r.sym_b, r.pair_freq, r.tokens_after)
        for r in REGISTRY["txt_bpe_train"].fn(spark, SF_DIR).collect()
    }
    apply_ = {
        r.round: (r.sym_a, r.sym_b, r.pair_freq, r.tokens_after)
        for r in REGISTRY["txt_bpe_apply"].fn(spark, SF_DIR).collect()
    }
    for r, row in apply_.items():
        assert train[r] == row, (r, train[r], row)


# ---------------------------------------------------------------------------
# txt_bpe_encode_docs


def test_bpe_encode_python_replay(spark, oracle_con):
    _, state, _ = _train_replay(oracle_con, _ENC_ROUNDS)
    docs = oracle_con.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, tx in docs:
        words = [w for w in _py_tokens(tx) if "\x1f" not in w]
        if not words:
            continue
        chars = sum(len(w) for w in words)
        toks = sum(len(state[w]) for w in words)
        want[doc_id] = (
            len(words),
            chars,
            toks,
            ((chars - toks) * 1000) // chars,
        )
    got = {
        r.doc_id: (r.n_words, r.chars_total, r.toks_encoded, r.saved_permille)
        for r in REGISTRY["txt_bpe_encode_docs"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_bpe_encode_conservation(spark):
    """The two sides of the same quantity: Σ per-doc encoded lengths
    == the vocab-side corpus token count after the last merge
    (txt_bpe_apply round N), and Σ chars_total == its round-0 input.
    A fold or join bug on either side breaks the equality."""
    enc = REGISTRY["txt_bpe_encode_docs"].fn(spark, SF_DIR).collect()
    ledger = sorted(
        REGISTRY["txt_bpe_apply"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert sum(r.toks_encoded for r in enc) == ledger[-1].tokens_after
    # round-0 tokens = chars: reconstruct from the conservation chain
    toks0 = ledger[0].tokens_after + ledger[0].pair_freq
    # round 1's merge may self-overlap (freq overcounts), so chain
    # gives a lower bound; equality via the per-row law instead
    assert sum(r.chars_total for r in enc) >= toks0
    for r in enc:
        assert 1 <= r.n_words <= r.toks_encoded <= r.chars_total, r
        assert (
            r.saved_permille
            == ((r.chars_total - r.toks_encoded) * 1000) // r.chars_total
        ), r
        assert 0 <= r.saved_permille < 1000, r


# ---------------------------------------------------------------------------
# join_interval_overlap


def test_interval_overlap_python_replay(spark, oracle_con):
    """Brute-force O(n²)-per-key replay vs the binned equi-join plan:
    proves the grid-cell decomposition + first-cell dedup rule count
    each overlapping pair EXACTLY once (the rule is the only thing
    standing between the plan and double counting — a pair spanning
    2-3 shared cells appears once per shared cell before the filter)."""
    from datetime import date

    rows = oracle_con.execute(
        "SELECT l_suppkey, l_orderkey * 10 + l_linenumber, "
        "CAST(l_shipdate AS DATE), l_partkey FROM lineitem"
    ).fetchall()
    epoch = date(1992, 1, 1)
    by_k = {}
    for k, iid, ship, pk in rows:
        s = (ship - epoch).days
        by_k.setdefault(k, []).append((iid, s, s + 1 + pk % 21))
    want = {}
    for k, ivs in by_k.items():
        n = tot = 0
        ivs = sorted(ivs)
        for i in range(len(ivs)):
            for j in range(i + 1, len(ivs)):
                (_, sa, ea), (_, sb, eb) = ivs[i], ivs[j]
                if sa <= eb and sb <= ea:
                    n += 1
                    tot += min(ea, eb) - max(sa, sb) + 1
        if n:
            want[k] = (n, tot)
    got = {
        r.suppkey: (r.n_pairs, r.overlap_days)
        for r in REGISTRY["join_interval_overlap"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_interval_overlap_structural_laws(spark):
    rows = REGISTRY["join_interval_overlap"].fn(spark, SF_DIR).collect()
    assert rows, "sf0.001 must produce overlapping transit pairs"
    for r in rows:
        # closed intervals: every overlapping pair shares >= 1 day,
        # and widths are <= 22 days so overlap <= 22 days per pair
        assert r.n_pairs >= 1, r
        assert r.n_pairs <= r.overlap_days <= 22 * r.n_pairs, r
