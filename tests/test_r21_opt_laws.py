"""Laws pinning the r21 optimization rewrites.

Two rewrites this round change HOW a result is computed, never WHAT:

1. `training._lsh_cand_pairs` replaces the bands-self-join-then-
   DISTINCT candidate generation with the FIRST-MATCH-BAND predicate
   over a single checkpointed band table (the r20 corpus._near_dup_pairs
   pattern): a pair agreeing in several bands is emitted only at its
   smallest agreeing band, so no DISTINCT is needed. The law: for any
   assignment of per-doc band buckets, {(a, b): some band agrees} under
   first-match equals the DISTINCT of all agreeing (band) matches.

2. txt_longest_common_substring's gaps-and-islands window partitions
   by (doc_a, doc_b) ordering by (diag, ia) instead of partitioning by
   (doc_a, doc_b, diag) ordering by ia. The law: the per-diagonal run
   multiset (and hence max run per pair) is identical, because within
   one diagonal the pair-wide row_number is the per-diagonal row_number
   plus a constant, and `diag` stays in the downstream group key.

Both also carry exact sf0.1 equality evidence (exceptAll both ways
empty: 72228 candidate pairs; 15629 LCS rows) and oracle hash matches —
these tests pin the combinatorial argument itself so a future edit
cannot silently break it.
"""

from __future__ import annotations

import random
from collections import defaultdict


# ---------------------------------------------------------------------------
# 1. first-match-band == DISTINCT over agreeing bands


def _distinct_pairs(buckets: dict) -> set:
    """buckets: doc_id -> tuple of per-band buckets (None = no bucket).
    The DISTINCT form: every (a < b) pair agreeing in >= 1 band."""
    out = set()
    docs = sorted(buckets)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            for ba, bb in zip(buckets[a], buckets[b]):
                if ba is not None and ba == bb:
                    out.add((a, b))
                    break
    return out


def _first_match_pairs(buckets: dict) -> list:
    """The first-match-band form, as a list (must contain NO duplicates):
    emit (a, b) at band k iff band k agrees and no band j < k agrees."""
    out = []
    docs = sorted(buckets)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            for k, (ba, bb) in enumerate(zip(buckets[a], buckets[b])):
                if ba is None or ba != bb:
                    continue
                if any(
                    buckets[a][j] is not None
                    and buckets[a][j] == buckets[b][j]
                    for j in range(k)
                ):
                    continue  # suppressed: a smaller band already agrees
                out.append((a, b))
    return out


def test_first_match_band_equals_distinct():
    rng = random.Random(21)
    for trial in range(200):
        n_docs = rng.randint(0, 12)
        n_bands = rng.choice([1, 2, 4])
        n_buckets = rng.randint(1, 4)  # small → many collisions
        buckets = {}
        for d in range(n_docs):
            if rng.random() < 0.1:
                buckets[d] = (None,) * n_bands  # empty shingle set doc
            else:
                buckets[d] = tuple(
                    f"v{rng.randrange(n_buckets)}" for _ in range(n_bands)
                )
        fm = _first_match_pairs(buckets)
        assert len(fm) == len(set(fm)), "first-match emitted a duplicate"
        assert set(fm) == _distinct_pairs(buckets), (trial, buckets)


def test_first_match_band_respects_all_null_rule():
    # A doc whose buckets are all None (empty shingle set) never pairs:
    # the band table filter drops its rows entirely, which the helper's
    # docstring relies on ("buckets are all-null or all-non-null per
    # doc"). Mixed null/non-null inputs are unreachable from the
    # operator (every h_j is null iff the shingle set is empty), so the
    # law only needs the all-or-nothing case.
    buckets = {0: (None, None), 1: (None, None), 2: ("x", "y")}
    assert _first_match_pairs(buckets) == []
    assert _distinct_pairs(buckets) == set()


# ---------------------------------------------------------------------------
# 2. LCS pair-wide window identity


def _max_run_per_diag_window(matches: list) -> dict:
    """The OLD tail: row_number per (diag) partition ordered by ia;
    grp = ia - rn; max group count. matches: list of (diag, ia) for ONE
    pair, (diag, ia) unique."""
    bydiag = defaultdict(list)
    for diag, ia in matches:
        bydiag[diag].append(ia)
    runs = defaultdict(int)
    for diag, ias in bydiag.items():
        for rn, ia in enumerate(sorted(ias), start=1):
            runs[(diag, ia - rn)] += 1
    return runs


def _max_run_pairwide_window(matches: list) -> dict:
    """The NEW tail: ONE row_number over the pair ordered by (diag, ia);
    grp = ia - rn; group key still includes diag."""
    runs = defaultdict(int)
    for rn, (diag, ia) in enumerate(sorted(matches), start=1):
        runs[(diag, ia - rn)] += 1
    return runs


def test_lcs_pairwide_window_identity():
    rng = random.Random(22)
    for trial in range(300):
        n = rng.randint(0, 40)
        matches = set()
        while len(matches) < n:
            matches.add((rng.randint(-10, 10), rng.randint(0, 30)))
        matches = list(matches)
        old = _max_run_per_diag_window(matches)
        new = _max_run_pairwide_window(matches)
        # run-length multisets per diagonal are identical (the grp ids
        # shift by a per-diagonal constant, which cannot merge or split
        # groups because diag is part of the key)
        old_by_diag = defaultdict(list)
        for (diag, _), c in old.items():
            old_by_diag[diag].append(c)
        new_by_diag = defaultdict(list)
        for (diag, _), c in new.items():
            new_by_diag[diag].append(c)
        assert {d: sorted(v) for d, v in old_by_diag.items()} == {
            d: sorted(v) for d, v in new_by_diag.items()
        }, (trial, sorted(matches))
        # and therefore the operator's max-run-per-pair is identical
        assert max(old.values(), default=0) == max(new.values(), default=0)
