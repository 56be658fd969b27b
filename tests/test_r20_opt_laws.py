"""Round-20 optimization laws.

The r20 optimization round rewrote hot-path predicates into
single-array_intersect integer form (corpus._near_dup_pairs,
extras_r12.dedup_lsh_tune). These tests pin the algebra those rewrites
rely on, so a future threshold change that silently breaks the
equivalence triages as code, not data.
"""

from __future__ import annotations

from duckdb_data_eng_proj_spark.queries.corpus import _JACC_INT_MULT


def test_jaccard_integer_predicate_matches_double_form():
    """(k+1)*i >= sx+sy  <=>  i/(sx+sy-i) >= <double literal 1/k> for
    every reachable (intersection, union) pair.

    Documents at every sf have well under 3000 distinct bigrams, so
    the sweep covers the full reachable range with margin. The double
    comparison below uses the exact same IEEE semantics Spark's codegen
    does (binary64 division vs the parsed literal)."""
    for thr, mult in _JACC_INT_MULT.items():
        k = mult - 1
        assert abs(thr - 1.0 / k) < 1e-12  # the table stays 1/k-form
        for i in range(0, 3001):
            for union in range(max(i, 1), 3001):
                s = union + i
                assert (i / union >= thr) == (mult * i >= s), (
                    thr,
                    i,
                    union,
                )


def test_lsh_tune_qualifier_integer_form():
    """dedup_lsh_tune's ev filter: 5*i >= (sx+sy-i) <=> 6*i >= sx+sy
    exactly over integers (pure algebra, no floats involved)."""
    for i in range(0, 2001):
        for un in range(0, 2001):
            s = un + i
            assert (5 * i >= un) == (6 * i >= s)
