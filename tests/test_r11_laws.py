"""Algorithmic laws for the round-11 operators.

Same adversarial posture as tests/test_r10_laws.py: the oracle rows
prove cross-engine equality; these tests prove the shared definition
is the RIGHT one, via independent replays and structural laws on
sf0.001.

- join_skew_diagnose: mass conservation against the REAL join (the
  binned out_rows_total must sum to the actual inner-join row count,
  and shuffle_rows to |events| + |orders|), bin containment
  (out_rows_max inside [2^bin, 2^(bin+1))), the ceil-division salt
  law, and share_pml truncation bounds.
- dedup_minhash_incremental: partition law (every batch doc exactly
  once, verdicts from the closed set), partner provenance (corpus
  partners are corpus docs, batch partners are smaller batch docs,
  admits carry -1), precedence (a doc with any verified corpus
  partner is never dup_batch), and LSH-consistency (every flagged
  partner pair shares at least one (band, bucket) in the verified
  dedup_minhash_lsh output).
- sim_ann_index_drift: conservation (stale and fresh memberships
  each sum to the corpus size), overlap bound (n_stayed <= min of
  the two counts), seed-set law (exactly the 16 shared seeds,
  ordered), and the zero-drift fixture — on a corpus where the old
  snapshot IS the full corpus (no vec_id divisible by 3), the two
  generations coincide: n_stale = n_fresh = n_stayed and
  sq_disp_u = 0 for every non-empty centroid.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r11 import (
    _INC_JACCARD,
    _SKEW_TARGET,
)
from tests.conftest import SF_DIR


def test_skew_diagnose_mass_conservation(spark):
    from duckdb_data_eng_proj_spark.queries.registry import t

    rows = REGISTRY["join_skew_diagnose"].fn(spark, SF_DIR).collect()
    ev = t(spark, SF_DIR, "events")
    od = t(spark, SF_DIR, "orders")
    true_out = ev.join(
        od, ev["user_id"] == od["o_custkey"], "inner"
    ).count()
    assert sum(r.out_rows_total for r in rows) == true_out
    assert sum(r.shuffle_rows for r in rows) == ev.count() + od.count()
    # The union+distinct cross-check counts a NULL key ONCE, but the
    # operator's full-outer join keeps per-side NULL keys as separate
    # unmatched rows (NULL never equi-joins) — so this law only holds
    # on NULL-free key columns. Assert that precondition explicitly
    # (ADVICE r11) instead of letting a future generator change turn a
    # both-engines-agree result into a spurious law failure.
    assert ev.filter(F.col("user_id").isNull()).count() == 0
    assert od.filter(F.col("o_custkey").isNull()).count() == 0
    assert sum(r.n_keys for r in rows) == (
        ev.select("user_id").union(
            od.select("o_custkey")
        ).distinct().count()
    )


def test_skew_diagnose_bin_and_salt_laws(spark):
    rows = REGISTRY["join_skew_diagnose"].fn(spark, SF_DIR).collect()
    assert rows == sorted(rows, key=lambda r: r.vol_bin)
    total = sum(r.out_rows_total for r in rows)
    share_sum = 0
    for r in rows:
        if r.vol_bin == -1:
            assert r.out_rows_total == 0 and r.out_rows_max == 0
        else:
            assert 2**r.vol_bin <= r.out_rows_max < 2 ** (r.vol_bin + 1)
        # ceil division, integer exact
        assert r.salt_factor == (r.out_rows_max + _SKEW_TARGET - 1) // _SKEW_TARGET
        assert r.out_rows_max <= r.out_rows_total
        assert 0 <= r.share_pml <= 1000
        assert r.share_pml == r.out_rows_total * 1000 // max(1, total)
        share_sum += r.share_pml
    # truncating shares: never exceed 1000, lose at most 1 per bin
    assert 1000 - len(rows) <= share_sum <= 1000


def test_minhash_incremental_partition_and_provenance(spark):
    from duckdb_data_eng_proj_spark.queries.registry import t

    rows = REGISTRY["dedup_minhash_incremental"].fn(spark, SF_DIR).collect()
    batch_ids = {
        r.doc_id
        for r in t(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .collect()
    }
    assert Counter(r.doc_id for r in rows) == Counter(batch_ids)
    for r in rows:
        assert r.verdict in ("admit", "dup_corpus", "dup_batch")
        if r.verdict == "admit":
            assert r.partner_id == -1
        elif r.verdict == "dup_corpus":
            assert r.partner_id % 3 != 0
        else:
            assert r.partner_id % 3 == 0 and r.partner_id < r.doc_id
    # the batch must not be trivially all-admit or all-dup on the
    # test corpus (the fixture has both replicas and fresh docs)
    verdicts = {r.verdict for r in rows}
    assert "admit" in verdicts and len(verdicts) >= 2


def test_minhash_incremental_partners_share_lsh_bucket(spark):
    rows = REGISTRY["dedup_minhash_incremental"].fn(spark, SF_DIR).collect()
    bands = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    buckets = {}
    for b in bands:
        buckets.setdefault(b.doc_id, set()).add((b.band, b.bucket))
    for r in rows:
        if r.verdict == "admit":
            continue
        assert buckets[r.doc_id] & buckets[r.partner_id], (
            f"{r.doc_id} flagged against {r.partner_id} without a "
            "shared LSH bucket"
        )


def test_ann_drift_conservation_and_overlap(spark):
    from duckdb_data_eng_proj_spark.queries.registry import t

    rows = REGISTRY["sim_ann_index_drift"].fn(spark, SF_DIR).collect()
    n = t(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_stale for r in rows) == n
    assert sum(r.n_fresh for r in rows) == n
    expected_seeds = [
        v
        for v in range(24)
        if v % 3 != 0
    ]
    assert [r.cid for r in rows] == expected_seeds and len(rows) == 16
    for r in rows:
        assert 0 <= r.n_stayed <= min(r.n_stale, r.n_fresh)
        assert r.sq_disp_u >= 0 or r.sq_disp_u == -1


def test_ann_drift_zero_when_snapshots_coincide(spark, tmp_path):
    # Shift every vec_id to 3k+1 so NO id is divisible by 3: the old
    # snapshot equals the full corpus and both index generations must
    # coincide exactly.
    from duckdb_data_eng_proj_spark.queries.registry import t

    src = t(spark, SF_DIR, "embeddings")
    fixture = src.select(
        (F.col("vec_id") * 3 + 1).alias("vec_id"), "embedding", "label"
    )
    fixture.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = REGISTRY["sim_ann_index_drift"].fn(spark, str(tmp_path)).collect()
    n = fixture.count()
    assert sum(r.n_stale for r in rows) == n
    for r in rows:
        assert r.n_stale == r.n_fresh == r.n_stayed
        # a seed whose cluster is non-empty must show zero drift;
        # a cluster empty in both generations reports the -1 sentinel
        assert r.sq_disp_u == (0 if r.n_stale > 0 else -1)
