"""Property laws for the round-7 operators — semantic guarantees the
oracle hash can't express, in the style of tests/test_r5_laws.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_triangle_count_orientation_invariant(spark):
    """The census's triangle count must not depend on the edge
    orientation: the operator counts over the degree-ordered
    orientation (the O(m^1.5) scale variant); re-counting over the
    plain id-ordered canonical edges must give the same number — any
    divergence means an orientation is dropping or double-counting
    wedge closures."""
    from duckdb_data_eng_proj_spark.queries.corpus import _near_dup_pairs
    from duckdb_data_eng_proj_spark.queries.extras_r7 import _TRI_THR

    row = REGISTRY["graph_clustering_coefficient"].fn(spark, SF_DIR).collect()[0]
    e = _near_dup_pairs(spark, SF_DIR, _TRI_THR).localCheckpoint()
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    id_ordered = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    assert row.n_triangles == id_ordered
    # structural sanity: wedges bound triangles (3T <= W), and the
    # coefficient is the floor'd basis-point ratio of exactly those.
    assert 3 * row.n_triangles <= row.n_wedges
    expect_bp = 0 if row.n_wedges == 0 else (3 * row.n_triangles * 10000) // row.n_wedges
    assert row.global_cc_bp == expect_bp


def test_markov_rows_are_stochastic_and_complete(spark):
    """Transition-matrix laws: per from_type the floor'd micro-unit
    probabilities sum to at most 1e6 and undershoot by less than the
    number of outgoing types (integer-floor loss only); transition
    counts reconstruct the total number of consecutive event pairs
    per user (rows_per_user - 1 summed)."""
    rows = REGISTRY["evt_markov_transition"].fn(spark, SF_DIR).collect()
    assert rows
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, out in by_from.items():
        s = sum(r.p_micro for r in out)
        assert s <= 1_000_000, from_type
        assert s > 1_000_000 - len(out), from_type
    n_trans_total = sum(r.n_trans for r in rows)
    per_user = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .count()
        .agg(F.sum(F.col("count") - 1))
        .collect()[0][0]
    )
    assert n_trans_total == per_user


def test_gap_fill_grid_is_dense_and_locf_exact(spark):
    """Gap-fill laws the oracle hash can't express directly:

    1. density — per user the emitted epoch grid is exactly
       {min .. max} in 3600 s steps, no holes, no duplicates;
    2. reconciliation — on non-gap rows the filled sum equals the
       direct per-bucket cents aggregation of the raw events;
    3. LOCF — on gap rows the filled sum equals the value at the
       nearest preceding non-gap bucket (recomputed independently
       driver-side from the collected rows).
    """
    rows = REGISTRY["ts_gap_fill"].fn(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, out in by_user.items():
        out.sort(key=lambda r: r.bucket_epoch_s)
        epochs = [r.bucket_epoch_s for r in out]
        assert epochs == list(
            range(epochs[0], epochs[-1] + 3600, 3600)
        ), f"user {uid}: grid not dense"
        # endpoints anchor on real activity, never on a gap
        assert not out[0].is_gap and not out[-1].is_gap, uid
        last = None
        for r in out:
            if not r.is_gap:
                last = r.sum_cents_filled
            else:
                assert r.sum_cents_filled == last, (
                    f"user {uid} @ {r.bucket_epoch_s}: LOCF broke"
                )
    # non-gap rows reconcile against the direct aggregation
    from duckdb_data_eng_proj_spark.queries.extras_r6 import _GAP_FILL_USERS

    direct = {
        (r.user_id, r.bucket_epoch_s): r.cents
        for r in (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter(F.col("user_id") < _GAP_FILL_USERS)
            .groupBy(
                "user_id",
                F.unix_timestamp(
                    F.date_trunc("hour", F.col("ts").cast("timestamp"))
                ).alias("bucket_epoch_s"),
            )
            .agg(
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                    "cents"
                )
            )
            .collect()
        )
    }
    non_gap = [r for r in rows if not r.is_gap]
    assert len(non_gap) == len(direct)
    for r in non_gap:
        assert direct[(r.user_id, r.bucket_epoch_s)] == r.sum_cents_filled
