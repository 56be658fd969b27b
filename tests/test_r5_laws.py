"""Property laws for the round-5 operators — semantic guarantees the
oracle hash can't express (bounds, monotonicity, reconstruction), in
the style of tests/test_property_laws.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_cms_never_underestimates(spark):
    """Count-Min law: the estimate is always >= the true count (the
    sketch only ever over-counts via collisions)."""
    rows = REGISTRY["agg_sketch_cms"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.cms_n >= r.true_n for r in rows)


def test_quantization_reconstruction_bound(spark):
    """int8 quantization law: every component reconstructs within one
    quantization step (scale/127), and codes stay in [-127, 127]."""
    q = {r.vec_id: r for r in REGISTRY["vec_quantize_int8"].fn(spark, SF_DIR).collect()}
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert q
    for vid, row in q.items():
        scale = row.scale_u / 1_000_000
        step = scale / 127
        codes = [int(c) for c in row.q8.split(",")]
        assert all(-128 <= c <= 127 for c in codes)
        # scale_u truncates to micro-units, so the reconstructed step
        # differs from the true step by up to 1e-6/127 — the bound
        # tolerance must absorb |c| * that shift (≤ 1e-6) plus float
        # noise.
        for x, c in zip(emb[vid], codes):
            # floor-based code: x*127/scale in [c, c+1)
            assert c * step <= float(x) + 1e-5
            assert float(x) < (c + 1) * step + 1e-5


def test_containment_bounds(spark):
    """Containment is a true overlap coefficient: inside [thr, 1]
    (basis points, floor'd — so the lower bound loses at most 1bp)."""
    from duckdb_data_eng_proj_spark.queries.training_extra import _CONTAIN_THR

    rows = REGISTRY["dedup_containment"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert _CONTAIN_THR * 10000 - 1 <= r.containment_bp <= 10000


def test_funnel_histogram_partitions_users(spark):
    """Every user lands in exactly one depth bucket; depths are 0-3."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    rows = REGISTRY["ext_funnel_steps"].fn(spark, SF_DIR).collect()
    assert sum(r.n_users for r in rows) == n_users
    assert all(0 <= r.steps_reached <= 3 for r in rows)


def test_recall_bounds(spark):
    """recall@k lives in [0,1]; overlap never exceeds k."""
    rows = REGISTRY["sim_ann_recall_eval"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= 3
        assert 0.0 <= r.recall <= 1.0


def test_chunking_tiles_every_document(spark):
    """Chunk law: per doc the chunk ids are exactly 0..floor((n-1)/32)
    and every chunk holds 1..64 tokens — no token index is skipped and
    no empty chunk is emitted."""
    from duckdb_data_eng_proj_spark.operators.textops import tokens

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_tok = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()
    }
    chunks: dict[int, list] = {}
    for r in REGISTRY["ext_doc_chunk"].fn(spark, SF_DIR).collect():
        chunks.setdefault(r.doc_id, []).append(r)
        assert 1 <= r.n_chunk_tokens <= 64
    for doc_id, rows in chunks.items():
        ids = sorted(r.chunk_id for r in rows)
        assert ids == list(range((n_tok[doc_id] - 1) // 32 + 1)), doc_id


def test_pseudonymization_is_referentially_consistent(spark):
    """Same user -> same pseudonym; distinct users stay distinct (no
    collisions at test scale), so downstream joins still work."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = REGISTRY["ext_anonymize_ids"].fn(spark, SF_DIR)
    joined = out.join(e.select("event_id", "user_id"), "event_id")
    per_user = joined.groupBy("user_id").agg(
        F.countDistinct("user_pseudo").alias("n_pseudo")
    )
    assert per_user.filter(F.col("n_pseudo") != 1).count() == 0
    n_users = e.select("user_id").distinct().count()
    n_pseudo = out.select("user_pseudo").distinct().count()
    assert n_pseudo == n_users
