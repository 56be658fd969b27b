"""pipe_ingest_audited: the write→audit→publish composite contract.

The correctness hash (driver) certifies published == planned batch;
these tests pin the operational properties the hash can't see:
idempotent re-publish, and clean abort on a failed audit."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.io.scratch import scratch_dir
from duckdb_data_eng_proj_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def _run(spark):
    return REGISTRY["pipe_ingest_audited"].fn(spark, SF_DIR)


def test_published_equals_planned_batch(spark):
    pub = _run(spark)
    plan = REGISTRY["etl_dedup_incremental"].fn(spark, SF_DIR)
    assert pub.count() == plan.count()
    assert pub.join(plan, ["doc_id", "fingerprint"], "left_anti").count() == 0


def test_republish_is_idempotent_and_leaves_no_residue(spark):
    first = set(r.doc_id for r in _run(spark).collect())
    second = set(r.doc_id for r in _run(spark).collect())
    assert first == second
    # No stale move-aside copy or staging dir left behind.
    pub = scratch_dir("corpus_ingest_pub")
    assert not os.path.isdir(pub + ".old")
    assert not os.path.isdir(scratch_dir("corpus_ingest_stage"))
    assert os.path.isdir(pub)


def test_failed_audit_aborts_without_publishing(spark, monkeypatch):
    """A staged batch that overlaps the existing fingerprint index must
    fail the audit, drop staging, and leave the published copy intact."""
    import duckdb_data_eng_proj_spark.queries.extras_r5 as R5

    baseline = sorted(r.doc_id for r in _run(spark).collect())

    real_batch = R5.etl_dedup_incremental

    def overlapping_batch(spark_, sf_dir):
        # Append one row whose fingerprint IS in the existing index
        # (any doc_id % 3 != 0 doc) — violates the zero-overlap
        # invariant the audit reconciles.
        from duckdb_data_eng_proj_spark.queries.training import (
            txt_fingerprint,
        )

        bad = (
            txt_fingerprint(spark_, sf_dir)
            .filter(F.col("doc_id") % 3 != 0)
            .select("doc_id", "fingerprint")
            .limit(1)
        )
        return real_batch(spark_, sf_dir).unionByName(bad)

    monkeypatch.setattr(R5, "etl_dedup_incremental", overlapping_batch)
    with pytest.raises(RuntimeError, match="ingest audit failed"):
        _run(spark)

    pub = scratch_dir("corpus_ingest_pub")
    assert not os.path.isdir(scratch_dir("corpus_ingest_stage"))
    assert not os.path.isdir(pub + ".old")
    after = sorted(
        r.doc_id
        for r in spark.read.parquet(pub).select("doc_id").collect()
    )
    assert after == baseline
