"""Seeded cross-engine fuzz of the MinHash/LSH primitive chain.

`_LSH_PRELUDE` (queries/training.py:50-110) is the DuckDB spelling of
operators/textops' tokens → distinct bigram shingles → md5 →
Kirsch-Mitzenmacher (a + j·b) mod (2^61-1) signature → banded bucket
keys. Fifteen-plus dedup/ANN operators and the whole near-dup pair
graph family (dedup_minhash_lsh, dedup_cluster_cc*, the triangle
census) ride on these two spellings agreeing BIT-FOR-BIT — one
divergent signature silently changes candidate generation everywhere.

This fuzz generates documents from a small vocabulary (forcing
shingle overlap and duplicates), plus the degenerate shapes (empty,
one token, all-identical tokens), and asserts per-document equality
of all 8 signature components AND the (band, bucket) key set between
the Spark Column pipeline and the oracle prelude.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.operators.textops import (
    distinct_ngrams,
    lsh_band_buckets,
    minhash_from_pairs,
    minhash_pairs,
    tokens,
)
from duckdb_data_eng_proj_spark.queries.training import _LSH_PRELUDE

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "42", "?!"]


def _gen_docs(n: int, seed: int) -> list:
    rng = random.Random(seed)
    docs = []
    for _ in range(n):
        k = rng.randint(0, 14)
        docs.append(" ".join(rng.choice(_VOCAB) for _ in range(k)))
    docs += ["", "solo", "dup dup dup dup", "  padded   run  "]
    return docs


def test_minhash_pipeline_matches_oracle_prelude(spark):
    docs = _gen_docs(200, seed=6174)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    tok = tokens(F.col("text"))
    shingled = df.select(
        "doc_id", minhash_pairs(distinct_ngrams(tok, 2)).alias("ps")
    )
    sig = shingled.select("doc_id", *minhash_from_pairs(F.col("ps"), 8))
    sig_rows = {
        r.doc_id: tuple(r[f"h{j}"] for j in range(8)) for r in sig.collect()
    }
    bucket_cols = lsh_band_buckets([f"h{j}" for j in range(8)], 2)
    band_rows = set()
    for r in sig.select("doc_id", *bucket_cols).collect():
        for b in range(len(bucket_cols)):
            if r[f"band{b}"] is not None:
                band_rows.add((r.doc_id, b, r[f"band{b}"]))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(docs))
    )
    duck_sig = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            _LSH_PRELUDE + " SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM sig"
        ).fetchall()
    }
    duck_bands = {
        tuple(row)
        for row in con.execute(
            _LSH_PRELUDE
            + " SELECT doc_id, band, bucket FROM bands WHERE bucket IS NOT NULL"
        ).fetchall()
    }

    assert set(sig_rows) == set(duck_sig)
    for doc_id, s in sig_rows.items():
        assert s == duck_sig[doc_id], (
            f"doc {doc_id} ({docs[doc_id]!r}): spark sig {s} != duck {duck_sig[doc_id]}"
        )
    assert band_rows == duck_bands
