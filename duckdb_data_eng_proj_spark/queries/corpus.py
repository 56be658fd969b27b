"""Corpus-cleaning composites: the training-data pipeline end-to-end.

``dedup_near_keep`` turns near-dup *detection* into near-dup
*removal* (keep the smallest doc_id of every similar pair — the
standard greedy survivor rule), and ``pipe_corpus_clean`` chains the
whole north-star pipeline: quality scoring → language filter → exact
dedup by fingerprint → near-dup removal → surviving corpus stats.
Both fully oracle-checked; the oracle SQL is composed from the same
mirrored fragments as the individual operators.

Scale shape: every stage is either a narrow map or a key-bounded
join/aggregate — quality+language prune FIRST (cheapest filters drop
the most bytes before any hashing), fingerprint dedup is one
groupBy(fingerprint), near-dup removal is the LSH bucket join on the
already-pruned survivor set. Stage order is the optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries.registry import register
from duckdb_data_eng_proj_spark.queries.training import (
    _LANG_PRED_SQL,
    _LSH_PRELUDE,
    _bigram_sets_df,
    _lang_hits_sql,
    _lsh_bands_df,
)


def _near_dup_losers(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """doc_ids that lose the survivor rule: every doc_b of a verified
    near-dup pair (doc_a < doc_b, Jaccard ≥ threshold)."""
    bands = _lsh_bands_df(spark, sf_dir)
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = _bigram_sets_df(spark, sf_dir)
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("bg").alias("bg_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("bg").alias("bg_b"))
    inter = F.size(F.array_intersect(F.col("bg_a"), F.col("bg_b")))
    union = F.size(F.col("bg_a")) + F.size(F.col("bg_b")) - inter
    jac = inter.cast("double") / union
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


_LOSERS_SQL = (
    "cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b "
    "FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket "
    "AND x.doc_id < y.doc_id), "
    "losers AS (SELECT DISTINCT c.doc_b AS doc_id FROM cand c "
    "JOIN bg a ON a.doc_id = c.doc_a JOIN bg b ON b.doc_id = c.doc_b "
    "WHERE CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE) / "
    "(len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg))) >= {thr})"
)


@register(
    "dedup_near_keep",
    oracle=(
        f"{_LSH_PRELUDE}, "
        + _LOSERS_SQL.format(thr=0.05)
        + " SELECT d.doc_id FROM documents d "
        "LEFT JOIN losers l ON d.doc_id = l.doc_id WHERE l.doc_id IS NULL"
    ),
    doc=(
        "Near-dup REMOVAL (survivor rule): of every verified pair keep "
        "the smaller doc_id; a doc survives iff it is nobody's doc_b. "
        "Greedy pairwise survivorship ≈ cluster-representative choice "
        "without an iterative connected-components pass — the standard "
        "corpus-dedup tradeoff. Anti-join against the loser set."
    ),
)
def dedup_near_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.queries.registry import t

    losers = _near_dup_losers(spark, sf_dir, 0.05)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


# quality + language fragments mirrored from training.py's registered
# ops, restricted to what the composite needs.
_QL_CTE = (
    "ql AS (SELECT t.doc_id AS doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens, "
    "round(0.5 * least(1.0, CAST(len(t.tk) AS DOUBLE) / 50.0) "
    "+ 0.3 * (CAST(len(list_filter(t.tk, x -> list_contains(['the', 'a', 'and', "
    "'of', 'to', 'in', 'is', 'it', 'on', 'for'], x))) AS DOUBLE) "
    "/ nullif(len(t.tk), 0)) "
    "+ 0.2 * (1.0 - least(1.0, 10.0 * "
    "CAST(len(regexp_extract_all(lower(trim(d.text)), '[^a-z0-9\\s]')) AS DOUBLE) "
    "/ nullif(length(trim(d.text)), 0))), 4) AS quality_score, "
    + ", ".join(f"{_lang_hits_sql(lg)} AS {lg}_hits" for lg in ("en", "de", "fr", "es"))
    + ", "
    "CASE WHEN len(t.tk) >= 5 THEN list_aggregate(list_transform("
    "list_transform(range(len(t.tk) - 4), "
    "i -> array_to_string(t.tk[i+1:i+5], ' ')), "
    "s -> md5(s)), 'min') ELSE md5(array_to_string(t.tk, ' ')) END AS fingerprint "
    "FROM documents d JOIN toks t USING (doc_id))"
)


@register(
    "pipe_corpus_clean",
    oracle=(
        f"{_LSH_PRELUDE}, "
        + _LOSERS_SQL.format(thr=0.05)
        + f", {_QL_CTE}, "
        "kept AS (SELECT q.* FROM ql q "
        "LEFT JOIN losers l ON q.doc_id = l.doc_id "
        "WHERE q.quality_score >= 0.5 AND (" + _LANG_PRED_SQL + ") = 'en' "
        "AND l.doc_id IS NULL "
        "QUALIFY row_number() OVER (PARTITION BY q.fingerprint "
        "ORDER BY q.doc_id) = 1) "
        "SELECT doc_id, n_tokens, quality_score FROM kept"
    ),
    doc=(
        "END-TO-END training-corpus cleaning: quality score ≥ 0.5 → "
        "language = en → exact dedup (keep first doc per 5-gram "
        "fingerprint) → near-dup removal (LSH + Jaccard survivor "
        "rule). Cheap filters run first so the hash stages see only "
        "survivors; exact dedup is one groupBy(fingerprint); near-dup "
        "is the bucket join. This is the 100 TB pretraining-data "
        "pipeline in one lazy plan."
    ),
)
def pipe_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duckdb_data_eng_proj_spark.queries.training import (
        txt_fingerprint,
        txt_lang_id,
        txt_quality_score,
    )

    quality = txt_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lang = txt_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    fp = txt_fingerprint(spark, sf_dir).select("doc_id", "fingerprint")
    losers = _near_dup_losers(spark, sf_dir, 0.05)

    kept = (
        quality.join(lang, "doc_id")
        .join(fp, "doc_id")
        .filter((F.col("quality_score") >= 0.5) & (F.col("pred_lang") == "en"))
        .join(losers, "doc_id", "left_anti")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "quality_score")
    )
