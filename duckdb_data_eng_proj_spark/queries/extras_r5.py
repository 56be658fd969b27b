"""Round-5 OLAP/IO additions: event-funnel analytics and a compressed
CSV sink round-trip.

Reference parity: the reference project has neither an events table
nor compressed exports; these extend the beyond-reference surface
(SURVEY §2 extensions table) with two staples a production engine
needs — ordered-sequence funnel measurement and codec-aware sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from duckdb_data_eng_proj_spark.io.scratch import scratch_dir
from duckdb_data_eng_proj_spark.queries.registry import register, t


@register(
    "ext_funnel_steps",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN v ON v.user_id = e.user_id AND e.ts > v.t "
        "AND e.ts <= v.t + INTERVAL 1 DAY "
        "WHERE e.event_type = 'click' GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
        "JOIN c ON c.user_id = e.user_id AND e.ts > c.t "
        "AND e.ts <= c.t + INTERVAL 1 DAY "
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
        "u AS (SELECT DISTINCT user_id FROM events), "
        "s AS (SELECT u.user_id, CAST(CASE "
        "WHEN p.user_id IS NOT NULL THEN 3 "
        "WHEN c.user_id IS NOT NULL THEN 2 "
        "WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT) "
        "AS steps_reached FROM u "
        "LEFT JOIN v ON v.user_id = u.user_id "
        "LEFT JOIN c ON c.user_id = u.user_id "
        "LEFT JOIN p ON p.user_id = u.user_id) "
        "SELECT steps_reached, COUNT(*) AS n_users FROM s "
        "GROUP BY steps_reached"
    ),
    doc=(
        "Ordered-sequence funnel (view → click → purchase) with a "
        "1-day conversion window per step: each step counts only "
        "events STRICTLY AFTER the user's previous step and within "
        "the window (first view, then first click after it, then "
        "first purchase after that) — the standard product-analytics "
        "semantics that a naive per-type min() gets wrong when a "
        "purchase precedes the first view. Three min-aggregates "
        "keyed by user_id, each "
        "narrowing to the users who survived the previous step, then a "
        "histogram of depth reached. At 100 TB every stage shuffles on "
        "user_id — one partitioning reused throughout, and step k's "
        "input is only step k-1's survivors."
    ),
)
def ext_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # Each stage carries an explicit presence marker (in_*): the depth
    # test must mirror the oracle's JOIN-PRESENCE semantics
    # (v.user_id IS NOT NULL), not timestamp nullness — a user whose
    # stage rows all have NULL ts produces a row with min(ts) = NULL,
    # which the old t_*.isNotNull() test miscounted as depth 0
    # (r16 review; latent — generated events carry no NULL ts).
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
        .withColumn("in_v", F.lit(1))
    )
    day = F.expr("INTERVAL 1 DAY")
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_v")) & (F.col("ts") <= F.col("t_v") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
        .withColumn("in_c", F.lit(1))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_c")) & (F.col("ts") <= F.col("t_c") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
        .withColumn("in_p", F.lit(1))
    )
    u = e.select("user_id").distinct()
    steps = (
        F.when(F.col("in_p").isNotNull(), 3)
        .when(F.col("in_c").isNotNull(), 2)
        .when(F.col("in_v").isNotNull(), 1)
        .otherwise(0)
    )
    s = (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", steps.cast("int").alias("steps_reached"))
    )
    return s.groupBy("steps_reached").agg(F.count("*").alias("n_users"))


@register(
    "snk_csv_gzip_roundtrip",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "Compressed CSV sink round-trip: orders keys written as "
        "gzip'd CSV (codec plumbing through the DataFrameWriter), "
        "read back with an explicit schema, and aggregated — the "
        "readback aggregate must equal the same aggregate on the "
        "source table, proving the codec path end-to-end (BIGINT "
        "columns survive CSV losslessly). 100 TB caveat stated "
        "honestly: gzip is NOT splittable — one task per file on "
        "read — so production exports shard into many files (as the "
        "distributed writer does naturally) or use zstd parquet; "
        "this entry proves the codec plumbing, not a recommendation."
    ),
)
def snk_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = scratch_dir("orders_csv_gzip")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    (
        o.write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .csv(out)
    )
    schema = StructType(
        [
            StructField("o_orderkey", LongType(), True),
            StructField("o_orderpriority", StringType(), True),
        ]
    )
    back = spark.read.schema(schema).option("header", "true").csv(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "etl_dq_checks",
    oracle=(
        "SELECT "
        "CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_lineitem, "
        "CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) "
        "AS BIGINT) AS orphan_lineitem, "
        "CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders, "
        "CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) "
        "AS BIGINT) AS orphan_orders, "
        "CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_customer, "
        "CAST((SELECT COUNT(*) FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) "
        "AS BIGINT) AS orphan_customer, "
        "CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) "
        "AS BIGINT) AS null_orderdate"
    ),
    doc=(
        "Warehouse data-quality audit — referential integrity down the "
        "star (lineitem→orders→customer→nation orphan counts) plus a "
        "null-rate counter, assembled into ONE single-row report like "
        "the reference's data_quality_report (pipeline.py:392-492 "
        "assembles counters the same way). Each orphan count is a "
        "left-anti join keyed on the FK — at 100 TB these are "
        "shuffle-hash anti-joins (or broadcast when the parent dim is "
        "small, as nation is), each independently parallel; the 1-row "
        "assembly is a cross of six 1-row aggregates, not a data "
        "shuffle. Counters pinned BIGINT (DuckDB COUNT is BIGINT; "
        "Spark count is long)."
    ),
)
def etl_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")

    def one(df, name):
        return df.agg(F.count("*").alias(name))

    counts = [
        one(li, "n_lineitem"),
        one(li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"), "orphan_lineitem"),
        one(o, "n_orders"),
        one(o.join(c, o.o_custkey == c.c_custkey, "left_anti"), "orphan_orders"),
        one(c, "n_customer"),
        one(c.join(n, c.c_nationkey == n.n_nationkey, "left_anti"), "orphan_customer"),
        one(o.filter(F.col("o_orderdate").isNull()), "null_orderdate"),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.crossJoin(df)  # 1-row × 1-row assemblies
    return out


# The verified txt_fingerprint oracle, spliced verbatim (training is
# imported before this module in queries/__init__, so the registry
# entry exists at decoration time).
def _fp_sql() -> str:
    from duckdb_data_eng_proj_spark.queries.registry import REGISTRY

    return REGISTRY["txt_fingerprint"].oracle


# Batch-membership constant for the incremental-ingest family:
# doc_id % _INGEST_BATCH_MOD == 0 is the incoming crawl batch,
# everything else is the already-ingested corpus. Shared by
# etl_dedup_incremental (the batch plan) and pipe_ingest_audited's
# audit gate (extras_r6) so the two can never reconcile against
# different index definitions (ADVICE r6).
_INGEST_BATCH_MOD = 3


def existing_fingerprint_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprints of the already-ingested corpus (the 'index' side
    of incremental ingest). In production this is the fingerprint
    index table, not a corpus scan."""
    from duckdb_data_eng_proj_spark.queries.training import txt_fingerprint

    return (
        txt_fingerprint(spark, sf_dir)
        .filter(F.col("doc_id") % _INGEST_BATCH_MOD != 0)
        .select("fingerprint")
    )


@register(
    "etl_dedup_incremental",
    oracle=(
        # fingerprint IS NOT NULL: rows that cannot be fingerprinted
        # (NULL text) are not admissible — made EXPLICIT on both sides
        # (r16 review): the old oracle dropped them implicitly via its
        # correlated =-comparison while Spark's row_number kept one,
        # a latent one-row divergence on NULL-text data vintages.
        f"WITH fp AS ({_fp_sql()}), "
        "existing AS (SELECT fingerprint FROM fp "
        f"WHERE doc_id % {_INGEST_BATCH_MOD} <> 0), "
        "incoming AS (SELECT doc_id, fingerprint FROM fp "
        f"WHERE doc_id % {_INGEST_BATCH_MOD} = 0 "
        "AND fingerprint IS NOT NULL), "
        "fresh AS (SELECT i.doc_id, i.fingerprint FROM incoming i "
        "WHERE NOT EXISTS (SELECT 1 FROM existing e "
        "WHERE e.fingerprint = i.fingerprint)) "
        "SELECT doc_id, fingerprint FROM fresh f "
        "WHERE doc_id = (SELECT min(doc_id) FROM fresh g "
        "WHERE g.fingerprint = f.fingerprint)"
    ),
    doc=(
        "INCREMENTAL corpus dedup — the snapshot-over-snapshot step of "
        "a continuously-built training corpus: an incoming batch "
        "(doc_id %% 3 = 0 stands in for the new crawl) is admitted "
        "only if its content fingerprint (a) does not exist in the "
        "already-ingested corpus and (b) is the first occurrence "
        "within the batch (min doc_id survivor rule). Composes the "
        "verified txt_fingerprint definition on both sides. Scale "
        "shape: the existing-corpus side projects ONLY fingerprints "
        "(in production: the fingerprint index table, not a corpus "
        "scan), the anti-join + survivor groupBy shuffle on "
        "fingerprint — incremental ingest cost is O(batch + index), "
        "never O(corpus)."
    ),
)
def etl_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duckdb_data_eng_proj_spark.queries.training import txt_fingerprint

    fp = txt_fingerprint(spark, sf_dir).select("doc_id", "fingerprint")
    existing = existing_fingerprint_index(spark, sf_dir)
    # fingerprint IS NOT NULL mirrors the oracle (r16 review — see
    # the oracle comment): unfingerprintable rows are not admissible.
    incoming = fp.filter(
        (F.col("doc_id") % _INGEST_BATCH_MOD == 0)
        & F.col("fingerprint").isNotNull()
    )
    fresh = incoming.join(existing, "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint")
    )


@register(
    "win_count_distinct",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_orderpriority, "
        "COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) "
        "AS n_priorities "
        "FROM orders"
    ),
    doc=(
        "COUNT(DISTINCT) OVER (PARTITION BY ...) — an operator gap in "
        "Spark itself: Catalyst rejects DISTINCT aggregates in window "
        "frames (DuckDB runs them natively), so the engine re-expresses "
        "it as size(collect_set() OVER w) — same semantics (NULLs "
        "excluded by collect_set, matching COUNT DISTINCT), one window "
        "exchange, no self-join. The collect_set state is bounded by "
        "per-partition distinct cardinality (here: ≤5 priorities), "
        "which is the case where this rewrite is 100 TB-safe; for "
        "high-cardinality distincts the dense_rank-max rewrite "
        "(2 windows, O(1) state) is the alternative."
    ),
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("bigint")
        .alias("n_priorities"),
    )


_OOV_VOCAB_K = 20


def _top_tokens_sql(k: int) -> str:
    from duckdb_data_eng_proj_spark.queries.registry import REGISTRY

    # txt_top_tokens' verified oracle, re-limited to the vocab size.
    # The replace must actually fire: if the source oracle is ever
    # reworded, a silent no-op would leave the oracle vocabulary at 100
    # while the Spark side uses _OOV_VOCAB_K.
    src = REGISTRY["txt_top_tokens"].oracle
    if "LIMIT 100" not in src:
        raise AssertionError(
            "txt_top_tokens oracle no longer ends in 'LIMIT 100'; "
            "update _top_tokens_sql to match"
        )
    return src.replace("LIMIT 100", f"LIMIT {k}")


@register(
    "txt_oov_rate",
    oracle=(
        f"WITH vocab AS (SELECT token FROM ({_top_tokens_sql(_OOV_VOCAB_K)})), "
        "toks AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        "x -> x <> '') AS tk FROM documents), "
        "occ AS (SELECT doc_id, unnest(tk) AS token FROM toks), "
        "cov AS (SELECT o.doc_id, COUNT(*) AS n_tok, "
        "COUNT(v.token) AS n_in_vocab FROM occ o "
        "LEFT JOIN vocab v ON v.token = o.token GROUP BY o.doc_id) "
        "SELECT doc_id, n_tok, "
        "CAST(n_tok - n_in_vocab AS BIGINT) AS n_oov, "
        "CAST(floor((n_tok - n_in_vocab) * 10000.0 / n_tok) AS BIGINT) "
        "AS oov_bp "
        "FROM cov"
    ),
    doc=(
        "Out-of-vocabulary rate per document against the corpus top-K "
        "vocabulary — the tokenizer-coverage audit run before "
        "committing a vocab/tokenizer to a training run. Composes the "
        "verified txt_top_tokens definition (re-limited to K=20) as "
        "the vocabulary on both sides. Scale shape: the vocab is "
        "K rows -> broadcast left-join against the token stream (no "
        "corpus shuffle), then a per-doc count aggregate; identical "
        "to ext_decontaminate's broadcast-probe pattern with a "
        "coverage count instead of a drop."
    ),
)
def txt_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.io.sources import ensure_parallelism
    from duckdb_data_eng_proj_spark.operators.textops import tokens
    from duckdb_data_eng_proj_spark.queries.training_extra import top_tokens_df

    d = ensure_parallelism(t(spark, sf_dir, "documents"))
    occ = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    # Vocabulary single-sourced from txt_top_tokens' Spark definition
    # (r16 review — this block previously hand-copied its body while
    # the oracle spliced txt_top_tokens' SQL).
    vocab = top_tokens_df(spark, sf_dir, _OOV_VOCAB_K).select(
        "token", F.lit(1).alias("_in_vocab")
    )
    cov = (
        occ.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.count("_in_vocab").alias("n_in_vocab"),
        )
    )
    oov = F.col("n_tok") - F.col("n_in_vocab")
    # floor'd basis points, not round(ratio, 4): small-denominator
    # rationals can land exactly on 4dp half-boundaries where the two
    # engines' rounding implementations diverge; IEEE floor is exact.
    return cov.select(
        "doc_id",
        "n_tok",
        oov.cast("bigint").alias("n_oov"),
        F.floor(oov * 10000.0 / F.col("n_tok")).cast("bigint").alias("oov_bp"),
    )


@register(
    "mm_modality_router",
    oracle=(
        "SELECT doc_id, 'image/bmp' AS media_type, "
        "CAST(54 + ((3 * (doc_id % 31 + 1) + 3) // 4) * 4 * (doc_id % 17 + 1) "
        "AS BIGINT) AS n_bytes, "
        "CAST(doc_id % 31 + 1 AS BIGINT) AS feat_a, "
        "CAST(doc_id % 17 + 1 AS BIGINT) AS feat_b "
        "FROM documents WHERE doc_id % 2 = 0 "
        "UNION ALL "
        "SELECT doc_id, 'audio/wav' AS media_type, "
        "CAST(44 + 2 * (doc_id % 400 + 16) AS BIGINT) AS n_bytes, "
        "CAST(doc_id % 400 + 16 AS BIGINT) AS feat_a, "
        "CAST((doc_id * 37) % 32767 AS BIGINT) AS feat_b "
        "FROM documents WHERE doc_id % 2 = 1"
    ),
    doc=(
        "Mixed-modality DISPATCH — the shape of a real multimodal "
        "ingest where one batch carries several media types: items are "
        "routed by modality (doc_id parity stands in for a media_type "
        "column), each route runs its REAL codec (the BMP struct-parse "
        "and RIFF/WAV decode from mm_decode_bmp / mm_audio_wav), and "
        "the per-modality features normalize into one common schema "
        "(n_bytes, feat_a, feat_b) for the downstream table. Each "
        "route is a narrow Arrow mapInPandas stage over ONLY its "
        "slice (filter pushed below the synth/decode), and the union "
        "is a zero-shuffle concatenation — at 100 TB modality routing "
        "costs one corpus scan, no exchange."
    ),
)
def mm_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.multimodal import (
        extract_bmp_features,
        extract_wav_features,
        synthesize_bmp_media,
        synthesize_wav_media,
    )

    d = t(spark, sf_dir, "documents")
    imgs = extract_bmp_features(
        synthesize_bmp_media(d.filter(F.col("doc_id") % 2 == 0))
    ).select(
        "doc_id",
        F.lit("image/bmp").alias("media_type"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("width").cast("bigint").alias("feat_a"),
        F.col("height").cast("bigint").alias("feat_b"),
    )
    auds = extract_wav_features(
        synthesize_wav_media(d.filter(F.col("doc_id") % 2 == 1))
    ).select(
        "doc_id",
        F.lit("audio/wav").alias("media_type"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("n_samples").cast("bigint").alias("feat_a"),
        F.col("peak_amp").cast("bigint").alias("feat_b"),
    )
    return imgs.unionByName(auds)


@register(
    "ext_dataset_card",
    oracle=(
        "WITH toks AS (SELECT doc_id, lang, "
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        "x -> x <> '') AS tk FROM documents), "
        f"fp AS ({_fp_sql()}), "
        "lc AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) "
        "SELECT "
        "CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs, "
        "CAST((SELECT SUM(len(tk)) FROM toks) AS BIGINT) AS total_tokens, "
        "CAST((SELECT SUM(len(tk)) FROM toks) // "
        "(SELECT COUNT(*) FROM documents) AS BIGINT) AS avg_doc_tokens, "
        "CAST((SELECT COUNT(*) FROM lc) AS BIGINT) AS n_langs, "
        "(SELECT lang FROM lc ORDER BY n DESC, lang LIMIT 1) AS top_lang, "
        "CAST((SELECT COUNT(DISTINCT fingerprint) FROM fp) AS BIGINT) "
        "AS n_unique_fingerprints, "
        "CAST(floor(((SELECT COUNT(*) FROM documents) - "
        "(SELECT COUNT(DISTINCT fingerprint) FROM fp)) * 10000.0 / "
        "(SELECT COUNT(*) FROM documents)) AS BIGINT) AS exact_dup_bp"
    ),
    doc=(
        "DATASET CARD — the one-row datasheet a corpus release ships "
        "with (Gebru et al., 'Datasheets for Datasets'): document "
        "count, total/average token counts, language inventory with "
        "the dominant language (deterministic count-then-name "
        "tie-break), and the exact-duplicate rate derived from the "
        "verified content-fingerprint definition (spliced from "
        "txt_fingerprint on both sides). Every statistic is a "
        "map-side-combinable aggregate; the 1-row assembly joins "
        "scalar aggregates, not data — the whole card costs ~two "
        "corpus scans at any scale."
    ),
)
def ext_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.textops import tokens
    from duckdb_data_eng_proj_spark.queries.training import txt_fingerprint

    d = t(spark, sf_dir, "documents")
    toks = d.select(F.size(tokens(F.col("text"))).alias("n_tok"))
    base = d.agg(F.count("*").alias("n_docs"))
    tok_tot = toks.agg(F.sum("n_tok").alias("total_tokens"))
    lc = d.groupBy("lang").agg(F.count("*").alias("n"))
    n_langs = lc.agg(F.count("*").alias("n_langs"))
    # asc_nulls_last mirrors DuckDB's default NULLS LAST (r16 review):
    # Spark's plain asc sorts NULLs FIRST, so a count-tie between a
    # NULL lang group and a named language would pick opposite winners.
    top_lang = (
        lc.orderBy(F.col("n").desc(), F.col("lang").asc_nulls_last())
        .limit(1)
        .select("lang")
        .withColumnRenamed("lang", "top_lang")
    )
    fp = txt_fingerprint(spark, sf_dir).agg(
        F.countDistinct("fingerprint").alias("n_unique_fingerprints")
    )
    card = (
        base.crossJoin(tok_tot)
        .crossJoin(n_langs)
        .crossJoin(top_lang)
        .crossJoin(fp)
    )
    return card.select(
        "n_docs",
        "total_tokens",
        F.expr("total_tokens div n_docs").cast("bigint").alias("avg_doc_tokens"),
        "n_langs",
        "top_lang",
        "n_unique_fingerprints",
        # floor'd basis points (not round(rate,4)): cross-engine-safe
        # on exact half-boundaries — see dedup_containment note.
        F.floor(
            (F.col("n_docs") - F.col("n_unique_fingerprints"))
            * 10000.0
            / F.col("n_docs")
        )
        .cast("bigint")
        .alias("exact_dup_bp"),
    )


@register(
    "snk_write_audit_publish",
    oracle=(
        "SELECT o_orderstatus, COUNT(*) AS n_orders, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum "
        "FROM orders WHERE o_orderdate IS NOT NULL "
        "GROUP BY o_orderstatus"
    ),
    doc=(
        "WRITE-AUDIT-PUBLISH — the production sink pattern that keeps "
        "bad data out of consumer-visible tables: the batch lands in a "
        "STAGING directory, an audit re-reads the staged files and "
        "gates on row-count equality with the source plus a "
        "null-contract check, and only a passing audit atomically "
        "renames staging into the PUBLISHED location consumers read. "
        "A failed audit raises and leaves the published table "
        "untouched. The returned aggregate reads the PUBLISHED copy, "
        "so the oracle equality proves the staged bytes survived the "
        "whole staging→audit→publish→read cycle. At 100 TB the same "
        "flow uses a metastore partition swap or table-format commit "
        "instead of a directory rename — same three phases."
    ),
)
def snk_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    stage = scratch_dir("orders_wap_stage")
    pub = scratch_dir("orders_wap_pub")
    src = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    cols = ["o_orderkey", "o_orderstatus", "o_orderdate"]
    src.select(*cols).write.mode("overwrite").parquet(stage)

    staged = spark.read.parquet(stage)
    n_src = src.count()
    # One staged scan serves both audit counters (r16 review — the
    # old two-action form re-read the staged parquet twice).
    n_staged, n_null_keys = staged.agg(
        F.count("*"),
        F.count(F.when(F.col("o_orderkey").isNull(), F.lit(1))),
    ).first()
    if n_staged != n_src or n_null_keys != 0:
        raise RuntimeError(
            f"audit failed: staged={n_staged} source={n_src} "
            f"null_keys={n_null_keys}; publish aborted"
        )
    # Publish = same-filesystem atomic renames (stage and pub share the
    # scratch root). Move any previous published copy aside first —
    # os.rename raises rather than nesting/merging on failure, so a
    # botched publish can never leave consumers reading mixed old+new
    # files; the failure mode is "old copy still intact at pub.old".
    old = pub + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(pub):
        os.rename(pub, old)
    os.rename(stage, pub)
    shutil.rmtree(old, ignore_errors=True)

    published = spark.read.parquet(pub)
    return published.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "ext_anonymize_ids",
    oracle=(
        "SELECT event_id, event_type, "
        "substr(md5('salt-v1:' || CAST(user_id AS VARCHAR)), 1, 16) "
        "AS user_pseudo "
        "FROM events"
    ),
    doc=(
        "Structured-key PSEUDONYMIZATION (the GDPR-pipeline sibling of "
        "txt_pii_scrub's free-text redaction): user ids are replaced "
        "by a salted-hash token, deterministically — the same user "
        "maps to the same pseudonym across tables, runs, and engines, "
        "so joins and per-user aggregates still work downstream while "
        "the raw id never leaves the trust boundary. Versioned salt "
        "('salt-v1') models key rotation. Pure narrow projection, "
        "codegen'd, no shuffle at any scale."
    ),
)
def ext_anonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.substring(
            F.md5(F.concat(F.lit("salt-v1:"), F.col("user_id").cast("string"))),
            1,
            16,
        ).alias("user_pseudo"),
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_slot_sql(j: int, item: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{j}:' || {item}), 1, 8) AS BIGINT) "
        f"% {_CMS_WIDTH}"
    )


@register(
    "agg_sketch_cms",
    oracle=(
        "WITH toks AS (SELECT "
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        "x -> x <> '') AS tk FROM documents), "
        "occ AS (SELECT unnest(tk) AS token FROM toks), "
        "cells AS ("
        + " UNION ALL ".join(
            f"SELECT {j} AS d, {_cms_slot_sql(j, 'token')} AS slot, "
            "COUNT(*) AS n FROM occ GROUP BY 1, 2"
            for j in range(_CMS_DEPTH)
        )
        + "), "
        "items AS (SELECT token, COUNT(*) AS true_n FROM occ GROUP BY token) "
        "SELECT i.token, i.true_n, CAST(min(c.n) AS BIGINT) AS cms_n "
        "FROM items i JOIN cells c "
        "ON ("
        + " OR ".join(
            f"(c.d = {j} AND c.slot = {_cms_slot_sql(j, 'i.token')})"
            for j in range(_CMS_DEPTH)
        )
        + ") GROUP BY i.token, i.true_n"
    ),
    doc=(
        "Count-Min sketch — the frequency-estimation sketch next to "
        "ext_sketch_kmv's cardinality sketch: 4 hash rows × 256 slots, "
        "each cell a (row, slot) count; an item's estimate is the MIN "
        "over its 4 cells, always ≥ the true count (over-estimation "
        "only). md5-derived slot hashing makes the sketch bit-"
        "identical cross-engine, so the oracle verifies exact cell "
        "values, not just error bounds — unlike native CMS/HLL "
        "implementations, which never match across engines. Probed "
        "here for every distinct token against its true count. At "
        "100 TB the sketch build is a map-side-combinable groupBy of "
        "d×w bounded cells — constant memory, one shuffle of partial "
        "cells; the probe side broadcasts the finished sketch."
    ),
)
def agg_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.io.sources import ensure_parallelism
    from duckdb_data_eng_proj_spark.operators.textops import tokens

    d = ensure_parallelism(t(spark, sf_dir, "documents"))
    # No checkpoint on the exploded token stream (r16 review): occ is
    # consumed exactly once (the items count below); the eager
    # checkpoint was a vestige of the pre-r6 four-groupBy version and
    # pinned a corpus-sized token stream in block storage for nothing.
    occ = d.select(F.explode(tokens(F.col("text"))).alias("token"))

    def slot(j: int, item):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), item)), 1, 8), 16, 10)
            .cast("long")
            % _CMS_WIDTH
        )

    # One corpus-sized shuffle (the token counts); every sketch cell
    # then derives from the vocab-sized count table — the r5 version
    # ran 4 separate corpus groupBys (r6: 0.70 s -> ~0.4 s at sf0.1).
    # SUM(count) per slot ≡ COUNT(*) over raw occurrences per slot.
    items = occ.groupBy("token").agg(F.count("*").alias("true_n"))
    items = items.localCheckpoint(eager=False)
    cells = None
    for j in range(_CMS_DEPTH):
        c = (
            items.groupBy(slot(j, F.col("token")).alias("slot"))
            .agg(F.sum("true_n").alias("n"))
            .select(F.lit(j).alias("d"), "slot", "n")
        )
        cells = c if cells is None else cells.unionByName(c)
    probe = items
    for j in range(_CMS_DEPTH):
        probe = probe.withColumn(f"s{j}", slot(j, F.col("token")))
    cond = None
    for j in range(_CMS_DEPTH):
        this = (F.col("c.d") == j) & (F.col("c.slot") == F.col(f"i.s{j}"))
        cond = this if cond is None else cond | this
    est = (
        probe.alias("i")
        .join(F.broadcast(cells.alias("c")), cond)
        .groupBy("i.token", "i.true_n")
        .agg(F.min("c.n").cast("bigint").alias("cms_n"))
    )
    return est.select(
        F.col("token"), F.col("true_n"), F.col("cms_n")
    )
