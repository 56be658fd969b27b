"""Experiment: ext_decontaminate plan variants at sf0.1 (throwaway)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.operators.textops import tokens, word_ngrams
from duckdb_data_eng_proj_spark.queries.registry import t

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def v_current(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    grams = toks.select("doc_id", F.explode(word_ngrams(F.col("tk"), 5)).alias("g"))
    eval_grams = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(hits, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def v_nodistinct(spark, sf_dir):
    # anti-join ignores right-side duplicates: drop the hits distinct
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    grams = toks.select("doc_id", F.explode(word_ngrams(F.col("tk"), 5)).alias("g"))
    eval_grams = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
    )
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(hits), "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def v_ckpt_evaldocs(spark, sf_dir):
    # eval docs are tiny: checkpoint them so the broadcast-build job
    # doesn't rescan/retokenize the full corpus text column
    d = t(spark, sf_dir, "documents")
    ev = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    ev_grams = (
        ev.select(tokens(F.col("text")).alias("tk"))
        .select(F.explode(word_ngrams(F.col("tk"), 5)).alias("g"))
        .distinct()
    )
    toks = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", tokens(F.col("text")).alias("tk")
    )
    grams = toks.select("doc_id", F.explode(word_ngrams(F.col("tk"), 5)).alias("g"))
    hits = grams.join(F.broadcast(ev_grams), "g").select("doc_id")
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(hits), "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


variants = {
    "current": v_current,
    "nodistinct": v_nodistinct,
    "ckpt_evaldocs": v_ckpt_evaldocs,
}
# warm-up lap
for fn in variants.values():
    fn(spark, SF).count()
for name, fn in variants.items():
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        n = fn(spark, SF).count()
        best = min(best, time.time() - t0)
    print(f"{name:15s} best={best:.3f}s rows={n}")
