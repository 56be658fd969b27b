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
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    day = F.expr("INTERVAL 1 DAY")
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_v")) & (F.col("ts") <= F.col("t_v") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_c")) & (F.col("ts") <= F.col("t_c") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    u = e.select("user_id").distinct()
    steps = (
        F.when(F.col("t_p").isNotNull(), 3)
        .when(F.col("t_c").isNotNull(), 2)
        .when(F.col("t_v").isNotNull(), 1)
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
