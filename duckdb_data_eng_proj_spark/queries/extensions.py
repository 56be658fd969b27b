"""Extension operators (SURVEY.md §2.8 + training-data-pipeline ops).

Registry wrappers; the heavy lifting lives in
``duckdb_data_eng_proj_spark.operators.*``. Grows per milestone M4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.functions.scalars import exact_units
from duckdb_data_eng_proj_spark.operators.sessions import sessionized
from duckdb_data_eng_proj_spark.queries.registry import register, t


@register(
    "ext_dedup_exact",
    oracle=(
        "SELECT event_id, user_id, event_type FROM ("
        "  SELECT event_id, user_id, event_type, "
        "  row_number() OVER (PARTITION BY user_id, event_type "
        "  ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"
    ),
    doc=(
        "Exact dedup with deterministic keep-first (generalizes app_dupes, "
        "pipeline.py:116-124): min(struct(ts, unique id)) per key — a "
        "hash aggregate, so keep-first is computed with a MAP-SIDE "
        "partial combine and only one survivor row per key is shuffled. "
        "The equivalent row_number window would shuffle+sort EVERY row; "
        "at 100 TB the agg form moves |distinct keys| rows instead of "
        "|input| rows. Deterministic under partition reordering (struct "
        "comparison is lexicographic on (ts, event_id), a total order)."
    ),
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # Keep-first orders NULL ts LAST like the oracle's row_number
    # (DuckDB ASC default): Spark struct-min sorts a NULL field FIRST,
    # so a timeless duplicate would beat every timed one (r17 hostile
    # vintage). Boolean-first struct-min is EXACT NULLS LAST — false
    # (timed) < true (timeless), then ts, then event_id — with no
    # sentinel instant a genuine max-date ts could collide with
    # (ADVICE r17), and the agg stays map-side combinable.
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.min(
                F.struct(
                    F.col("ts").isNull().alias("ts_is_null"),
                    F.col("ts").alias("k"),
                    F.col("event_id"),
                )
            ).alias("_first")
        )
        .select(
            F.col("_first.event_id").alias("event_id"), "user_id", "event_type"
        )
    )


@register(
    "ext_json_extract",
    oracle=(
        # json_valid guard (r17 malformed-props vintage): Spark's
        # get_json_object NULLs invalid JSON while DuckDB's
        # json_extract_string THROWS — tolerant extraction is the spec
        "SELECT event_id, CAST(json_extract_string("
        "CASE WHEN json_valid(props) THEN props END, '$.k') AS INT) AS k_value "
        "FROM events"
    ),
    doc="JSON field extraction from events.props (get_json_object → int).",
)
def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k_value")
    )


@register(
    "ext_win_tumbling",
    oracle=(
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 "
        "AS total_value "
        # Spark's F.window DROPS null event times; the oracle mirrors
        # (r17 hostile vintage)
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2"
    ),
    doc=(
        "Tumbling-window aggregate over events.ts (batch formulation of "
        "the streaming op): F.window 1-hour buckets ≡ date_trunc('hour'). "
        "Exact integer-cents sum for partition-order independence, "
        "emitted DOUBLE (DECIMAL serializes differently in the driver "
        "hasher — round-1 hash-fail)."
    ),
)
def ext_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact cents-sum (events.value is 2dp) — see relational.cents
            (F.sum(exact_units(F.col("value"))).cast("double") / 100)
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "ext_rank_window",
    oracle=(
        "SELECT c_custkey, c_nationkey, c_acctbal, "
        "row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn, "
        "rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk, "
        "dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk "
        "FROM customer"
    ),
    doc="Ranking windows (SURVEY §2.8 ext_rank_window): row_number/rank/dense_rank.",
)
def ext_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "ext_sessionize",
    oracle=(
        "WITH flagged AS ("
        "  SELECT user_id, ts, event_id, "
        "  CASE WHEN lag(ts) OVER w IS NULL "
        "       OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END "
        "  AS new_session "
        "  FROM events WHERE ts IS NOT NULL "
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sessions AS ("
        "  SELECT user_id, ts, "
        "  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS UNBOUNDED PRECEDING) AS session_id FROM flagged) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
        "COUNT(*) AS n_events, CAST(MIN(ts) AS TIMESTAMP) AS session_start, "
        "CAST(MAX(ts) AS TIMESTAMP) AS session_end "
        "FROM sessions GROUP BY user_id, session_id"
    ),
    doc=(
        "Sessionization, 30-min gap (SURVEY §2.8 ext_sessionize): lag → "
        "new-session flag → running sum = session id → per-session agg. "
        "Batch formulation; streaming variant in streaming/ uses "
        "session_window."
    ),
)
def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return sessionized(e, 1800).groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
