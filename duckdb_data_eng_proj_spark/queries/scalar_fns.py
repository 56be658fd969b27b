"""Scalar-function surface (SURVEY.md §2.7) — the reference's complete
scalar census, each as an oracle-checked query over testdata.

Dialect shims baked in (SURVEY G4/G5 + fn_* rows):
- DuckDB ``regexp_replace`` is first-match unless 'g'; Spark is
  all-match. The engine standardizes on all-match; oracle SQL spells
  the 'g' flag so both agree.
- ``date_diff('month', a, b)`` counts month-boundary crossings, NOT
  fractional months — implemented as (year*12+month) difference,
  never ``months_between``.
- ``date_trunc('month', DATE)`` returns DATE in DuckDB; Spark's
  ``date_trunc`` returns TIMESTAMP → use ``F.trunc`` for DATE parity.
- wall-clock columns (``processed_at``) are nondeterministic → no SQL
  oracle (rows-only check), injectable clock in the ETL module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.functions.scalars import exact_units
from duckdb_data_eng_proj_spark.queries.registry import register, t


@register(
    "fn_string_norm",
    oracle=(
        "SELECT c_custkey, LOWER(c_name) AS name_lower, "
        "TRIM(c_mktsegment) AS seg_trim, "
        "regexp_replace(c_name, '[#]+', '', 'g') AS name_nohash "
        "FROM customer"
    ),
    doc="LOWER/TRIM/REGEXP_REPLACE normalization (pipeline.py:133,143; G4 'g' flag).",
)
def fn_string_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.regexp_replace("c_name", "[#]+", "").alias("name_nohash"),
    )


@register(
    "fn_regex_match",
    oracle=(
        "SELECT event_id, regexp_matches(props, '\"k\": [0-9]{2}}') AS has_2digit_k "
        "FROM events"
    ),
    doc="regexp_matches as boolean column (pipeline.py:154,262) via rlike.",
)
def fn_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.col("props").rlike('"k": [0-9]{2}}').alias("has_2digit_k")
    )


@register(
    "fn_try_cast",
    oracle=(
        "SELECT o_orderkey, "
        "TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INTEGER) AS roundtrip_int, "
        "TRY_CAST(o_orderstatus AS DOUBLE) AS bad_double, "
        "TRY_CAST('NULL' AS DOUBLE) AS null_literal, "
        "TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS parsed_date "
        "FROM orders"
    ),
    doc=(
        "TRY_CAST totality (pipeline.py:136-141): failed casts → NULL, never "
        "errors; the literal string 'NULL' also → NULL. Whole quality model "
        "depends on this."
    ),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").try_cast("int").alias("roundtrip_int"),
        F.col("o_orderstatus").try_cast("double").alias("bad_double"),
        F.lit("NULL").try_cast("double").alias("null_literal"),
        F.date_format("o_orderdate", "yyyy-MM-dd").try_cast("date").alias("parsed_date"),
    )


@register(
    "fn_cast",
    oracle=(
        "SELECT o_orderkey, CAST(o_totalprice > 100000 AS INT) AS flag_int, "
        "CAST(o_orderkey AS VARCHAR) AS key_str, "
        "CAST(ROUND(o_totalprice, 0) AS INTEGER) AS price_int "
        "FROM orders"
    ),
    doc=(
        "CAST family (pipeline.py:396-419): BOOLEAN::INT (true→1), "
        "::VARCHAR, DOUBLE::INTEGER. NOTE double→int rounds half-even in "
        "DuckDB but truncates in Spark — parity via round-then-cast."
    ),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") > 100000).cast("int").alias("flag_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.round("o_totalprice", 0).cast("int").alias("price_int"),
    )


@register(
    "fn_date_trunc",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_ts, "
        "CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year_ts, "
        "CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_date "
        "FROM orders"
    ),
    doc=(
        "date_trunc: TIMESTAMP in/out via F.date_trunc; DATE in/out needs "
        "F.trunc (Spark date_trunc always returns TIMESTAMP — SURVEY "
        "fn_date_trunc probe)."
    ),
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_ts"),
        F.date_trunc("year", "o_orderdate").alias("year_ts"),
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month_date"),
    )


@register(
    "fn_date_diff_month",
    oracle=(
        "SELECT l.l_orderkey, l.l_linenumber, "
        "date_diff('month', o.o_orderdate, l.l_shipdate) AS months_to_ship "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ),
    doc=(
        "Month-boundary-crossing date_diff (months_since_disbursement, "
        "pipeline.py:376-379): (y2*12+m2)-(y1*12+m1), NOT months_between "
        "(fractional). ✓probe: 01-31→02-01 = 1; 01-01→01-31 = 0."
    ),
)
def fn_date_diff_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner")
    months = (F.year("l_shipdate") * 12 + F.month("l_shipdate")) - (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    )
    return j.select("l_orderkey", "l_linenumber", months.cast("bigint").alias("months_to_ship"))


@register(
    "fn_now_tz",
    # The clock is injectable (SURVEY G5), so the oracle pins the same
    # instant the ETL golden run pins (etl/oracle_sql.py): the Spark
    # side converts the pinned UTC instant through the real
    # Europe/Berlin tz expression (11:30:57 UTC -> 12:30:57 CET) while
    # the oracle states the expected Berlin wall-clock literal — the
    # last feasible §2 row becomes hash-gated (VERDICT r4 #3).
    oracle=(
        "SELECT r_regionkey, TIMESTAMP '2026-01-23 12:30:57' "
        "AS processed_at FROM region"
    ),
    doc=(
        "processed_at audit column (pipeline.py:202,327,487): "
        "date_trunc('second', now() AT TIME ZONE 'Europe/Berlin'). "
        "The wall-clock is nondeterministic, so the instant is "
        "injectable exactly like the ETL module's run_ts: the "
        "registered entry pins the golden run's clock (hash-gated); "
        "_now_tz(..., now_utc=None) is the live-clock production path "
        "using the identical tz-conversion expression."
    ),
)
def fn_now_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _now_tz(spark, sf_dir, now_utc="2026-01-23 11:30:57")


def _now_tz(spark: SparkSession, sf_dir: str, now_utc: str | None = None) -> DataFrame:
    r = t(spark, sf_dir, "region")
    instant = (
        F.current_timestamp() if now_utc is None else F.to_timestamp(F.lit(now_utc))
    )
    return r.select(
        "r_regionkey",
        F.date_trunc(
            "second", F.from_utc_timestamp(instant, "Europe/Berlin")
        ).alias("processed_at"),
    )


@register(
    "fn_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "(1 - CAST(l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS net_price, "
        "CAST(1.0 * l_quantity / 50 AS DOUBLE) AS qty_frac "
        "FROM lineitem"
    ),
    doc=(
        "ROUND / 1.0* promotion / division (queries.sql:50-75). net_price "
        "rounds an exact DECIMAL product — ROUND on raw doubles differs "
        "between engines on exact-half boundaries. Spark side computes "
        "the identical value in exact integer units (cents × (10000 − "
        "discount·10⁴) → e6 units, +5000 then truncate = round-half-up "
        "in cents, exact for the non-negative fixed-point domain) — "
        "pure codegen arithmetic instead of a per-row BigDecimal "
        "round-trip, which benched 2× slower (VERDICT r2 #3). The "
        "e6→cents truncation is safe in double: the quotient is ≥1e-4 "
        "away from an integer while the rounding error is ~1e-9."
    ),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cents = exact_units(F.col("l_extendedprice"))
    d4 = exact_units(F.col("l_discount"), 10000)
    net_e6 = cents * (F.lit(10000) - d4)
    net_cents = ((net_e6 + 5000) / 10000).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (net_cents.cast("double") / 100).alias("net_price"),
        (F.lit(1.0) * F.col("l_quantity") / 50).cast("double").alias("qty_frac"),
    )


@register(
    "fn_nullif",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "NULLIF(CAST(l_quantity AS INT) % 5, 0) AS qty_mod_or_null "
        "FROM lineitem"
    ),
    doc="NULLIF divide-guard (queries.sql:56,144).",
)
def fn_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_quantity").cast("int") % 5, F.lit(0)).alias("qty_mod_or_null"),
    )


@register(
    "fn_json_map",
    oracle=(
        "SELECT o_orderkey, to_json(MAP(['flag_big', 'flag_urgent'], "
        "[o_totalprice > 200000, o_orderpriority = '1-URGENT'])) AS quality_flags "
        "FROM orders"
    ),
    doc=(
        "to_json(map(k→bool)) quality-flag JSON (pipeline.py:179-200). "
        "✓probe: both engines emit identical text incl. key order."
    ),
)
def fn_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.create_map(
                F.lit("flag_big"),
                F.col("o_totalprice") > 200000,
                F.lit("flag_urgent"),
                F.col("o_orderpriority") == "1-URGENT",
            )
        ).alias("quality_flags"),
    )


@register(
    "fn_unnest",
    oracle=(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents"
    ),
    doc="UNNEST lateral expansion (queries.sql:13-14) via explode(split()).",
)
def fn_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "fn_case",
    oracle=(
        "SELECT c_custkey, CASE "
        "WHEN c_acctbal < 0 THEN 'negative' "
        "WHEN c_acctbal < 1000 THEN 'low' "
        "WHEN c_acctbal < 5000 THEN 'mid' "
        "ELSE 'high' END AS balance_band FROM customer"
    ),
    doc="Searched CASE (pipeline.py:164-176).",
)
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(b < 0, "negative")
        .when(b < 1000, "low")
        .when(b < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
    )
