"""Relational core operators (SURVEY.md §2.1–2.6) over the testdata.

Each entry re-expresses one operator the reference exercises
(pipeline.py / queries.sql cites in docstrings) as an idiomatic
DataFrame plan, with a DuckDB oracle over the same parquet views.

Scale notes are inline: every plan here is shuffle-minimal — filters
and projections push to the parquet scan, small dimensions broadcast,
and aggregates do map-side partial aggregation for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.functions.scalars import exact_units
from duckdb_data_eng_proj_spark.io.sources import read_csv_all_varchar
from duckdb_data_eng_proj_spark.queries.registry import register, t

from duckdb_data_eng_proj_spark.io.scratch import scratch_dir as _scratch

DEC = "decimal(18,2)"


def cents(col):
    """Exact integer-cents of a 2-decimal double column.

    Testdata money columns are true 2dp values, so ``round(x*100, 0)``
    is deterministic and engine-identical (never an exact .5 boundary).
    Long sums are exact, associative, and ~3× faster than Spark's
    decimal aggregation path.
    """
    return exact_units(F.col(col))


# ---------------------------------------------------------------------------
# §2.1 scans / sources / sinks
# ---------------------------------------------------------------------------


@register(
    "src_parquet",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    doc="Parquet scan (TESTDATA.md). Columnar, prunable, splittable at 100 TB.",
)
def src_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@register(
    "src_csv_all_varchar",
    oracle="SELECT CAST(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    doc=(
        "All-VARCHAR tolerant CSV scan (reference: pipeline.py:43-77, "
        "all_varchar=true). Round-trips region through CSV with an explicit "
        "all-StringType schema; values must equal DuckDB's VARCHAR casts."
    ),
)
def src_csv_all_varchar(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("region_csv")
    region = t(spark, sf_dir, "region")
    (
        region.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )
    df = read_csv_all_varchar(spark, path, ["r_regionkey", "r_name"], extra=None)
    return df.select("r_regionkey", "r_name")


@register(
    "snk_csv_quoted",
    oracle=(
        "SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS o_totalprice_dec, "
        "o_orderstatus FROM orders WHERE o_orderkey < 500"
    ),
    doc=(
        "Quote-all CSV export, NULL→empty (reference: pipeline.py:497-522, "
        "FORCE_QUOTE *, NULL ''). Writes a slice of orders, reads it back "
        "all-varchar; single file via coalesce(1) like the golden outputs."
    ),
)
def snk_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("orders_csv_sink")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast(DEC).alias("o_totalprice_dec"),
            "o_orderstatus",
        )
    )
    (
        o.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("nullValue", "")
        .option("emptyValue", '""')
        .csv(path)
    )
    return read_csv_all_varchar(
        spark, path, ["o_orderkey", "o_totalprice_dec", "o_orderstatus"], extra=None
    )


@register(
    "src_table_stage",
    oracle=(
        "WITH stage_customers AS (SELECT c_custkey, c_name, c_mktsegment "
        "FROM customer WHERE c_acctbal > 5000.0) "
        "SELECT c_mktsegment, COUNT(*) AS n FROM stage_customers GROUP BY c_mktsegment"
    ),
    doc=(
        "CREATE TABLE AS staging chain (reference: pipeline.py:40-45 et al.) "
        "as temp views: stage → downstream read by name."
    ),
)
def src_table_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    stage.createOrReplaceTempView("stage_customers")
    return spark.table("stage_customers").groupBy("c_mktsegment").agg(F.count("*").alias("n"))


@register(
    "src_param_sql",
    oracle="SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0",
    doc="Parameterized SQL (reference: pipeline.py:43-58 '?' binding) via spark.sql args.",
)
def src_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT c_custkey, c_name FROM customer WHERE c_acctbal > :thr",
        args={"thr": 9000.0},
    )


@register(
    "src_table_persist",
    oracle=(
        "SELECT c_mktsegment, COUNT(*) AS n_cust, "
        "CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100 "
        "AS total_bal "
        "FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment"
    ),
    doc=(
        "PERSISTENT warehouse round-trip — the Spark equivalent of the "
        "reference's takehome.duckdb (pipeline.py:12,35): a staged "
        "table is written with saveAsTable into a catalog database "
        "with an explicit LOCATION, then re-read BY NAME via "
        "spark.table and aggregated. Entry point 2 (queries.sql run in "
        "a later session) resolves the same name against the same "
        "warehouse path — physical parquet under the database "
        "location, metadata in the catalog. At 100 TB this is the "
        "lakehouse pattern: managed parquet tables, partition-pruned "
        "scans, any number of sessions."
    ),
)
def src_table_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.io.scratch import graft_warehouse

    # shared warehouse helper: one location literal repo-wide (r16
    # review — see graft_warehouse's docstring for the
    # LOCATION-ignored trap this prevents)
    graft_warehouse(spark, "customer_stage")
    staged = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    staged.write.mode("overwrite").format("parquet").saveAsTable(
        "graft_wh.customer_stage"
    )
    # re-read by catalog name — a later session against the same
    # warehouse dir resolves identically
    back = spark.table("graft_wh.customer_stage")
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        (F.sum(cents("c_acctbal")).cast("double") / 100).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@register("prj_star", oracle="SELECT * FROM region", doc="SELECT * pass-through (pipeline.py:91-93).")
def prj_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "region").select("*")


@register(
    "prj_explicit",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    doc="Explicit column list / projection pruning (pipeline.py:98-113).",
)
def prj_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "prj_alias",
    oracle=(
        "SELECT l_orderkey AS order_ref, l_linenumber AS line_no, "
        "l_quantity AS qty FROM lineitem"
    ),
    doc="Rename-on-collision projection (pipeline.py:346,356,364-365).",
)
def prj_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_ref"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "prj_derive_case",
    oracle=(
        "SELECT o_orderkey, CASE WHEN o_totalprice >= 300000 THEN 'jumbo' "
        "WHEN o_totalprice >= 150000 THEN 'large' "
        "WHEN o_totalprice >= 50000 THEN 'medium' "
        "WHEN o_totalprice >= 10000 THEN 'small' "
        "ELSE 'micro' END AS order_size_band FROM orders"
    ),
    doc="Searched CASE → derived categorical (risk_category, pipeline.py:164-171).",
)
def prj_derive_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.col("o_totalprice")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(p >= 300000, "jumbo")
        .when(p >= 150000, "large")
        .when(p >= 50000, "medium")
        .when(p >= 10000, "small")
        .otherwise("micro")
        .alias("order_size_band"),
    )


@register(
    "prj_derive_ratio",
    oracle=(
        "SELECT o.o_orderkey, "
        "CASE WHEN c.c_acctbal IS NULL OR c.c_acctbal <= 0 THEN NULL "
        "ELSE o.o_totalprice / c.c_acctbal END AS price_to_balance "
        "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
    doc=(
        "Guarded-division derived ratio (loan_to_income_ratio, "
        "pipeline.py:173-176). Customer side broadcasts (small dim)."
    ),
)
def prj_derive_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    bal = F.col("c_acctbal")
    return joined.select(
        "o_orderkey",
        F.when(bal.isNull() | (bal <= 0), F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice") / bal)
        .alias("price_to_balance"),
    )


@register(
    "flt_null_blank",
    oracle=(
        "WITH dirty AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 THEN '  ' "
        "WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS name_dirty FROM customer) "
        "SELECT c_custkey, name_dirty FROM dirty "
        "WHERE name_dirty IS NULL OR TRIM(name_dirty) = ''"
    ),
    doc="NULL-or-blank predicate (pipeline.py:93,112,149): x IS NULL OR TRIM(x)=''.",
)
def flt_null_blank(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("c_custkey")
    dirty = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(k % 7 == 0, "  ")
        .when(k % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("name_dirty"),
    )
    nd = F.col("name_dirty")
    return dirty.filter(nd.isNull() | (F.trim(nd) == ""))


@register(
    "flt_equality",
    oracle="SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
    doc="Equality filter on normalized value (status='approved', pipeline.py:236).",
)
def flt_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )


@register(
    "flt_compound",
    oracle=(
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE (l_discount > 0.05 AND l_quantity < 10) "
        "OR (NOT (l_returnflag = 'N') AND l_tax >= 0.07)"
    ),
    doc="AND/OR/NOT compound predicates (pipeline.py:149-157; queries.sql:105-111).",
)
def flt_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cond = ((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 10)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_tax") >= 0.07)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@register(
    "flt_in_list",
    oracle=(
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')"
    ),
    doc="Literal-tuple membership (installation_type NOT IN (...), pipeline.py:155-156).",
)
def flt_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "flt_between",
    oracle=(
        "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal BETWEEN 0 AND 1000"
    ),
    doc="BETWEEN range predicate (credit bands, pipeline.py:168-169).",
)
def flt_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").between(0, 1000))
        .select("c_custkey", "c_acctbal")
    )


@register(
    "flt_regex",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE regexp_matches(c_name, '^Customer#00000000[0-9]$')"
    ),
    doc=(
        "Regex validation filter (postal ^[0-9]{5}$, pipeline.py:154,262) "
        "via rlike. Names are 9-digit zero-padded, so 8 zeros + digit "
        "selects custkey 0-9 — a non-vacuous match at every sf (the "
        "round-1 7-zero pattern matched nothing: 0=0 proves nothing)."
    ),
)
def flt_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_name").rlike("^Customer#00000000[0-9]$"))
        .select("c_custkey", "c_name")
    )


@register(
    "flt_in_subquery",
    oracle=(
        "SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)"
    ),
    doc=(
        "IN-subquery predicate (duplicate flags, pipeline.py:150,263-264). "
        "Catalyst rewrites to a null-aware semi join (SURVEY G2)."
    ),
)
def flt_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)"
    )


@register(
    "flt_notin_subquery",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_custkey IS NOT NULL AND o_orderstatus = 'F')"
    ),
    doc=(
        "NOT-IN with null-guarded subquery (q0 curated view, queries.sql:8-17). "
        "Null guard makes it ≡ anti join."
    ),
)
def flt_notin_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_custkey IS NOT NULL AND o_orderstatus = 'F')"
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_left_fanout",
    oracle=(
        "SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_quantity "
        "FROM orders o LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l "
        "ON o.o_orderkey = l.l_orderkey"
    ),
    doc=(
        "LEFT OUTER equi-join with intended 1:N fan-out (apps⟕LMS, "
        "pipeline.py:381-383). At scale: shuffle-hash on o_orderkey; AQE "
        "splits skewed keys."
    ),
)
def join_left_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"
    )


@register(
    "join_cross_scalar",
    oracle=(
        "SELECT a.total_orders, b.total_customers, c.total_lineitems FROM "
        "(SELECT COUNT(*) AS total_orders FROM orders) a CROSS JOIN "
        "(SELECT COUNT(*) AS total_customers FROM customer) b CROSS JOIN "
        "(SELECT COUNT(*) AS total_lineitems FROM lineitem) c"
    ),
    doc="CROSS JOIN of 1-row aggregate subqueries (report row, pipeline.py:489-491).",
)
def join_cross_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = t(spark, sf_dir, "orders").agg(F.count("*").alias("total_orders"))
    b = t(spark, sf_dir, "customer").agg(F.count("*").alias("total_customers"))
    c = t(spark, sf_dir, "lineitem").agg(F.count("*").alias("total_lineitems"))
    return a.crossJoin(b).crossJoin(c)


@register(
    "join_semi_flag",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000)"
    ),
    doc="Left-semi join (IN-flag semantics, pipeline.py:150,263-264).",
)
def join_semi_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_curated",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000)"
    ),
    doc=(
        "Left-anti join (q0 curated-view exclusion, queries.sql:2-18): "
        "customers with no 300k+ order. The exclusion set is filtered "
        "(every customer has SOME order in this data — the unfiltered "
        "anti-join was a vacuous 0=0 oracle match in round 1)."
    ),
)
def join_anti_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_group_having",
    oracle=(
        "SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem "
        "GROUP BY l_orderkey HAVING COUNT(*) > 4"
    ),
    doc="GROUP BY + HAVING COUNT(*)>k duplicate detection (app_dupes, pipeline.py:116-124).",
)
def agg_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") > 4)
    )


@register(
    "agg_global_counters",
    oracle=(
        "SELECT COUNT(*) AS total_orders, "
        # DuckDB SUM(INT) yields HUGEINT, which serializes differently
        # from Spark's BIGINT in the driver's hasher — pin BIGINT.
        "CAST(SUM(CAST(o_totalprice > 200000 AS INT)) AS BIGINT) AS flag_big_order, "
        "CAST(SUM(CAST(o_orderstatus = 'F' AS INT)) AS BIGINT) AS flag_finished, "
        "CAST(SUM(CAST(o_orderpriority = '1-URGENT' AS INT)) AS BIGINT) AS flag_urgent "
        "FROM orders"
    ),
    doc="Global counter block: COUNT(*) + SUM(flag::INT) (report, pipeline.py:393-421).",
)
def agg_global_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_orders"),
        F.sum((F.col("o_totalprice") > 200000).cast("int")).alias("flag_big_order"),
        F.sum((F.col("o_orderstatus") == "F").cast("int")).alias("flag_finished"),
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("flag_urgent"),
    )


@register(
    "agg_conditional",
    oracle=(
        "SELECT l_returnflag, "
        # BIGINT / DOUBLE result types on both sides: DuckDB HUGEINT and
        # DECIMAL serialize differently from Spark in the driver hasher.
        "CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk, "
        "CAST(SUM(CASE WHEN l_quantity > 25 THEN "
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100 "
        "AS bulk_revenue, "
        "CAST(ROUND(CAST(SUM(CASE WHEN l_quantity > 25 THEN "
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS DOUBLE) / 100 "
        "/ NULLIF(COUNT(CASE WHEN l_quantity > 25 THEN 1 END), 0), 4) AS DOUBLE) "
        "AS avg_bulk_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Conditional aggregation incl. ELSE-less AVG (queries.sql:42-75): the "
        "AVG must not dilute with non-matching rows. Expressed as exact "
        "decimal SUM / COUNT so the value is partition-order independent."
    ),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") > 25
    price_cents = cents("l_extendedprice")
    sum_bulk_cents = F.sum(F.when(bulk, price_cents))
    cnt_bulk = F.count(F.when(bulk, F.lit(1)))
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(bulk, 1).otherwise(0)).alias("n_bulk"),
        (F.sum(F.when(bulk, price_cents).otherwise(F.lit(0))).cast("double") / 100)
        .alias("bulk_revenue"),
        F.round(
            (sum_bulk_cents / F.lit(100.0)).cast("double") / F.nullif(cnt_bulk, F.lit(0)), 4
        )
        .cast("double")
        .alias("avg_bulk_price"),
    )


@register(
    "agg_rate_nullif",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "CAST(ROUND(1.0 * SUM(CAST(o_orderstatus = 'F' AS INT)) "
        "/ NULLIF(COUNT(*), 0), 4) AS DOUBLE) AS finished_rate "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc="Ratio-of-aggregates with NULLIF guard + ROUND (queries.sql:50-58).",
)
def agg_rate_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    fin = F.sum((F.col("o_orderstatus") == "F").cast("int"))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.lit(1.0) * fin / F.nullif(F.count("*"), F.lit(0)), 4)
        .cast("double")
        .alias("finished_rate"),
    )


@register(
    "agg_multikey",
    oracle=(
        "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cohort_month, "
        "o_orderpriority AS priority, COUNT(*) AS n_orders "
        "FROM orders GROUP BY 1, 2"
    ),
    doc=(
        "Two-key grouping (month × installation_type, queries.sql:78-80). "
        "cohort_month standardized to DATE (DuckDB date_trunc returns DATE "
        "at month granularity; Spark's returns TIMESTAMP → explicit cast)."
    ),
)
def agg_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("cohort_month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n_orders"))


@register(
    "agg_distinct",
    oracle="SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000",
    doc="SELECT DISTINCT under predicate (pipeline.py:427,440).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
        .distinct()
    )


@register(
    "agg_array_ordered",
    oracle=(
        "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations "
        "FROM nation GROUP BY n_regionkey"
    ),
    doc=(
        "Ordered array_agg (problematic_application_ids, pipeline.py:483-485). "
        "collect_list is partition-order nondeterministic → array_sort before "
        "joining; compared as a delimited string."
    ),
)
def agg_array_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "agg_scalar_subquery",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "(SELECT COUNT(*) FROM orders) AS total_orders "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc="Scalar subquery embedded in a projection (pipeline.py:483-485).",
)
def agg_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "(SELECT COUNT(*) FROM orders) AS total_orders "
        "FROM orders GROUP BY o_orderpriority"
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "win_partition_sum",
    oracle=(
        "WITH monthly AS ("
        "  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cohort_month, "
        "         o_orderpriority AS priority, COUNT(*) AS n_orders, "
        "         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) "
        "         AS vol_cents "
        "  FROM orders GROUP BY 1, 2), "
        # NULL-SAFE join-back (r17 hostile vintage): the original
        # USING(cohort_month) dropped a NULL-month group (NULL = NULL
        # is false) while Spark's SUM OVER (PARTITION BY cohort_month)
        # treats NULL as a partition like any other. A DuckDB window
        # over the derived-NULL partition key read NONDETERMINISTIC
        # sums on the hostile vintage (observed live, 3 runs, 3
        # different NULL-group totals), so the oracle replays the
        # window with an IS NOT DISTINCT FROM join-back instead —
        # deterministic and NULL-grouping like Spark's window.
        "mt AS (SELECT cohort_month, CAST(SUM(vol_cents) AS BIGINT) AS mvol_cents "
        "       FROM monthly GROUP BY cohort_month) "
        "SELECT m.cohort_month, m.priority, m.n_orders, "
        "CAST(m.vol_cents AS DOUBLE) / 100 AS volume, "
        "CAST(ROUND(CAST(m.vol_cents AS DOUBLE) / "
        "CAST(NULLIF(mt.mvol_cents, 0) AS DOUBLE), 4) AS DOUBLE) AS volume_share "
        "FROM monthly m JOIN mt "
        "ON m.cohort_month IS NOT DISTINCT FROM mt.cohort_month"
    ),
    doc=(
        "FLAGSHIP (q5 analog, queries.sql:206-245): monthly order volume by "
        "priority with share-of-month denominator. The share is SUM OVER "
        "(PARTITION BY month); a window straight over the aggregated rows "
        "would force a second full-width exchange just to sum ~400 rows, "
        "so the post-agg output is coalesced to one partition first — a "
        "single partition satisfies any clustering, so the window runs "
        "with no further exchange. One shuffle total (the groupBy); the "
        "group count is months×priorities, bounded at any data scale."
    ),
)
def win_partition_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("cohort_month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("vol_cents"),
    )
    mvol = F.sum("vol_cents").over(Window.partitionBy("cohort_month"))
    return monthly.coalesce(1).select(
        "cohort_month",
        "priority",
        "n_orders",
        (F.col("vol_cents").cast("double") / 100).alias("volume"),
        F.round(
            F.col("vol_cents").cast("double")
            / F.nullif(mvol, F.lit(0)).cast("double"),
            4,
        )
        .cast("double")
        .alias("volume_share"),
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_multikey",
    oracle=(
        "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
        "WHERE o_totalprice > 350000 "
        "ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC"
    ),
    doc="Multi-key mixed asc/desc ORDER BY (queries.sql:81-83,112-113).",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
    )


@register(
    "set_union_distinct",
    oracle=(
        "SELECT o_custkey FROM orders WHERE o_totalprice > 300000 "
        "UNION "
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
    ),
    doc=(
        "UNION (distinct) of two problem sets (pipeline.py:439). Spark union "
        "is UNION ALL → explicit .distinct()."
    ),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.union(b).distinct()
