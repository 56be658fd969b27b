"""TPC-H-shape analytics over the star schema (Q1/Q3/Q5/Q6 analogs).

The driver's testdata is TPC-H-ish (TESTDATA.md); these are the
classic plan shapes a warehouse engine must nail, adapted to the
available columns. Money math uses exact integer units end-to-end:
``extendedprice`` is 2 dp (cents), ``discount``/``tax`` are 2 dp
fractions (basis-point hundredths), so
``price_cents × (100 - d100)`` is an exact long in 10⁻⁴ currency
units and ``× (100 + t100)`` in 10⁻⁶ — summed associatively, then
converted to DECIMAL once. Both engines run the SAME integer plan, so
hashes match bit-for-bit regardless of partitioning.

Scale notes: Q1 is the pure partial-agg pipeline (one 4-row shuffle);
Q3/Q5 are selective-dimension broadcast joins feeding one big-side
shuffle each (AQE would demote to SMJ when the build side grows); Q6
is scan + pushed filters + map-side combine — the scan-bandwidth
benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.functions.scalars import exact_units
from duckdb_data_eng_proj_spark.queries.registry import register, t

# exact integer units (see module docstring)
_C = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"  # cents
_D = "CAST(round(l_discount * 100, 0) AS BIGINT)"  # 2dp fraction ×100
_T = "CAST(round(l_tax * 100, 0) AS BIGINT)"
_Q = "CAST(round(l_quantity * 100, 0) AS BIGINT)"


def _cents(col: str) -> F.Column:
    return exact_units(F.col(col))


def _disc_price_e4() -> F.Column:
    """extendedprice*(1-discount) in exact 10^-4 units."""
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


def _charge_e6() -> F.Column:
    """extendedprice*(1-discount)*(1+tax) in exact 10^-6 units."""
    return _disc_price_e4() * (100 + _cents("l_tax"))


def _dbl(expr: F.Column, divisor: int) -> F.Column:
    """Exact integer-unit sum → DOUBLE (sum/divisor).

    The sum itself is an exact integer on both engines; int→double
    conversion and the single division are IEEE-identical, while
    DECIMAL result columns serialize differently in the driver hasher
    (round-1 hash-fail root cause) — so money totals emit DOUBLE.
    """
    return expr.cast("double") / divisor


@register(
    "tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        f"CAST(SUM({_Q}) AS DOUBLE) / 100 AS sum_qty, "
        f"CAST(SUM({_C}) AS DOUBLE) / 100 AS sum_base_price, "
        f"CAST(SUM({_C} * (100 - {_D})) AS DOUBLE) / 10000 AS sum_disc_price, "
        f"CAST(SUM({_C} * (100 - {_D}) * (100 + {_T})) AS DOUBLE) / 1000000 "
        "AS sum_charge, "
        f"round(CAST(SUM({_Q}) AS DOUBLE) / COUNT(*) / 100, 4) AS avg_qty, "
        f"round(CAST(SUM({_C}) AS DOUBLE) / COUNT(*) / 100, 4) AS avg_price, "
        f"round(CAST(SUM({_D}) AS DOUBLE) / COUNT(*) / 100, 4) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    doc=(
        "TPC-H Q1 shape: full-scan pricing summary. Partial aggregation "
        "reduces every partition to ≤|flag×status| rows before the "
        "single tiny shuffle — the canonical map-side-combine plan."
    ),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dbl(F.sum(_cents("l_quantity")), 100).alias("sum_qty"),
        _dbl(F.sum(_cents("l_extendedprice")), 100).alias("sum_base_price"),
        _dbl(F.sum(_disc_price_e4()), 10000).alias("sum_disc_price"),
        _dbl(F.sum(_charge_e6()), 1000000).alias("sum_charge"),
        F.round(F.sum(_cents("l_quantity")).cast("double") / n / 100, 4).alias(
            "avg_qty"
        ),
        F.round(F.sum(_cents("l_extendedprice")).cast("double") / n / 100, 4).alias(
            "avg_price"
        ),
        F.round(F.sum(_cents("l_discount")).cast("double") / n / 100, 4).alias(
            "avg_disc"
        ),
        n.alias("count_order"),
    )


@register(
    "tpch_q3",
    oracle=(
        "SELECT l.l_orderkey, "
        f"CAST(SUM({_C} * (100 - {_D})) AS DOUBLE) / 10000 AS revenue, "
        "CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderpriority "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
        "ORDER BY revenue DESC, l.l_orderkey LIMIT 10"
    ),
    doc=(
        "TPC-H Q3 shape: shipping-priority top-10. Selective customer "
        "dimension broadcasts into orders, the result broadcasts into "
        "the lineitem scan; one shuffle (the groupBy), then a global "
        "top-k sort of the aggregated rows only. Deterministic "
        "tie-break on l_orderkey."
    ),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    j = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dbl(F.sum(_disc_price_e4()), 10000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5",
    oracle=(
        "SELECT n.n_name, "
        f"CAST(SUM({_C} * (100 - {_D})) AS DOUBLE) / 10000 AS revenue "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "AND c.c_nationkey = s.s_nationkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY n.n_name"
    ),
    doc=(
        "TPC-H Q5 shape: local-supplier revenue by nation — the 6-way "
        "star join. Every dimension (region→nation→supplier, customer) "
        "broadcasts; lineitem⋈orders is the one big shuffle. The "
        "c_nationkey = s_nationkey predicate closes the snowflake loop."
    ),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
    )
    return j.groupBy("n_name").agg(
        _dbl(F.sum(_disc_price_e4()), 10000).alias("revenue")
    )


@register(
    "tpch_q6",
    oracle=(
        f"SELECT CAST(SUM({_C} * {_D}) AS DOUBLE) / 10000 AS revenue, "
        "COUNT(*) AS n_lines "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 "
        "AND l_quantity < 24"
    ),
    doc=(
        "TPC-H Q6 shape: forecast-revenue-change — scan + 4 pushed "
        "predicates + global sum. The scan-bandwidth benchmark: the "
        "whole query is one codegen stage, no shuffle beyond the "
        "single-row final combine."
    ),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dbl(
            F.sum(_cents("l_extendedprice") * _cents("l_discount")), 10000
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )
