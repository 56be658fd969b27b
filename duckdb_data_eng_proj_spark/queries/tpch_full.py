"""TPC-H completion: the 8 remaining classic shapes (Q2/Q8/Q9/Q11/
Q15/Q16/Q20/Q21 analogs) over the star-schema testdata.

The testdata has no ``partsupp`` table, so the part↔supplier relation
is derived from ``lineitem`` (who actually shipped which part), and
``supply cost`` / ``available quantity`` proxies come from lineitem
prices and quantities — same plan shapes, adapted columns (the same
stand-in policy as tpch.py's Q4/Q7 analogs; reference surface itself
has no TPC-H — these extend it per the north star).

Money/quantity math follows tpch.py's exact-integer-unit rule: cents
(and 10^-4 products) are summed as BIGINT on both engines, converted
to DOUBLE once at the end, so order-insensitive value hashes match
bit-for-bit under any partitioning.

Broadcast-hint policy is inherited from tpch.py: hints only on sides
bounded at every scale (nation, region, 1-row scalar aggregates);
per-entity tables (supplier, customer, part) and facts join unhinted
so the 100 TB plan degrades to shuffle joins instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries.registry import register, t
from duckdb_data_eng_proj_spark.queries.tpch import (
    _C,
    _D,
    _Q,
    _cents,
    _dbl,
    _disc_price_e4,
)


@register(
    "tpch_q2",
    oracle=(
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        f"MIN({_C}) AS cost_c FROM lineitem GROUP BY 1, 2), "
        "eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'EUROPE'), "
        "mc AS (SELECT ps.l_partkey, MIN(ps.cost_c) AS min_cost_c "
        "FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey GROUP BY 1) "
        "SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_brand, "
        "CAST(ps.cost_c AS DOUBLE) / 100 AS supply_cost "
        "FROM part p "
        "JOIN ps ON ps.l_partkey = p.p_partkey "
        "JOIN eu ON eu.s_suppkey = ps.l_suppkey "
        "JOIN mc ON mc.l_partkey = p.p_partkey AND ps.cost_c = mc.min_cost_c "
        "WHERE p.p_size BETWEEN 1 AND 5 AND p.p_type = 'STANDARD' "
        "ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey "
        "LIMIT 100"
    ),
    doc=(
        "TPC-H Q2 shape: minimum-cost supplier. The part↔supplier "
        "catalog is derived from lineitem (min observed price in exact "
        "cents = supply cost); the classic correlated MIN subquery "
        "decorrelates into a per-part aggregate over region-eligible "
        "suppliers joined back on cost equality (exact integer cents, "
        "so the equality is engine-stable — never a float). Region/"
        "nation broadcast; supplier and the derived catalog join "
        "unhinted; top-100 sorts only the matched rows."
    ),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents("l_extendedprice")).alias("cost_c")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(eu, ps.l_suppkey == eu.s_suppkey)
    mc = eu_ps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost_c").alias("min_cost_c")
    )
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 5) & (F.col("p_type") == "STANDARD")
    )
    j = (
        eu_ps.join(p, F.col("l_partkey") == p.p_partkey)
        .join(
            mc,
            (F.col("mc_partkey") == F.col("p_partkey"))
            & (F.col("cost_c") == F.col("min_cost_c")),
        )
    )
    return (
        j.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("cost_c").cast("double") / 100).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q8",
    oracle=(
        "SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, "
        "round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_4' "
        f"THEN {_C} * (100 - {_D}) ELSE 0 END) AS DOUBLE) / "
        f"CAST(SUM({_C} * (100 - {_D})) AS DOUBLE), 4) AS mkt_share "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "JOIN region r ON cn.n_regionkey = r.r_regionkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY 1"
    ),
    doc=(
        "TPC-H Q8 shape: national market share — nation joined twice "
        "under different roles (customer market region vs supplier "
        "nation), a conditional share-of-total by year. Numerator and "
        "denominator are exact integer-unit sums; one division + round "
        "at the end. Nation/region broadcast; customer/supplier/part "
        "unhinted; lineitem⋈orders is the big shuffle."
    ),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    target = F.when(F.col("supp_nation") == "NATION_4", _disc_price_e4()).otherwise(
        F.lit(0)
    )
    return j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.round(
            F.sum(target).cast("double") / F.sum(_disc_price_e4()).cast("double"), 4
        ).alias("mkt_share")
    )


@register(
    "tpch_q9",
    oracle=(
        "SELECT n.n_name AS nation, "
        "CAST(year(o.o_orderdate) AS INT) AS o_year, "
        f"CAST(SUM({_C} * (100 - {_D}) - "
        f"CAST(round(p.p_retailprice * 100, 0) AS BIGINT) * {_Q}) AS DOUBLE) "
        "/ 10000 AS sum_profit "
        "FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE p.p_name LIKE '%widget%' "
        "GROUP BY 1, 2"
    ),
    doc=(
        "TPC-H Q9 shape: product-type profit by nation and year. "
        "Supply cost proxies as p_retailprice×quantity (no partsupp in "
        "the testdata); profit = disc_price − cost, both in exact "
        "10^-4 units so the sum is an exact BIGINT on both engines "
        "(profit can be negative — exact integers keep the hash "
        "stable where float summation wouldn't). LIKE-filtered part "
        "prunes ~1/8 of the build side before the fact join."
    ),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    profit_e4 = _disc_price_e4() - _cents("p_retailprice") * _cents("l_quantity")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(_dbl(F.sum(profit_e4), 10000).alias("sum_profit"))


@register(
    "tpch_q11",
    oracle=(
        "WITH asia AS (SELECT s.s_suppkey FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA'), "
        "pv AS (SELECT l.l_partkey, "
        f"CAST(SUM({_C} * (100 - {_D})) AS BIGINT) AS value_e4 "
        "FROM lineitem l JOIN asia ON l.l_suppkey = asia.s_suppkey "
        "GROUP BY 1) "
        "SELECT l_partkey AS p_partkey, "
        "CAST(value_e4 AS DOUBLE) / 10000 AS part_value FROM pv "
        "WHERE CAST(value_e4 AS DOUBLE) > "
        "(SELECT CAST(SUM(value_e4) AS DOUBLE) * 0.001 FROM pv)"
    ),
    doc=(
        "TPC-H Q11 shape: important-stock identification — per-part "
        "inventory value (shipped discounted value by ASIA suppliers "
        "stands in for ps_supplycost×availqty), kept where the part "
        "exceeds a fraction of the GLOBAL total: a scalar-aggregate "
        "subquery broadcast against the grouped set. Both sides of "
        "the threshold comparison are exact-integer sums cast to "
        "DOUBLE once, so the cut is engine-stable. The per-part "
        "aggregate is the one data-scaled shuffle; the global total "
        "reuses it (1-row broadcast)."
    ),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    asia = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem")
    pv = (
        li.join(asia, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price_e4()).alias("value_e4"))
    )
    total = pv.agg(
        (F.sum("value_e4").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_e4").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_e4").cast("double") / 10000).alias("part_value"),
        )
    )


@register(
    "tpch_q15",
    oracle=(
        "WITH rev AS (SELECT l_suppkey, "
        f"CAST(SUM({_C} * (100 - {_D})) AS BIGINT) AS rev_e4 "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
        "SELECT s.s_suppkey, s.s_name, "
        "CAST(rev.rev_e4 AS DOUBLE) / 10000 AS total_revenue "
        "FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey "
        "WHERE rev.rev_e4 = (SELECT MAX(rev_e4) FROM rev)"
    ),
    doc=(
        "TPC-H Q15 shape: top supplier — a quarter's revenue per "
        "supplier, then equality against the scalar MAX (the classic "
        "view + scalar-subquery pattern). Revenue is an exact BIGINT "
        "in 10^-4 units, so 'equals the max' is an exact comparison "
        "that returns ALL tied suppliers identically on both engines "
        "— the reason the spec uses a subquery, not LIMIT 1. The "
        "1-row max broadcasts; supplier joins the ~|suppliers| "
        "aggregate unhinted."
    ),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price_e4()).alias("rev_e4"))
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("max_e4"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "tpch_q16",
    oracle=(
        "SELECT p.p_brand, p.p_type, p.p_size, "
        "COUNT(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO' "
        "AND p.p_size IN (1, 4, 9, 16, 25, 36, 49) "
        "AND l.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3"
    ),
    doc=(
        "TPC-H Q16 shape: part/supplier relationship count — negated "
        "predicates + IN-list on the dimension, COUNT(DISTINCT) per "
        "group, and a NOT IN exclusion of flagged suppliers "
        "(negative balance stands in for the complaints comment "
        "scan). The exclusion set is tiny and data-bounded → "
        "broadcast anti-join (NOT IN is safe here: s_suppkey is a "
        "non-null key column); distinct-count shuffles once on the "
        "group key with partial distinct upstream."
    ),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    oracle=(
        "WITH sp AS (SELECT l_partkey, l_suppkey, "
        f"CAST(SUM({_Q}) AS BIGINT) AS qty_c, "
        f"CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' "
        f"AND l_shipdate < TIMESTAMP '1997-01-01' THEN {_Q} ELSE 0 END) "
        "AS BIGINT) AS qty96_c "
        "FROM lineitem GROUP BY 1, 2), "
        "hot AS (SELECT DISTINCT sp.l_suppkey FROM sp "
        "JOIN part p ON p.p_partkey = sp.l_partkey "
        "WHERE p.p_name LIKE 'small%' AND 2 * sp.qty96_c > sp.qty_c) "
        "SELECT s.s_name, s.s_acctbal FROM supplier s "
        "JOIN hot ON hot.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')"
    ),
    doc=(
        "TPC-H Q20 shape: potential part promotion — suppliers whose "
        "1996 shipments of a name-prefixed part exceed half their "
        "all-time quantity for it (availqty > ½·shipped proxies via "
        "the 2·qty96 > qtytotal exact-integer comparison; no float "
        "crosses an engine boundary). Nested semi-joins: the per-"
        "(part,supplier) aggregate filters against LIKE-pruned part, "
        "collapses to DISTINCT suppliers, then semi-joins the "
        "nation-filtered supplier dimension. One conditional "
        "aggregation replaces the spec's correlated subquery — the "
        "decorrelation a 100 TB plan needs."
    ),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    in96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_cents("l_quantity")).alias("qty_c"),
        F.sum(F.when(in96, _cents("l_quantity")).otherwise(F.lit(0))).alias(
            "qty96_c"
        ),
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    hot = (
        sp.join(p, sp.l_partkey == p.p_partkey)
        .filter(F.lit(2) * F.col("qty96_c") > F.col("qty_c"))
        .select("l_suppkey")
        .distinct()
    )
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return s.join(hot, s.s_suppkey == F.col("l_suppkey"), "left_semi").select(
        "s_name", "s_acctbal"
    )


@register(
    "tpch_q21",
    oracle=(
        "WITH lo AS (SELECT l.l_orderkey, l.l_suppkey, "
        "(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus = 'F') "
        "SELECT s.s_name, COUNT(*) AS numwait FROM lo l1 "
        "JOIN supplier s ON s.s_suppkey = l1.l_suppkey "
        "WHERE l1.late "
        "AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lo l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.late) "
        "GROUP BY 1 ORDER BY numwait DESC, s.s_name LIMIT 20"
    ),
    doc=(
        "TPC-H Q21 shape: suppliers who kept orders waiting — the "
        "EXISTS / NOT-EXISTS self-join pair over the same derived "
        "relation ('late' = shipped >90 days after the order date, "
        "standing in for receipt>commit). The correlated subqueries "
        "become a semi-join (another supplier touched the order) and "
        "an anti-join (no OTHER supplier was late) on the shared "
        "l_orderkey shuffle key — three exchanges total reuse one "
        "partitioning; top-20 sorts only the per-supplier counts."
    ),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    l1 = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("s_key")
    )
    others = lo.select(
        F.col("l_orderkey").alias("x_key"), F.col("l_suppkey").alias("x_supp"),
        "late",
    )
    waited = l1.join(
        others,
        (F.col("o_key") == F.col("x_key")) & (F.col("s_key") != F.col("x_supp")),
        "left_semi",
    ).join(
        others.filter(F.col("late")),
        (F.col("o_key") == F.col("x_key")) & (F.col("s_key") != F.col("x_supp")),
        "left_anti",
    )
    s = t(spark, sf_dir, "supplier")
    return (
        waited.join(s, F.col("s_key") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
