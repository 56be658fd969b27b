"""Round-10 operators: sketch-family completion, iterative PageRank,
MAD anomaly flags, ordered funnel, one k-means round, PMI collocations.

Seven additions inside the r10 new-id budget (SURVEY §9 round-10
queue), each completing an existing family:

- agg_sketch_hll / agg_bloom_filter — next to agg_sketch_cms and
  ext_sketch_kmv: cardinality (HyperLogLog) and membership (Bloom)
  sketches built from the same md5-derived deterministic hashing, so
  the oracle verifies exact register/bit state, not just error bounds.
- graph_pagerank — the damped iterative centrality sibling of
  dedup_cluster_cc / graph_label_communities over the symmetrized LSH
  near-dup graph, in exact integer micro-units.
- ts_anomaly_mad — median/MAD outlier flags via the dual-row_number
  integer median (no quantile builtin: interpolating implementations
  never hash-match across engines; 2·median and 4·MAD stay BIGINT).
- evt_funnel_steps — ordered signup→view→click→purchase funnel via
  stage-chained conditional mins; completes the events family next to
  evt_markov_transition / evt_rfm_scores.
- ml_kmeans_round — one Lloyd iteration over int-quantized embeddings
  with deterministic seeds; the clustering sibling of ml_naive_bayes /
  ml_decision_stump / ml_gbdt_round.
- txt_pmi_colloc — bigram collocations by integer micro-nat PMI,
  reusing the ln_u discipline of ml_naive_bayes / txt_entropy.

Reference parity: the reference (a DuckDB ETL take-home, pipeline.py)
has none of these — they extend the training-pipeline families per
the build charter. All follow the repo's determinism rules
(registry.py): integer fixed-point, identical tie-breaks and aliases
in both engines; every signed division uses DIV / ``//`` (both
truncate toward zero — the r8 sign-parity law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.operators.textops import tokens
from duckdb_data_eng_proj_spark.queries.registry import register, t

# ---------------------------------------------------------------------------
# agg_sketch_hll

# 64 registers (p = 6). Item hash = first 15 hex chars of md5 (60 bits,
# always < 2^60 so the BIGINT parse can't overflow); bucket = low 6
# bits, rank input = the remaining 54 bits. rho = #leading zeros of the
# 54-bit field + 1 = 55 - bit_length, with bit_length computed as
# length(bin(x)) — bin() renders the minimal binary string identically
# in DuckDB and Spark (verified: length(bin(1234567)) = 21 on both).
# The register sum Σ 2^(55-r) is exact BIGINT (64 terms ≤ 2^55 each,
# max total 2^61), so the raw HLL estimate is ONE double division of
# two exact integers — deterministic IEEE on both engines. alpha_64 =
# 0.709 (Flajolet et al., the published constant for m = 64).
_HLL_M = 64
_HLL_ALPHA_NUM = repr(0.709 * 64 * 64 * float(2**55))  # alpha·m²·2^55


@register(
    "agg_sketch_hll",
    oracle=(
        "WITH toks AS (SELECT list_filter(string_split_regex(lower(trim(text)), "
        "'\\s+'), x -> x <> '') AS tk FROM documents), "
        "items AS (SELECT DISTINCT unnest(tk) AS token FROM toks), "
        "h AS (SELECT token, CAST('0x' || substr(md5('hll-v1:' || token), 1, 15) "
        "AS BIGINT) AS hv FROM items), "
        f"rh AS (SELECT hv % {_HLL_M} AS bucket, "
        f"CASE WHEN hv // {_HLL_M} = 0 THEN 55 "
        f"ELSE 55 - length(bin(hv // {_HLL_M})) END AS rho FROM h), "
        f"grid AS (SELECT unnest(range({_HLL_M})) AS bucket), "
        "reg AS (SELECT grid.bucket, COALESCE(MAX(rh.rho), 0) AS rho_max "
        "FROM grid LEFT JOIN rh ON rh.bucket = grid.bucket GROUP BY grid.bucket), "
        # 1::BIGINT << shift, NOT 2 ** shift: DuckDB ** returns DOUBLE
        # and the register sum needs up to 61 exact bits (> the 53-bit
        # mantissa); integer shifts keep it BIGINT-exact on both sides.
        "s AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (55 - rho_max)) AS BIGINT) "
        "AS ssum, CAST(COUNT(*) FILTER (rho_max = 0) AS BIGINT) AS zeros "
        "FROM reg), "
        "tru AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_distinct FROM items), "
        "est AS (SELECT CASE WHEN s.zeros > 0 AND "
        f"{_HLL_ALPHA_NUM} / s.ssum <= 2.5 * {_HLL_M} "
        f"THEN CAST(round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / s.zeros), 0) "
        "AS BIGINT) "
        f"ELSE CAST(round({_HLL_ALPHA_NUM} / s.ssum, 0) AS BIGINT) END AS hll_est "
        "FROM s) "
        "SELECT reg.bucket, CAST(reg.rho_max AS BIGINT) AS rho_max, "
        "est.hll_est, tru.true_distinct, "
        "CAST(round((est.hll_est - tru.true_distinct) * 1000.0 "
        "/ tru.true_distinct, 0) AS BIGINT) AS err_pml "
        "FROM reg CROSS JOIN est CROSS JOIN tru"
    ),
    doc=(
        "HyperLogLog cardinality sketch over the distinct-token stream "
        "— the cardinality estimator next to agg_sketch_cms (frequency) "
        "and agg_bloom_filter (membership): 64 registers, md5-derived "
        "60-bit hash, register = max leading-zero rank of the 54-bit "
        "tail. Deterministic md5 hashing makes the register state "
        "bit-identical cross-engine, so the oracle verifies all 64 "
        "registers AND the estimate, not just an error bound (native "
        "HLL implementations — Spark approx_count_distinct, DuckDB "
        "approx_count_distinct — never match each other). The register "
        "sum is exact BIGINT (Σ 2^(55-ρ), ≤ 2^61), leaving ONE double "
        "division for the estimate; the small-range linear-counting "
        "branch is implemented but not taken at any testdata SF. Scale "
        "shape: map-side-combinable MAX per bucket — 64 rows of state "
        "regardless of input size, one vocab-keyed shuffle upstream; "
        "at 100 TB the sketch is a constant-memory single pass, which "
        "is the entire point of HLL."
    ),
)
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.io.sources import ensure_parallelism

    d = ensure_parallelism(t(spark, sf_dir, "documents"))
    items = (
        d.select(F.explode(tokens(F.col("text"))).alias("token")).distinct()
    )
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll-v1:"), F.col("token"))), 1, 15),
        16,
        10,
    ).cast("long")
    rh = items.select(hv.alias("hv")).select(
        F.pmod(F.col("hv"), F.lit(_HLL_M)).alias("bucket"),
        F.when(F.expr(f"hv DIV {_HLL_M}") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(F.expr(f"hv DIV {_HLL_M}"))))
        .alias("rho"),
    )
    grid = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    reg = (
        grid.join(rh, "bucket", "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("rho_max"))
    )
    s = reg.agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_max AS INT))")
        ).alias("ssum"),
        F.sum(F.when(F.col("rho_max") == 0, 1).otherwise(0)).cast("long").alias("zeros"),
    )
    tru = items.agg(F.count("*").alias("true_distinct"))
    est = s.select(
        F.when(
            (F.col("zeros") > 0)
            & (F.lit(float(_HLL_ALPHA_NUM)) / F.col("ssum") <= 2.5 * _HLL_M),
            F.round(
                F.lit(float(_HLL_M))
                * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
                0,
            ).cast("long"),
        )
        .otherwise(
            F.round(F.lit(float(_HLL_ALPHA_NUM)) / F.col("ssum"), 0).cast("long")
        )
        .alias("hll_est")
    )
    return (
        reg.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(tru))
        .select(
            "bucket",
            F.col("rho_max").cast("long").alias("rho_max"),
            "hll_est",
            "true_distinct",
            F.round(
                (F.col("hll_est") - F.col("true_distinct"))
                * 1000.0
                / F.col("true_distinct"),
                0,
            )
            .cast("long")
            .alias("err_pml"),
        )
    )


# ---------------------------------------------------------------------------
# agg_bloom_filter

_BLOOM_BITS = 512
_BLOOM_K = 3

# Group = p_brand (25 filters), item = p_size rendered as a string —
# each brand carries only ~32-37 of the 50 sizes at sf0.01, so the
# probe cross (brand x size) has real non-members and the
# false-positive accounting is exercised, not vacuous.


def _bloom_pos_sql(j: int, item: str) -> str:
    return (
        f"CAST('0x' || substr(md5('bloom-{j}:' || {item}), 1, 8) AS BIGINT) "
        f"% {_BLOOM_BITS}"
    )


@register(
    "agg_bloom_filter",
    oracle=(
        "WITH pb AS (SELECT DISTINCT p_brand, "
        "CAST(p_size AS VARCHAR) AS sz FROM part), "
        "gr AS (SELECT DISTINCT p_brand FROM part), "
        "it AS (SELECT DISTINCT CAST(p_size AS VARCHAR) AS sz FROM part), "
        "cells AS (SELECT DISTINCT p_brand, pos FROM ("
        + " UNION ALL ".join(
            f"SELECT p_brand, {_bloom_pos_sql(j, 'sz')} AS pos FROM pb"
            for j in range(_BLOOM_K)
        )
        + ")), "
        "probe AS (SELECT gr.p_brand, it.sz, j FROM gr CROSS JOIN it "
        f"CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j)), "
        "hits AS (SELECT pr.p_brand, pr.sz, "
        "CAST(COUNT(c.pos) AS BIGINT) AS k_hits FROM probe pr "
        "LEFT JOIN cells c ON c.p_brand = pr.p_brand AND c.pos = (CASE "
        + " ".join(
            f"WHEN pr.j = {j} THEN {_bloom_pos_sql(j, 'pr.sz')}"
            for j in range(_BLOOM_K)
        )
        + " END) GROUP BY pr.p_brand, pr.sz), "
        "pop AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS bits_set "
        "FROM cells GROUP BY p_brand) "
        "SELECT h.p_brand, h.sz AS p_size_str, "
        f"CAST(h.k_hits = {_BLOOM_K} AS BIGINT) AS in_bloom, "
        "CAST(pb.sz IS NOT NULL AS BIGINT) AS is_member, "
        f"CAST(h.k_hits = {_BLOOM_K} AND pb.sz IS NULL AS BIGINT) "
        "AS is_false_positive, pop.bits_set "
        "FROM hits h JOIN pop ON pop.p_brand = h.p_brand "
        "LEFT JOIN pb ON pb.p_brand = h.p_brand AND pb.sz = h.sz"
    ),
    doc=(
        "Bloom-filter membership sketch with exact false-positive "
        "accounting — completes the sketch family (ext_sketch_kmv = "
        "cardinality, agg_sketch_cms = frequency, agg_sketch_hll = "
        "cardinality-by-registers, this = membership): per p_brand a "
        f"{_BLOOM_BITS}-bit filter of its p_size set via {_BLOOM_K} "
        "md5-derived hash positions; every (brand, size) pair in the "
        "full cross is then probed — in_bloom iff all k bits are set — "
        "and compared against true membership, so the oracle verifies "
        "the exact bit state (bits_set popcount) and every "
        "false-positive individually. Scale shape: the build is a "
        "distinct over (group, pos) — k·|set| rows map-side-deduped "
        "down to <= m bits per group; the probe is a bounded dim-cross "
        "with the cell table broadcast. At 100 TB the filter per group "
        "is <= m bits of state no matter the fact-table size — the "
        "join-pruning primitive (build on the small side, probe the "
        "fact scan) expressed as data."
    ),
)
def agg_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    pb = part.select(
        "p_brand", F.col("p_size").cast("string").alias("sz")
    ).distinct()

    def pos(j: int, item):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom-{j}:"), item)), 1, 8),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        )

    cells = None
    for j in range(_BLOOM_K):
        c = pb.select("p_brand", pos(j, F.col("sz")).alias("pos"))
        cells = c if cells is None else cells.unionAll(c)
    cells = cells.distinct()
    gr = part.select("p_brand").distinct()
    it = part.select(F.col("p_size").cast("string").alias("sz")).distinct()
    probe = None
    for j in range(_BLOOM_K):
        p = (
            gr.crossJoin(F.broadcast(it))
            .select("p_brand", "sz", pos(j, F.col("sz")).alias("pos"))
        )
        probe = p if probe is None else probe.unionAll(p)
    hits = (
        probe.join(
            F.broadcast(cells.withColumn("hit", F.lit(1))),
            ["p_brand", "pos"],
            "left",
        )
        .groupBy("p_brand", "sz")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("k_hits"))
    )
    pop = cells.groupBy("p_brand").agg(F.count("*").alias("bits_set"))
    return (
        hits.join(F.broadcast(pop), "p_brand")
        .join(
            F.broadcast(pb.withColumn("member", F.lit(1))),
            ["p_brand", "sz"],
            "left",
        )
        .select(
            "p_brand",
            F.col("sz").alias("p_size_str"),
            (F.col("k_hits") == _BLOOM_K).cast("long").alias("in_bloom"),
            (F.col("member").isNotNull()).cast("long").alias("is_member"),
            ((F.col("k_hits") == _BLOOM_K) & F.col("member").isNull())
            .cast("long")
            .alias("is_false_positive"),
            "bits_set",
        )
    )
