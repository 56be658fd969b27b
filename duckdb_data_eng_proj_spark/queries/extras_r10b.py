"""Late round-10 operators, pulled forward from the round-11 queue.

Two additions inside the r10 new-id budget (9/10 after these), each
passing the round-10 audit rule — grep the registry for the ANALYSIS,
not the id, before building:

- ts_seasonal_profile — weekday seasonal index per event type. The
  registry's anomaly cuts are season-blind (evt_anomaly_zscore:
  global per-type count z-score; ts_anomaly_mad: per-user robust
  value cut; ts_changepoint_cusum: level drift); nothing models the
  weekly cycle itself. This is the seasonality-aware baseline that a
  drift monitor divides by before alerting.
- ext_compact_plan — small-file compaction planner: sequential
  next-fit bin-packing of a per-partition file inventory into
  target-size compaction groups. ext_zorder_layout orders ROWS for
  data skipping; nothing plans FILE maintenance — the nightly
  lakehouse job a 100 TB deployment actually runs.

Reference parity: the reference (a DuckDB ETL take-home, pipeline.py)
has neither — they extend the training-pipeline/lakehouse families
per the build charter. Both follow the repo's determinism rules
(registry.py): exact BIGINT accumulation, ONE double division rounded
to fixed units, `DIV`/`//` truncating division, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries.registry import register, t

# ---------------------------------------------------------------------------
# ts_seasonal_profile

# Weekday is computed from epoch-day arithmetic, NOT from the engines'
# dayofweek() builtins (DuckDB numbers Sunday=0..Saturday=6, Spark
# numbers Sunday=1..Saturday=7): dow = (days_since_1970_01_01 + 4) % 7
# with 0=Sunday..6=Saturday (1970-01-01 was a Thursday = 4). The
# operand is non-negative for any date >= epoch, so DuckDB's
# sign-following % and Spark's % agree.


@register(
    "ts_seasonal_profile",
    oracle=(
        "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
        "dowd AS (SELECT event_type, cnt, "
        "(date_diff('day', DATE '1970-01-01', d) + 4) % 7 AS dow FROM daily), "
        "prof AS (SELECT event_type, CAST(dow AS BIGINT) AS dow, "
        "CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(cnt) AS BIGINT) AS ev_dow "
        "FROM dowd GROUP BY 1, 2), "
        "tot AS (SELECT event_type, dow, n_days, ev_dow, "
        "SUM(n_days) OVER (PARTITION BY event_type) AS n_days_all, "
        "SUM(ev_dow) OVER (PARTITION BY event_type) AS ev_all FROM prof) "
        "SELECT event_type, dow, n_days, ev_dow, "
        "ev_dow * 1000 // n_days AS avg_daily_md, "
        "CAST(round(ev_dow * n_days_all * 1000.0 / (n_days * ev_all), 0) "
        "AS BIGINT) AS idx_pml "
        "FROM tot ORDER BY event_type, dow"
    ),
    doc=(
        "Weekday seasonal index per event type: daily event counts, "
        "grouped by day-of-week, expressed as per-mille of the "
        "type's overall daily mean (idx_pml = 1000 ⇔ that weekday is "
        "average; >1000 ⇔ seasonally hot). Means are over OBSERVED "
        "days (a day with zero events of a type contributes no row — "
        "documented bias, negligible on dense streams). All "
        "accumulation is BIGINT (counts × day counts × 1000 ≤ ~1e13 "
        "at ×8 stress, far under 2^63); the index is ONE double "
        "division of exact integer products, rounded to per-mille; "
        "avg_daily_md is exact truncating `DIV`. dow from epoch-day "
        "arithmetic, identical cross-engine (builtin dayofweek() "
        "numbering differs). Scale shape: the only full-data shuffle "
        "is the (event_type, date) partial agg — map-side combine "
        "collapses 100 TB of events to ~|types|·|days| rows before "
        "the exchange; the dow re-agg and per-type window run on that "
        "profile-sized table, partitioned ONCE by event_type so the "
        "dow re-agg (subset rule) and the per-type window share that "
        "single exchange — 2 hash exchanges total, plan-pinned."
    ),
    tags=("timeseries",),
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    dowd = daily.select(
        "event_type",
        "cnt",
        (
            (F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))) + F.lit(4)) % 7
        ).cast("long").alias("dow"),
    )
    # One exchange serves both the dow re-agg and the per-type window:
    # HashPartitioning(event_type) satisfies the agg's clustering on
    # (event_type, dow) — subset rule — and the window's on event_type,
    # where the agg's own (event_type, dow) partitioning would NOT
    # satisfy the window (a type's rows split across partitions) and
    # Catalyst would insert a third exchange. The repartition moves the
    # profile-sized daily table (~|types|·|days| rows), not raw events.
    prof = dowd.repartition("event_type").groupBy("event_type", "dow").agg(
        F.count("*").alias("n_days"), F.sum("cnt").alias("ev_dow")
    )
    w = Window.partitionBy("event_type")
    return (
        prof.withColumn("n_days_all", F.sum("n_days").over(w))
        .withColumn("ev_all", F.sum("ev_dow").over(w))
        .select(
            "event_type",
            "dow",
            "n_days",
            "ev_dow",
            F.expr("ev_dow * 1000 DIV n_days").alias("avg_daily_md"),
            F.round(
                F.col("ev_dow") * F.col("n_days_all") * F.lit(1000.0)
                / (F.col("n_days") * F.col("ev_all"))
            ).cast("long").alias("idx_pml"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# ext_compact_plan

# The testdata has no file manifest, so one is derived: "files" are
# fixed doc_id//50 buckets within each source partition (~2-3 docs,
# ~750 bytes each at every SF — scaling the corpus adds FILES, not
# file bytes, exactly the small-file problem the planner exists for),
# sized as 512 footer-overhead bytes + Σ n_chars. In production the
# input is the table-format manifest (metadata-scale, ~millions of
# rows at 100 TB) and the derivation stage disappears.
_COMPACT_TARGET = 2400  # bytes per compaction group: ~3-4 files


@register(
    "ext_compact_plan",
    oracle=(
        "WITH files AS (SELECT source, doc_id // 50 AS file_id, "
        "CAST(512 + SUM(n_chars) AS BIGINT) AS file_bytes "
        "FROM documents GROUP BY 1, 2), "
        "packed AS (SELECT source, file_id, file_bytes, "
        "CAST((SUM(file_bytes) OVER (PARTITION BY source ORDER BY file_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - file_bytes) "
        f"// {_COMPACT_TARGET} AS BIGINT) AS grp FROM files) "
        "SELECT source, file_id, file_bytes, grp, "
        "CAST(COUNT(*) OVER (PARTITION BY source, grp) AS BIGINT) AS grp_files, "
        "CAST(SUM(file_bytes) OVER (PARTITION BY source, grp) AS BIGINT) "
        "AS grp_bytes "
        "FROM packed ORDER BY source, file_id"
    ),
    doc=(
        "Small-file compaction planner: per table partition (source), "
        "files ordered by file_id are packed sequentially into "
        "compaction groups by FIXED CUMULATIVE-BYTE-BOUNDARY BINNING — "
        "grp = exclusive-cumsum DIV target, i.e. group boundaries sit "
        "at absolute multiples of the target byte count, with no "
        "capacity reset when a group closes. This is deliberately NOT "
        "next-fit/first-fit bin packing (those reset capacity at each "
        "group close; after a file overshoots a boundary the next "
        "boundary-binned group is capacity-truncated, which true "
        "next-fit would keep packing) — the boundary form is the "
        "single-window-pass, resume-safe policy: any file's group is "
        "a pure function of the exclusive prefix sum, so the plan is "
        "stable under manifest re-reads and incremental extension. "
        "All-BIGINT arithmetic, truncating DIV. Scale "
        "shape: one (source, file_id) partial-agg exchange builds the "
        "inventory (in production the manifest replaces this and the "
        "whole plan is metadata-scale), one exchange to source for "
        "the pack window; the (source, grp) stats windows reuse that "
        "partitioning (prefix rule — sorts, no third exchange). The "
        "planner never touches file CONTENTS: output is the work list "
        "a rewrite job consumes."
    ),
    tags=("lakehouse",),
)
def ext_compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    files = docs.groupBy(
        "source", F.expr("doc_id DIV 50").alias("file_id")
    ).agg((F.lit(512) + F.sum("n_chars")).cast("long").alias("file_bytes"))
    w_pack = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        files.withColumn("cum", F.sum("file_bytes").over(w_pack))
        .withColumn("grp", F.expr(f"(cum - file_bytes) DIV {_COMPACT_TARGET}"))
        .drop("cum")
    )
    w_grp = Window.partitionBy("source", "grp")
    return (
        packed.withColumn("grp_files", F.count("*").over(w_grp))
        .withColumn("grp_bytes", F.sum("file_bytes").over(w_grp))
        .orderBy("source", "file_id")
    )
