"""Sources: parquet star-schema loader + the all-VARCHAR CSV contract.

Reference semantics being reproduced:
- ``read_csv(..., all_varchar=true, null_padding=true, strict_mode=
  false)`` (reference: pipeline.py:43-77): every column STRING, ragged
  rows tolerated, over-wide rows captured in an extra trailing column
  so the quarantine predicate (pipeline.py:89-94) can see them.
  Spark equivalent: explicit all-StringType schema with one extra
  trailing column + PERMISSIVE mode (null-fills short rows, binds the
  extra token when present).
- parquet scans are the testdata path (TESTDATA.md); at 100 TB these
  are the real input format — explicit schemas are not needed, and
  filter/column pushdown reaches the scan via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` needs physical-type normalization, handling both
    generator vintages: INT64 TIMESTAMP(NANOS) (rounds 1-3), which the
    Spark parquet reader rejects outright — read as raw nanos
    (``nanosAsLong``) and rebuild a microsecond TIMESTAMP — and plain
    ``timestamp[us]`` (round-4 regen), which Spark infers as
    TIMESTAMP_NTZ and downstream epoch arithmetic (``cast(ts as
    bigint)`` in sessionization) cannot consume — cast to the LTZ
    TIMESTAMP the nanos path always produced.

    DataFrames are memoized per (session, dir, table): they are
    immutable lazy plans, and re-creating one re-reads the parquet
    footer on the JVM side (~30-100 ms) — pure overhead when dozens of
    registry queries touch the same tables.
    """
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input arrives in fewer splits.

    For compute-heavy narrow stages (hashing, vector math) a small
    file (one or two parquet splits) would otherwise pin the whole
    stage to one or two cores; shuffling a few MB of raw rows is
    noise next to the compute. No-op when the input already has
    enough splits — at 100 TB inputs always do, so this never
    *reduces* parallelism.

    The split count is estimated from scan-file sizes vs
    ``spark.sql.files.maxPartitionBytes`` — pure metadata, no
    ``df.rdd`` conversion (which compiles the whole plan to an RDD
    DAG just for a partition-count peek; VERDICT r1 #5)."""
    import math
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism

    def parse_bytes(raw: str) -> int:
        raw = raw.strip().lower().removesuffix("b")
        mult = 1
        for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
            if raw.endswith(suffix):
                raw, mult = raw[:-1], m
                break
        return int(raw) * mult

    try:
        files = df.inputFiles()
        mpb = parse_bytes(str(spark.conf.get("spark.sql.files.maxPartitionBytes"))) or 1
    except Exception:  # noqa: BLE001 — non-file source (in-memory, stream)
        # No scan metadata to estimate from: consult the actual
        # partition count (the .rdd peek is fine OFF the hot path) and
        # keep the "never reduces parallelism" guarantee — an
        # unconditional repartition here could narrow an already-wide
        # DataFrame (ADVICE r2).
        try:
            if df.rdd.getNumPartitions() < target:
                return df.repartition(target)
        except Exception:  # noqa: BLE001 — e.g. streaming DF: leave as-is
            pass
        return df
    splits = 0
    for f in files:
        path = urlparse(f).path
        try:
            size = os.path.getsize(path)
        except OSError:  # remote FS — sizes unknown, assume wide enough
            return df
        splits += max(1, math.ceil(size / mpb))
        if splits >= target:
            return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def all_varchar_schema(columns: list[str], extra: str | None = "column12") -> StructType:
    """All-StringType schema with an optional trailing overflow column.

    Mirrors the reference's quarantine contract (pipeline.py:85-113 and
    SURVEY.md G1): the overflow column is non-empty only for rows that
    carry more fields than the declared header (e.g. an unescaped
    comma), and the quarantine stage filters on exactly that.
    """
    fields = [StructField(c, StringType(), True) for c in columns]
    if extra is not None:
        fields.append(StructField(extra, StringType(), True))
    return StructType(fields)


def read_csv_all_varchar(
    spark: SparkSession,
    path: str,
    columns: list[str],
    extra: str | None = "column12",
) -> DataFrame:
    """CSV scan with the reference's tolerant all-VARCHAR semantics.

    PERMISSIVE is Spark's default but is named explicitly: short rows
    null-fill, over-long rows bind their 13th token to ``extra``.
    """
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .schema(all_varchar_schema(columns, extra))
        .csv(path)
    )
