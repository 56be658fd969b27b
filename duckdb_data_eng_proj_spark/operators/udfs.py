"""The Python-UDF surface: Arrow-batched pandas UDFs + grouped pandas.

The reference has zero UDFs (its whole pipeline is SQL built-ins —
SURVEY.md §2.8), so this module exists to prove the engine's escape
hatch for logic Spark's built-ins can't express: vectorized
``pandas_udf`` for scalar work and ``applyInPandas`` for grouped
transforms. Both move data JVM→Python via Arrow in columnar batches —
the ONLY acceptable Python path at scale (row-at-a-time Python UDFs
are 10-100× slower and are banned from this codebase).

Determinism contract: the z-score transform does its aggregation on
exact integer cents (int64) and only then performs a fixed sequence
of double ops, mirrored token-for-token by the DuckDB oracle SQL, so
results hash-match despite crossing the Python boundary. Rounding is
half-away-from-zero to match SQL ROUND (numpy's .round is half-even
— not used).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """SQL ROUND semantics (half away from zero); numpy rounds half-even."""
    p = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


@F.pandas_udf(LongType())
def ws_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count — scalar pandas UDF (Arrow-batched).

    Same semantics as the built-in tokenizer in operators/textops.py
    (split on whitespace runs, drop empties); str.split() does exactly
    that in Python.
    """
    return text.fillna("").map(lambda s: len(s.split())).astype("int64")


ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value_z", DoubleType(), True),
    ]
)


def _zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score on exact integer cents.

    Fixed double-op sequence (mirrored by the oracle SQL):
    mean_c = s/n; var_c = q/n - mean_c*mean_c;
    z = (c - mean_c) / sqrt(var_c); round half-away 4dp.
    """
    cents = round_half_away(pdf["value"].to_numpy(dtype="float64") * 100.0, 0).astype(
        "int64"
    )
    n = len(cents)
    s = int(cents.sum())
    q = int((cents * cents).sum())
    mean_c = s / n
    var_c = q / n - mean_c * mean_c
    if var_c > 0:
        z = (cents - mean_c) / np.sqrt(var_c)
        z = round_half_away(z, 4)
    else:
        z = np.full(n, np.nan)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value_z": z,
        }
    )


def grouped_zscore(events: DataFrame) -> DataFrame:
    """applyInPandas grouped transform: z-score of value per event_type.

    One shuffle keyed by event_type; each group streams to Python as
    Arrow batches. At 100 TB the group count (event types) bounds
    parallelism — for high-cardinality keys this shape scales linearly;
    for few huge groups, pre-aggregate the moments JVM-side instead
    (that variant is ext_udf-free and lives in the oracle SQL).
    """
    # Explicit-width repartition: AQE coalesces shuffle reads on
    # BYTES, and a byte-small / Python-compute-heavy grouped stage can
    # get fed to one worker (the ts_ewma 6.4× finding, BASELINE
    # §round-14). Parallelism is still bounded by the type count —
    # the pin just stops AQE from merging distinct types' partitions.
    width = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("event_id", "event_type", "value")
        # NULL values have no z-score and NaN-poison the group's
        # numpy moments — excluded on BOTH engines (r17)
        .filter(F.col("value").isNotNull())
        .repartition(width, "event_type")
        .groupBy("event_type")
        .applyInPandas(_zscore_pdf, schema=ZSCORE_SCHEMA)
    )
