"""Stage 5 — CSV export with the reference's output format.

Reference: ``COPY ... TO csv (HEADER, QUOTE '"', ESCAPE '"',
FORCE_QUOTE *, NULL '')`` (pipeline.py:494-522). Spark spelling:
quoteAll + empty nullValue + doubled-quote escaping + the golden
files' ``yyyy-MM-dd HH:mm:ss`` timestamp text. The one impedance
mismatch is the report's LIST column — Spark's CSV writer rejects
arrays, so it is rendered to DuckDB's list text ("[a, b, NULL]")
before writing, which is also exactly the golden bytes.

Single output file via coalesce(1), matching the single-file goldens;
at scale exports stay multi-part (drop the coalesce) — single-file is
a presentation constraint, not an engine one.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.etl.loan_pipeline import PipelineResult

# DuckDB's FORCE_QUOTE * quotes every non-NULL value but leaves NULLs
# as bare empty fields; Spark's quoteAll quotes the null text too.
# Write NULLs as a sentinel and strip the quoted sentinel afterwards
# (plain ASCII: the univocity writer trims chars <= 0x20 from values).
_NULL_SENTINEL = "__SPARK_GRAFT_NULL__"

_CSV_OPTS = {
    "header": True,
    "quoteAll": True,
    "nullValue": _NULL_SENTINEL,
    "emptyValue": "",
    "quote": '"',
    "escape": '"',
    "timestampFormat": "yyyy-MM-dd HH:mm:ss",
    "dateFormat": "yyyy-MM-dd",
}


def _render_array_columns(df: DataFrame) -> DataFrame:
    """Render array<string> columns as DuckDB list text: [a, b, NULL]."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("array<"):
            rendered = F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(F.col(name), lambda x: F.coalesce(x, F.lit("NULL"))),
                    ", ",
                ),
                F.lit("]"),
            )
            out = out.withColumn(name, rendered)
    return out


def write_csv_single(df: DataFrame, path: str) -> None:
    """Write ``df`` as ONE csv file at ``path`` (part-file promoted)."""
    tmp = path + ".spark-tmp"
    writer = _render_array_columns(df).coalesce(1).write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        writer = writer.option(k, v)
    writer.csv(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.csv"))
    with open(part, encoding="utf-8") as f:
        text = f.read().replace(f'"{_NULL_SENTINEL}"', "")
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    shutil.rmtree(tmp)


def export_outputs(result: PipelineResult, out_dir: str) -> dict[str, str]:
    """Export the three reference outputs; returns name → file path."""
    os.makedirs(out_dir, exist_ok=True)
    targets = {
        "cleaned_applications": result.cleaned_applications,
        "loan_portfolio": result.loan_portfolio,
        "data_quality_report": result.data_quality_report,
    }
    paths: dict[str, str] = {}
    for name, df in targets.items():
        path = os.path.join(out_dir, f"{name}.csv")
        write_csv_single(df, path)
        paths[name] = path
    return paths
