"""duckdb_data_eng_proj_spark — a PySpark-native analytics engine.

Re-expresses the full query / data-processing surface of the reference
project (alecvanv/duckdb-data-eng-proj, a DuckDB-powered loan-portfolio
ETL + analytics pipeline) as an idiomatic Spark DataFrame/SQL library,
and extends it with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle).
- ``io``         sources (parquet/CSV all-varchar quarantine reads) and
                 sinks (quoted-CSV export parity).
- ``functions``  scalar-function shims mirroring the reference's SQL
                 surface (try_cast, month-boundary date_diff, JSON flag
                 maps, injected clock).
- ``queries``    the operator registry: one oracle-checked query per
                 SURVEY.md §2 row, run against the TPC-H-ish testdata.
- ``etl``        the 5-stage loan ETL (quarantine → clean → join →
                 report) with golden-output parity vs the reference.
- ``operators``  extension operators: dedup (exact/minhash/simhash/
                 jaccard), similarity search, text analysis, windows,
                 sessionization, multimodal column plumbing.
- ``streaming``  Structured Streaming formulations (file ingest,
                 tumbling/session windows).
"""

from duckdb_data_eng_proj_spark.session import get_spark

__all__ = ["get_spark"]
