"""Scale-path operator building blocks (text, vectors, dedup).

Pure Column-expression builders — everything stays JVM-side inside
whole-stage codegen; no Python UDFs in any hot path. The
oracle-checked query registrations that use these live in
``duckdb_data_eng_proj_spark.queries.training``.
"""
