"""Operator registry: one oracle-checked query per SURVEY.md §2 row.

Importing this package imports every query module, which populates
``REGISTRY``. ``__spark_entry__.py`` exposes it to the driver.
"""

from duckdb_data_eng_proj_spark.queries.registry import REGISTRY, QuerySpec, register, t

# Populate the registry (import order = SURVEY.md §2 order).
from duckdb_data_eng_proj_spark.queries import relational  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import scalar_fns  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extensions  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import training  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import training_extra  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import etl_composites  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import udf_multimodal  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import streaming_q  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r5  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r6  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r6b  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import tpch  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import tpch_full  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import corpus  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import ml_iter  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r7  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r8  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r9  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r10  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r10b  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r11  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r12  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r12b  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r12c  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r13  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r14  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r15  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r16  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r17  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r18  # noqa: E402,F401
from duckdb_data_eng_proj_spark.queries import extras_r19  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "t"]
