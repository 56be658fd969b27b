"""Registry entries for the Python-UDF surface and multimodal ops.

Even though these cross the Python boundary (Arrow-batched pandas
UDFs), every query here still has a full DuckDB oracle: the Python
side does exact integer aggregation / md5 hashing and a pinned
sequence of double ops that the SQL mirrors token-for-token
(operators/udfs.py, operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_data_eng_proj_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    sample_frames,
)
from duckdb_data_eng_proj_spark.operators.udfs import grouped_zscore, ws_token_count
from duckdb_data_eng_proj_spark.queries.registry import register, t

# mean/variance on exact integer cents, as doubles, mirrored from
# operators/udfs.py::_zscore_pdf
_MEAN = "(CAST(s AS DOUBLE) / n)"
_VAR = f"(CAST(q AS DOUBLE) / n - {_MEAN} * {_MEAN})"


@register(
    "ext_udf_surface",
    oracle=(
        "WITH c AS (SELECT event_id, event_type, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "g AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS s, "
        "SUM(cents * cents) AS q FROM c GROUP BY event_type) "
        "SELECT c.event_id, c.event_type, "
        f"CASE WHEN {_VAR} > 0 THEN "
        f"round((c.cents - {_MEAN}) / sqrt({_VAR}), 4) "
        "ELSE CAST('nan' AS DOUBLE) END AS value_z "
        "FROM c JOIN g USING (event_type)"
    ),
    doc=(
        "applyInPandas grouped transform (SURVEY §2.8 ext_udf_surface): "
        "per-event_type z-score computed in Python over Arrow batches, "
        "on exact integer cents so the DuckDB oracle hash-matches. One "
        "shuffle keyed by event_type."
    ),
)
def ext_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grouped_zscore(t(spark, sf_dir, "events"))


@register(
    "ext_udf_scalar",
    oracle=(
        "SELECT doc_id, CAST(len(list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents"
    ),
    doc=(
        "Scalar pandas_udf (Arrow-batched): whitespace token count per "
        "document — proves the vectorized scalar-UDF path; built-in "
        "equivalents stay the hot path (txt_token_count)."
    ),
)
def ext_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", ws_token_count("text").alias("n_tokens"))


_MD5 = "md5(text)"


@register(
    "mm_decode_stub",
    oracle=(
        "SELECT doc_id, 'image/fake' AS media_type, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        f"{_MD5} AS content_md5, "
        f"CAST(CAST('0x' || substr({_MD5}, 1, 4) AS INT) % 1920 + 1 AS INT) AS width, "
        f"CAST(CAST('0x' || substr({_MD5}, 5, 4) AS INT) % 1080 + 1 AS INT) AS height "
        "FROM documents"
    ),
    doc=(
        "Multimodal decode plumbing: binary payload column → mapInPandas "
        "feature extraction (md5 + pseudo-dimensions; real codec stubbed "
        "— operators/multimodal.py). Narrow stage, no shuffle; the "
        "oracle reproduces the deterministic fake features in SQL."
    ),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(attach_payload(t(spark, sf_dir, "documents")))


@register(
    "mm_frame_sample",
    oracle=(
        "SELECT doc_id, unnest(range(0, "
        "CAST(floor(octet_length(encode(text)) / 100) AS INT) + 1, 30)) AS frame_idx, "
        f"{_MD5} AS content_md5 FROM documents"
    ),
    doc=(
        "Video frame-sampling plan: every-30th frame index per item "
        "(frame count derived from payload size in the stub). Pure "
        "builtin sequence+explode — sampling itself needs no Python."
    ),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(attach_payload(t(spark, sf_dir, "documents")))
    return sample_frames(feats, every_n=30)
