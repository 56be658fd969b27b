"""Registry entries for the Python-UDF surface and multimodal ops.

Even though these cross the Python boundary (Arrow-batched pandas
UDFs), every query here still has a full DuckDB oracle: the Python
side does exact integer aggregation / md5 hashing and a pinned
sequence of double ops that the SQL mirrors token-for-token
(operators/udfs.py, operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — resolves postponed UDF type hints
from pyspark.sql import DataFrame, SparkSession

from duckdb_data_eng_proj_spark.operators.multimodal import (
    attach_payload,
    extract_features,
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
        # NULL-value rows excluded (r17 hostile vintage): a NaN cent
        # poisons the whole pandas group's moments while SUM skips it
        # but COUNT(*) counts it — no defined z-score either way
        "WITH c AS (SELECT event_id, event_type, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events "
        "WHERE value IS NOT NULL), "
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


@register(
    "ext_udtf_lateral",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        "x -> x <> '') AS tk FROM documents WHERE doc_id < 50) "
        # parallel unnests zip in DuckDB: positions with their tokens
        "SELECT doc_id, CAST(unnest(range(len(tk))) AS INT) AS pos, "
        "unnest(tk) AS token FROM toks"
    ),
    doc=(
        "Python UDTF via LATERAL join (SURVEY §2.8 UDTF row): a "
        "table-valued tokenizer yielding (pos, token) rows per "
        "document, mirroring operators/textops.tokens exactly "
        "(lower→trim→\\s+ split→drop empties) so the DuckDB "
        "range-lateral oracle hash-matches. UDTFs are the row-"
        "generating Python boundary; like scalar UDFs they stay off "
        "the hot path (fn_unnest is the built-in equivalent) — this "
        "entry proves the API surface."
    ),
)
def ext_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            for pos, tok in enumerate(
                x for x in re.split(r"\s+", text.lower().strip()) if x != ""
            ):
                yield pos, tok

    spark.udtf.register("graft_split_words", SplitWords)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, w.pos, w.token FROM documents d, "
        "LATERAL graft_split_words(d.text) w WHERE d.doc_id < 50"
    )


@register(
    "ext_udaf_pandas",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS price_cents "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Pandas UDAF (Series→scalar pandas_udf used in groupBy().agg): "
        "exact integer-cents sum per return flag — proves the custom-"
        "aggregate API. Honest scale caveat in-plan: a pandas UDAF "
        "shuffles RAW rows to the aggregating task (no map-side "
        "partial aggregation), which is exactly why the built-in "
        "F.sum path (tpch_q1 et al.) is the hot path; use this "
        "boundary only for aggregates Spark genuinely lacks."
    ),
)
def ext_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> np.int64:
        # round-half-away like exact_units: copysign keeps the law for
        # negative amounts too (int64 cast truncates toward zero)
        a = v.to_numpy() * 100
        return np.int64((a + np.copysign(0.5, a)).astype("int64").sum())

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        cents_sum("l_extendedprice").alias("price_cents")
    )


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
        "oracle reproduces the deterministic fake features in SQL. "
        "Kept REGISTERED alongside the real codec (mm_decode_bmp) "
        "deliberately: this is the template for formats whose "
        "libraries are absent from the runtime (JPEG/PNG/video — the "
        "north star's 'stub the decode, make the plumbing real'), and "
        "its oracle checks exactly the plumbing (batch shape, schema, "
        "partitioning) that carries over when a real codec drops in."
    ),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(attach_payload(t(spark, sf_dir, "documents")))


@register(
    "mm_audio_features",
    oracle=(
        "WITH a AS (SELECT doc_id, doc_id % 400 + 16 AS n, "
        "(doc_id * 131) % 65536 AS seed FROM documents), "
        "s AS (SELECT doc_id, n, k, ((seed + 97 * k) % 65536) - 32768 AS v "
        "FROM a, unnest(range(n)) AS u(k)), "
        "w AS (SELECT doc_id, n, k, v, "
        "lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s) "
        "SELECT doc_id, CAST(8000 AS INT) AS sample_rate, "
        "CAST(max(n) AS BIGINT) AS n_samples, "
        "CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms, "
        "CAST(SUM(abs(v)) AS BIGINT) AS sum_abs, "
        "CAST(COUNT(*) FILTER (WHERE pv IS NOT NULL AND v * pv < 0) AS BIGINT) "
        "AS n_zero_cross, "
        "CAST((max(n) + 1) // 2 AS BIGINT) AS rs_n, "
        "CAST(SUM(abs(v)) FILTER (WHERE k % 2 = 0) AS BIGINT) AS rs_sum_abs, "
        "CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes "
        "FROM w GROUP BY doc_id"
    ),
    doc=(
        "END-TO-END REAL audio DSP (round 15 — upgraded from the "
        "headerless-fake-PCM template): genuine RIFF/WAV payloads with "
        "a VARYING waveform (sample k = ((seed + 97k) mod 2¹⁶) − 2¹⁵, "
        "a full-range integer sweep) are synthesized per doc, then "
        "wave-PARSED back with a full PCM unpack and exact-integer "
        "feature math — total magnitude, strict zero crossings "
        "(s[k]·s[k−1] < 0), and a TRUE 2:1 decimation resample with "
        "the resampled stream's own magnitude sum. The oracle "
        "re-derives every sample from the same integer recurrence via "
        "range-unnest + a lag window, so the encoder→decoder→DSP "
        "chain is proven sample-exactly, not just header-deep "
        "(contrast mm_audio_wav, which proves header + peak on the "
        "constant-amplitude fixture). Two narrow Arrow stages, no "
        "shuffle (plan-pinned). Compressed audio (MP3/AAC) remains on "
        "the mm_decode_stub template."
    ),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.multimodal import (
        extract_audio_dsp,
        synthesize_wav_wave_media,
    )

    return extract_audio_dsp(
        synthesize_wav_wave_media(t(spark, sf_dir, "documents"))
    )


@register(
    "mm_decode_bmp",
    oracle=(
        "SELECT doc_id, "
        "CAST(doc_id % 31 + 1 AS INT) AS width, "
        "CAST(doc_id % 17 + 1 AS INT) AS height, "
        "CAST(54 + ((3 * (doc_id % 31 + 1) + 3) // 4) * 4 * (doc_id % 17 + 1) "
        "AS BIGINT) AS n_bytes, "
        "CAST(doc_id % 251 AS DOUBLE) AS mean_pixel "
        "FROM documents"
    ),
    doc=(
        "END-TO-END REAL image decode (VERDICT r2 #6): genuine 24-bpp "
        "BMP payloads are synthesized per doc (struct-packed header + "
        "pixel raster, operators/multimodal.py:encode_bmp), carried as "
        "a binary column, then struct-PARSED back in a second "
        "mapInPandas stage — header width/height, byte length, and a "
        "full pixel scan for the mean (padding excluded). Features are "
        "closed-form in doc_id, so the SQL oracle independently proves "
        "the encoder→decoder round-trip. Two narrow Arrow stages, no "
        "shuffle. Compressed formats remain stubbed (mm_decode_stub)."
    ),
)
def mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.multimodal import (
        extract_bmp_features,
        synthesize_bmp_media,
    )

    return extract_bmp_features(synthesize_bmp_media(t(spark, sf_dir, "documents")))


@register(
    "mm_audio_wav",
    oracle=(
        "SELECT doc_id, "
        "CAST(8000 AS INT) AS sample_rate, "
        "CAST(doc_id % 400 + 16 AS BIGINT) AS n_samples, "
        "CAST((doc_id % 400 + 16) * 1000 // 8000 AS BIGINT) AS duration_ms, "
        "CAST((doc_id * 37) % 32767 AS INT) AS peak_amp, "
        "CAST(44 + 2 * (doc_id % 400 + 16) AS BIGINT) AS n_bytes "
        "FROM documents"
    ),
    doc=(
        "END-TO-END REAL audio decode (VERDICT r2 #6): genuine "
        "RIFF/WAV payloads (16-bit mono 8 kHz constant-amplitude PCM, "
        "stdlib wave writer) synthesized per doc, then wave-PARSED "
        "back — header params plus a full PCM unpack for the peak "
        "sample. Closed-form features let the SQL oracle prove the "
        "round-trip (44-byte canonical header + 2 bytes/sample). Two "
        "narrow Arrow stages, no shuffle."
    ),
)
def mm_audio_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.multimodal import (
        extract_wav_features,
        synthesize_wav_media,
    )

    return extract_wav_features(synthesize_wav_media(t(spark, sf_dir, "documents")))


@register(
    "mm_frame_sample",
    oracle=(
        "WITH v AS (SELECT doc_id, 2 * (doc_id % 8 + 1) AS w, "
        "2 * (doc_id % 6 + 1) AS h, doc_id % 90 + 1 AS nf FROM documents), "
        "f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf, 30)) AS k FROM v) "
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
        "CAST(nf AS BIGINT) AS n_frames, CAST(k AS BIGINT) AS frame_idx, "
        "CAST((doc_id * 7 + 11 * k) % 256 AS DOUBLE) AS mean_y, "
        "CAST(length('YUV4MPEG2 W' || w || ' H' || h || "
        "' F25:1 Ip A1:1 C420') + 1 + nf * (6 + 3 * w * h // 2) AS BIGINT) "
        "AS n_bytes FROM f"
    ),
    doc=(
        "END-TO-END REAL video frame sampling (round 15 — joins "
        "mm_decode_bmp/mm_audio_wav as the third real codec): genuine "
        "YUV4MPEG2 payloads (the standard uncompressed video container "
        "— text stream header + raw planar 4:2:0 frames, 1–90 frames "
        "per doc) are synthesized per doc, carried as a binary column, "
        "then PARSED back in a second mapInPandas stage — header "
        "W/H/C tokens, every frame's FRAME marker validated, total "
        "length checked, and a full Y-plane scan of every 30th frame "
        "for its mean luma. Fixed frame size gives random access by "
        "offset, so only SAMPLED frames are scanned — the reason "
        "frame sampling over an uncompressed container stays cheap at "
        "100 TB. Accepted input is 8-bit 4:2:0 with bare FRAME\\n "
        "markers (exact tag allowlist; spec-legal FRAME parameters "
        "and 10/12-bit chroma reject closed — variable-length markers "
        "would forfeit the fixed-offset random access, ADVICE r15). "
        "Features are closed-form in doc_id, so the SQL "
        "oracle independently proves the encoder→parser round-trip. "
        "Two narrow Arrow stages, no shuffle (plan-pinned). Inter-"
        "frame compressed codecs (H.264/VP9) remain stubbed "
        "(mm_decode_stub template)."
    ),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_data_eng_proj_spark.operators.multimodal import (
        sample_y4m_frames,
        synthesize_y4m_media,
    )

    return sample_y4m_frames(
        synthesize_y4m_media(t(spark, sf_dir, "documents")), every_n=30
    )
