"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``duckdb_data_eng_proj_spark``; this module is
a thin adapter over its operator registry (one entry per SURVEY.md §2
row — see duckdb_data_eng_proj_spark/queries/).
"""

from __future__ import annotations

import functools
import glob
import hashlib
import inspect
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402

FLAGSHIP = "win_partition_sum"

# Maps qid -> impl_hash as of the code the driver last verified green.
# Regenerated at round start (scripts/update_verified_snapshot.py) BEFORE
# any operator edits; an id whose current hash differs re-enqueues first.
_SNAPSHOT_PATH = os.path.join(
    _HERE, "duckdb_data_eng_proj_spark", "queries", "verified_snapshot.json"
)


# Shared helper modules whose edits must invalidate EVERY id's green
# evidence (VERDICT r4 #2: `tokens()` in operators/textops.py could
# change under a "verified" id and getsource(fn) would never see it).
# Paths are package-relative; absolute paths are honored (tests).
_HELPER_MODULES: tuple[str, ...] = (
    "operators/textops.py",
    "operators/vectors.py",
    "functions/scalars.py",
    "io/sources.py",
    "io/scratch.py",
    "streaming/ingest.py",
    "etl/loan_pipeline.py",
)
_PKG_DIR = os.path.join(_HERE, "duckdb_data_eng_proj_spark")


@functools.lru_cache(maxsize=None)
def _helpers_digest() -> str:
    """Concatenated-source digest of the shared helper layer."""
    chunks = []
    for rel in _HELPER_MODULES:
        path = rel if os.path.isabs(rel) else os.path.join(_PKG_DIR, rel)
        try:
            with open(path, encoding="utf-8") as fh:
                chunks.append(fh.read())
        except OSError:
            chunks.append("")
    return hashlib.sha256("\x00".join(chunks).encode()).hexdigest()


@functools.lru_cache(maxsize=None)
def _module_context(modname: str) -> str:
    """Source of a query module MINUS every registered fn's own body.

    This is the module-level shared context (constants like
    `_LSH_PRELUDE`, private helpers, imports): editing it invalidates
    every id defined in the module, while editing one registered fn
    invalidates only that fn (its body is excluded here but included
    in its own payload). Closes the r4 snapshot blind spot at fn
    granularity instead of whole-module churn.
    """
    mod = sys.modules.get(modname)
    if mod is None:
        return modname
    try:
        src = inspect.getsource(mod)
    except (OSError, TypeError):
        return modname
    for spec in REGISTRY.values():
        if getattr(spec.fn, "__module__", None) != modname:
            continue
        try:
            fn_src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            continue
        src = src.replace(fn_src, "")
    return src


def _impl_hash(spec) -> str:
    """Hash of a registry entry's implementation source + oracle text
    + defining-module context + shared-helper digest.

    Used to detect 'code changed since the last green driver row'
    (VERDICT r3 #3: ext_dedup_exact / sim_ann_ivf_search shipped r3
    rewrites while coasting on r1/r2 driver evidence). Since r5 the
    payload also covers module-level constants/helpers of the fn's
    defining module and the shared operator-helper modules, so a
    helper-only edit flips dependent ids to unverified immediately
    (VERDICT r4 #2) instead of one round late.
    """
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = getattr(spec.fn, "__qualname__", repr(spec.fn))
    payload = "\x00".join(
        [
            src,
            spec.oracle or "",
            _module_context(getattr(spec.fn, "__module__", "")),
            _helpers_digest(),
        ]
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q5-analog monthly volume share) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def _green_rows() -> set[str]:
    """Query ids with an all-green row in any past CORRECTNESS_r*.json
    (rows+schema+hash; rows-only counts only while the id still has no
    registered oracle).
    """
    green: set[str] = set()
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle" and row.get("spark_rows") is not None:
                # Oracle-less entries get their rows-only check every run;
                # count them as verified-for-ordering so they stop crowding
                # out genuinely never-verified oracled ids (VERDICT r2 #2)
                # — but ONLY while the id still has no oracle. Once an
                # oracle is registered, the id must earn a hash row: the r3
                # ETL oracles were invisible to the driver precisely
                # because their stale no_oracle rows counted as verified
                # (VERDICT r3 #2).
                if qid in REGISTRY and REGISTRY[qid].oracle is None:
                    green.add(qid)
                continue
            if err:
                continue
            if row.get("rows_match") and row.get("schema_match", True) and (
                row.get("hash_match") or qid not in REGISTRY or REGISTRY[qid].oracle is None
            ):
                green.add(qid)
    return green


def _verified_green() -> set[str]:
    """Query ids considered driver-verified for enumeration ordering.

    If a driver run truncates or times out, the never-yet-verified ids
    must come first so every round widens the hard correctness signal
    instead of re-proving round-1 rows (VERDICT r1 #1). An id whose
    implementation or oracle changed since the driver last verified it
    is treated as unverified (VERDICT r3 #3): the snapshot records
    impl hashes as of driver-verified code; a missing or mismatched
    entry means the green row is stale evidence.
    """
    green = _green_rows()
    try:
        with open(_SNAPSHOT_PATH) as fh:
            snapshot = json.load(fh)
    except (OSError, ValueError):
        snapshot = {}
    return {
        qid
        for qid in green
        if qid not in REGISTRY or snapshot.get(qid) == _impl_hash(REGISTRY[qid])
    }


# Ids the driver must reach THIS round even if the verify run
# truncates (the driver records exactly ~50 rows/round).
# r6: the InferFiltersFromGenerate session exclusion changed every
# plan's helper digest, so the whole registry reads unverified and
# band ordering alone would leave the six scratch-refactor sinks
# (VERDICT r5 item 3) and the r6-rewritten heavies beyond the driver
# window. Band0 = those six + the five ops whose implementations
# actually changed this round + the four r5 carryovers; with the
# ~35 never-green r6 ids in band1 that fills the ~50-slot window
# with exactly the evidence the round needs.
_PRIORITY: tuple[str, ...] = (
    "snk_parquet_partitioned",
    "join_bucketed_colocated",
    "snk_json_lines",
    "snk_orc_roundtrip",
    "src_jsonl_roundtrip",
    "join_dpp_pruned",
    "dedup_containment",
    "txt_quality_score",
    "txt_lm_doc_score",
    "agg_sketch_cms",
    "ext_quality_ensemble",
    "ml_pagerank_2iter",
    "pipe_corpus_clean_v2",
    "dedup_cluster_cc",
    "dedup_cluster_cc_star",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Never-driver-verified ids enumerate first so a truncated verify
    run still covers new ground. Within the unverified band:
    explicit-priority ids, then ids with no green row in ANY round
    (genuinely new work), then stale-evidence ids (code changed since
    their last green row); registry order within each band.
    """
    verified = _verified_green()
    ever_green = _green_rows()
    unverified = [qid for qid in REGISTRY if qid not in verified]
    band0 = [qid for qid in _PRIORITY if qid in unverified]
    band1 = [q for q in unverified if q not in band0 and q not in ever_green]
    band2 = [q for q in unverified if q not in band0 and q in ever_green]
    ordered = band0 + band1 + band2 + [qid for qid in REGISTRY if qid in verified]
    return {qid: REGISTRY[qid].fn for qid in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle is not None}
