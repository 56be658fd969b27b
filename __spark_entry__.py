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


def _impl_hash(spec) -> str:
    """Hash of a registry entry's implementation source + oracle text.

    Used to detect 'code changed since the last green driver row'
    (VERDICT r3 #3: ext_dedup_exact / sim_ann_ivf_search shipped r3
    rewrites while coasting on r1/r2 driver evidence). Helper-level
    changes are invisible to getsource(fn) — the round-start snapshot
    regen bounds that blind spot to a single round.
    """
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = getattr(spec.fn, "__qualname__", repr(spec.fn))
    payload = src + "\x00" + (spec.oracle or "")
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Never-driver-verified ids enumerate first (registry order within
    each group) so a truncated verify run still covers new ground.
    """
    green = _verified_green()
    ordered = [qid for qid in REGISTRY if qid not in green] + [
        qid for qid in REGISTRY if qid in green
    ]
    return {qid: REGISTRY[qid].fn for qid in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle is not None}
