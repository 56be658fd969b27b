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


# Shared helper modules whose edits must invalidate DEPENDENT ids'
# green evidence (VERDICT r4 #2: `tokens()` in operators/textops.py
# could change under a "verified" id and getsource(fn) would never see
# it). Since r7 the digest is PER-ID-DEPENDENCY, not global: VERDICT
# r6 #2 showed the all-seven-helpers digest flips all 232 ids to
# unverified on any helper edit, and a ~50-row driver window can never
# re-certify the registry. An id's payload now covers only the helper
# and sibling-query-module files its defining module actually imports
# (transitively). Paths are package-relative; absolute honored (tests).
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

# Package subdirs whose modules count as intra-package dependency
# targets (a query module importing any of them pulls that file into
# its ids' hash payload).
_DEP_SCAN_DIRS: tuple[str, ...] = (
    "queries", "etl", "operators", "functions", "io", "streaming"
)


@functools.lru_cache(maxsize=None)
def _dep_file_map() -> dict[str, tuple[str, ...]]:
    """basename (sans .py) -> abs file paths it may refer to.

    Seeded with _HELPER_MODULES (so tests can monkeypatch extra
    entries), then every .py in the package's dependency dirs. A
    basename colliding across dirs maps to ALL its paths
    (conservative: importing either invalidates on edits to both).
    """
    out: dict[str, list[str]] = {}
    for rel in _HELPER_MODULES:
        path = rel if os.path.isabs(rel) else os.path.join(_PKG_DIR, rel)
        base = os.path.splitext(os.path.basename(path))[0]
        out.setdefault(base, []).append(path)
    for sub in _DEP_SCAN_DIRS:
        d = os.path.join(_PKG_DIR, sub)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if not name.endswith(".py") or name == "__init__.py":
                continue
            path = os.path.join(d, name)
            base = name[:-3]
            if path not in out.setdefault(base, []):
                out[base].append(path)
    return {b: tuple(ps) for b, ps in out.items()}


@functools.lru_cache(maxsize=None)
def _file_source(path: str) -> str:
    try:
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        return ""


@functools.lru_cache(maxsize=None)
def _file_digest(path: str) -> str:
    return hashlib.sha256(_file_source(path).encode()).hexdigest()


@functools.lru_cache(maxsize=None)
def _file_deps(path: str) -> tuple[str, ...]:
    """Direct intra-package dependency files of one source file.

    A dependency is any known basename appearing as a word on an
    import line (top-level or function-local — `grep`-equivalent, so
    lazy `from ...training import _hyperplanes` inside a fn body
    counts). Overmatching is safe (extra invalidation only)."""
    import re

    dep_map = _dep_file_map()
    deps: set[str] = set()
    for line in _file_source(path).splitlines():
        stripped = line.lstrip()
        if not (stripped.startswith("from ") or stripped.startswith("import ")):
            continue
        for base, paths in dep_map.items():
            if re.search(rf"\b{re.escape(base)}\b", stripped):
                deps.update(p for p in paths if p != path)
    return tuple(sorted(deps))


def _deps_closure(path: str) -> tuple[str, ...]:
    """BFS-transitive dependency files of one source file."""
    seen: set[str] = set()
    frontier = list(_file_deps(path))
    while frontier:
        p = frontier.pop()
        if p in seen or p == path:
            continue
        seen.add(p)
        frontier.extend(_file_deps(p))
    return tuple(sorted(seen))


@functools.lru_cache(maxsize=None)
def _deps_digest(path: str) -> str:
    """Combined digest over a module file's transitive dependencies."""
    parts = [f"{os.path.basename(p)}:{_file_digest(p)}" for p in _deps_closure(path)]
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


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
    + defining-module context + per-module dependency digest.

    Used to detect 'code changed since the last green driver row'
    (VERDICT r3 #3: ext_dedup_exact / sim_ann_ivf_search shipped r3
    rewrites while coasting on r1/r2 driver evidence). Since r5 the
    payload also covers module-level constants/helpers of the fn's
    defining module; since r7 the helper part is the transitive
    dependency digest of the DEFINING MODULE ONLY (VERDICT r6 #2:
    the global seven-helper digest flipped all 232 ids on any helper
    edit, unrecoverable with a ~50-row driver window). A helper-only
    edit now flips exactly the ids whose module imports that helper.
    """
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = getattr(spec.fn, "__qualname__", repr(spec.fn))
    modname = getattr(spec.fn, "__module__", "")
    mod = sys.modules.get(modname)
    modfile = getattr(mod, "__file__", None) or modname
    payload = "\x00".join(
        [
            src,
            spec.oracle or "",
            _module_context(modname),
            _deps_digest(os.path.abspath(modfile) if os.path.exists(str(modfile)) else str(modfile)),
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
# r7 (VERDICT r6 items 1+2): the six ops that landed after the r6
# driver window and have ZERO driver evidence, then ts_gap_fill (r6's
# one red row, hardened to epoch-int bucket_epoch_s this round), then
# ml_kmeans_converged (gained an oracle after its r3 rows-only row —
# never hash-checked). Registry growth is frozen this round (VERDICT
# r6 item 5), so the remaining ~40 window slots flow to the verified
# band, which now rotates oldest-evidence-first (see queries()).
# r17 (VERDICT r16 item 1): the five r16 window-overflow ids whose
# driver evidence predates their r16 edits — dropped from the
# snapshot at r17 end (the round-start regen had blessed them by
# construction) and steered to the head so the r17 window certifies
# them FIRST. Self-expiring: once green, _verified_green() reclaims
# them and band0 filters them out.
_PRIORITY: tuple[str, ...] = (
    "graph_bfs_seed_distance",
    "txt_hybrid_rrf",
    "sim_ann_ivf_repair",
    "evt_session_paths",
    "graph_mst_boruvka",
)

# Verified ids lifted to the HEAD of the band3 rotation this round.
# r8 (VERDICT r7 item 5): the named oldest-evidence stragglers that
# plain oldest-round ordering would crowd out behind the ~54 r2+r3
# ids — the ETL family (r3/r4), ext_dedup_exact/near (r4), the §2
# scan/filter contract block's anchors + fn_now_tz + ext_stream_ingest
# (r5). Everything else still rotates oldest-evidence-first after
# these.
_RECERT_PRIORITY: tuple[str, ...] = (
    "ext_udf_surface",      # r2 — oldest evidence in the registry
    "etl_quality_report",   # r3
    "etl_quarantine",       # r4
    "etl_clean_apps",
    "etl_clean_lms",
    "etl_portfolio",
    "etl_q0",
    "etl_q1",
    "etl_q2",
    "etl_q3",
    "etl_q4",
    "etl_q5",
    "etl_strict_spec",
    "ext_dedup_exact",      # r4
    "ext_dedup_near",       # r4
    "fn_now_tz",            # r5
    "ext_stream_ingest",    # r5
    "src_csv_all_varchar",  # r5 — §2.1 scan block anchor
    "src_parquet",
    "snk_csv_quoted",
)

# The steering head SELF-EXPIRES (VERDICT r8 item 1): an id drops out
# of the head the moment its latest green evidence is newer than the
# round the steering was written against, so a driver run that
# re-certifies the named stragglers cannot leave the list asserting a
# stale fact. With every _RECERT_PRIORITY id re-certified in r8, the
# filtered head is empty and plain oldest-evidence-first order rules.
_RECERT_STALE_MAX = 5


def _recert_head() -> list[str]:
    """_RECERT_PRIORITY minus any id with fresh (> _RECERT_STALE_MAX) evidence."""
    rounds = _latest_green_rounds()
    return [q for q in _RECERT_PRIORITY if rounds.get(q, 0) <= _RECERT_STALE_MAX]


@functools.lru_cache(maxsize=None)
def _latest_green_rounds() -> dict[str, int]:
    """qid -> newest round number with an all-green row (0 if none)."""
    import re

    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            # Mirror _green_rows' predicate: a rows-only no_oracle row
            # counts as that id's green evidence while the id is still
            # oracle-less — otherwise such an id reads round 0 forever
            # and permanently pins the head of the band3 rotation.
            if err == "no_oracle" and row.get("spark_rows") is not None:
                if qid in REGISTRY and REGISTRY[qid].oracle is None:
                    latest[qid] = max(latest.get(qid, 0), rnd)
                continue
            if err:
                continue
            if row.get("rows_match") and row.get("schema_match", True) and row.get("hash_match"):
                latest[qid] = max(latest.get(qid, 0), rnd)
    return latest


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
    # Verified band: oldest green evidence first, so the ~40 window
    # slots left after band0-2 ROTATE re-certification through the
    # registry instead of re-proving the same head ids every round
    # (VERDICT r6 item 5: spend the window on re-certification).
    rounds = _latest_green_rounds()
    reg_ix = {qid: i for i, qid in enumerate(REGISTRY)}
    recert_ix = {qid: i for i, qid in enumerate(_recert_head())}
    band3 = sorted(
        (qid for qid in REGISTRY if qid in verified),
        key=lambda q: (
            recert_ix.get(q, len(recert_ix)),
            rounds.get(q, 0),
            reg_ix[q],
        ),
    )
    ordered = band0 + band1 + band2 + band3
    return {qid: REGISTRY[qid].fn for qid in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: spec.oracle for qid, spec in REGISTRY.items() if spec.oracle is not None}
