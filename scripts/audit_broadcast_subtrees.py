#!/usr/bin/env python
"""Registry-wide audit: no heavy JOIN pipeline may sit under a
CODE-FORCED BroadcastExchange.

The r12 dedup_lsh_tune lesson, generalized and made checkable: a
broadcast's VALUE being k rows is not enough — its SUBTREE executes
inside the broadcast future and must finish within
spark.sql.broadcastTimeout, so a join pipeline under a broadcast dies
on a timeout at exactly the data volumes where it matters.

Session configuration (both matter — ADVICE r12 showed the r12 run
was vacuous without the first, and over-flagging without the second):

- ``latency_profile=True`` (AQE OFF): under AQE, ``executedPlan()``
  returns a childless AdaptiveSparkPlan leaf, so a naive walk visits
  exactly one node and reports nothing. (plans.walk_physical also
  descends through AdaptiveSparkPlan defensively.)
- ``spark.sql.autoBroadcastJoinThreshold = -1``: with the size-based
  planner rule disabled, the ONLY BroadcastExchanges left in the
  static plan are the ones the CODE forces via ``F.broadcast`` — the
  hints AQE will never demote at 100 TB. Planner-chosen broadcasts
  (tpch q5/q7-style joined-dim sides that fit under 64 MB at bench
  scale) self-correct to shuffle joins when the build side outgrows
  the threshold, so flagging them is noise: the tpch.py hint policy
  (VERDICT r2) already keeps hints off anything that scales.

Sanctioned shapes (documented, checked structurally):

- S1 ``bounded-dim``: every FileScan leaf under the broadcast reads a
  CONSTANT-size table (region, nation — fixed 5/25 rows at every
  TPC-H scale). Joining constants under a broadcast is free forever.
- S2 ``scalar-stamp``: every Join under the broadcast is a
  BroadcastNestedLoopJoin whose build side is a join-free GLOBAL
  (no-grouping, 1-row) aggregate — the `crossJoin(F.broadcast(total))`
  assembly. Cost class identical to the already-blessed HAVING-set
  broadcast: one corpus aggregate, no join pipeline.

Anything else — a SortMergeJoin, a ShuffledHashJoin, or a
BroadcastHashJoin inside a forced broadcast's subtree — is an
OFFENDER: either it is missing an eager localCheckpoint (the
txt_longest_common_substring / ml_perceptron_round r13 pattern) or it
should be a shuffle join (`.hint("merge")`, the dedup_lsh_tune fix).

Run per round alongside stress_scale; exits 1 on any offender.

Usage: python scripts/audit_broadcast_subtrees.py [query_id ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.plans import walk_physical
from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.session import get_spark

SF = "/root/testdata/sf0.001"

# Constant-cardinality tables: 5 regions / 25 nations at EVERY TPC-H
# scale factor. Everything else in the testdata grows with SF.
_CONSTANT_TABLES = {"region", "nation"}


def _leaf_tables(node) -> set[str]:
    """Parquet/CSV table names scanned anywhere under ``node``."""
    tables: set[str] = set()
    for n in walk_physical(node):
        if "Scan" not in n.nodeName():
            continue
        try:
            # maxFields must be large enough to keep the Location
            # entry (the table path) un-elided.
            text = n.verboseString(100)
        except Exception:
            text = n.toString()
        for m in re.finditer(r"([A-Za-z0-9_]+)\.(?:parquet|csv)", str(text)):
            tables.add(m.group(1))
    return tables


def _is_global_agg(node) -> bool:
    """True when ``node`` is an Aggregate with no grouping keys."""
    if "Aggregate" not in node.nodeName():
        return False
    try:
        return node.groupingExpressions().isEmpty()
    except Exception:
        return False


def _unwrap(node):
    """Skip codegen wrappers (InputAdapter / WholeStageCodegen)."""
    while (
        node.nodeName() == "InputAdapter"
        or "WholeStageCodegen" in node.nodeName()
    ) and node.children().size() > 0:
        node = node.children().apply(0)
    return node


def _scalar_stamp(join_node) -> bool:
    """S2: a BroadcastNestedLoopJoin whose broadcast side is a
    join-free global aggregate (the 1-row total stamped onto a k-row
    table). Children sit behind codegen wrappers; a ReusedExchange
    build side resolves to the original exchange via ``child()``."""
    if "BroadcastNestedLoopJoin" not in join_node.nodeName():
        return False
    ch = join_node.children()
    for i in range(ch.size()):
        child = _unwrap(ch.apply(i))
        name = child.nodeName()
        if "ReusedExchange" in name:
            try:
                child = child.child()
            except Exception:
                continue
        elif "BroadcastExchange" not in name:
            continue
        nodes = list(walk_physical(child))
        if any("Join" in n.nodeName() for n in nodes[1:]):
            return False
        if any(_is_global_agg(n) for n in nodes):
            return True
    return False


def classify(df) -> tuple[list, list]:
    """(offenders, sanctioned) — per offending BroadcastExchange."""
    plan = df._jdf.queryExecution().executedPlan()
    offenders, sanctioned = [], []
    for node in walk_physical(plan):
        if "BroadcastExchange" not in node.nodeName():
            continue
        joins = [
            n for n in walk_physical(node) if "Join" in n.nodeName()
        ]
        if not joins:
            continue
        names = [j.nodeName() for j in joins]
        leaves = _leaf_tables(node)
        if leaves and leaves <= _CONSTANT_TABLES:
            sanctioned.append(("S1 bounded-dim", names[:3]))
        elif all(_scalar_stamp(j) for j in joins):
            sanctioned.append(("S2 scalar-stamp", names[:3]))
        else:
            offenders.append(names[:3])
    return offenders, sanctioned


def main() -> None:
    spark = get_spark(
        app_name="audit-broadcast", latency_profile=True
    )
    # Forced-broadcast-only view: see module docstring.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")
    ids = sys.argv[1:] or list(REGISTRY)
    bad, waived, errs = {}, {}, []
    for qid in ids:
        try:
            offenders, sanctioned = classify(REGISTRY[qid].fn(spark, SF))
        except Exception as e:  # build error — surface, don't hide
            errs.append((qid, repr(e)[:120]))
            continue
        if offenders:
            bad[qid] = offenders
        if sanctioned:
            waived[qid] = sanctioned
    print(
        f"scanned={len(ids)} offenders={len(bad)} "
        f"sanctioned={len(waived)} errors={len(errs)}"
    )
    for qid, flags in bad.items():
        print(f"  JOIN-UNDER-BROADCAST {qid}: {flags[:2]}")
    for qid, flags in waived.items():
        print(f"  sanctioned {qid}: {flags[:2]}")
    for qid, err in errs:
        print(f"  ERROR {qid}: {err}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
