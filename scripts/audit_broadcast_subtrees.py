#!/usr/bin/env python
"""Registry-wide audit: no JOIN may sit under a BroadcastExchange.

The r12 dedup_lsh_tune lesson, generalized and made checkable: a
broadcast's VALUE being k rows is not enough — its SUBTREE executes
inside the broadcast future and must finish within
spark.sql.broadcastTimeout, so a join pipeline under a broadcast dies
on a timeout at exactly the data volumes where it matters. Blessed
broadcast shapes (k-row aggregates, bounded dims, HAVING sets,
checkpoint-backed candidate tables) contain no Join node in their
subtree; anything that does is either missing a localCheckpoint (the
txt_longest_common_substring pattern) or should be a shuffle join
(`.hint("merge")`, the dedup_lsh_tune fix).

Walks the STATIC executedPlan of every registry op at sf0.001 and
reports offenders. Run per round alongside stress_scale; r12 baseline
is ZERO offenders across 268 ops.

Usage: python scripts/audit_broadcast_subtrees.py [query_id ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def joins_under_broadcast(df) -> list[list[str]]:
    plan = df._jdf.queryExecution().executedPlan()
    flags = []
    for node in _walk(plan):
        if "BroadcastExchange" in node.nodeName():
            joins = [n.nodeName() for n in _walk(node) if "Join" in n.nodeName()]
            if joins:
                flags.append(joins[:3])
    return flags


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ids = sys.argv[1:] or list(REGISTRY)
    bad, errs = {}, []
    for qid in ids:
        try:
            flags = joins_under_broadcast(REGISTRY[qid].fn(spark, SF))
        except Exception as e:  # build error — surface, don't hide
            errs.append((qid, repr(e)[:120]))
            continue
        if flags:
            bad[qid] = flags
    print(f"scanned={len(ids)} offenders={len(bad)} errors={len(errs)}")
    for qid, flags in bad.items():
        print(f"  JOIN-UNDER-BROADCAST {qid}: {flags[:2]}")
    for qid, err in errs:
        print(f"  ERROR {qid}: {err}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
