"""Shared sessionization primitive (r16 consolidation).

ext_sessionize (queries/extensions.py) and evt_session_paths
(queries/extras_r15.py) previously each inlined the same
lag → new-session flag → running-sum block; duplication is how the r4
tokens() drift incident happened, so the block lives here once and
both ops compose it. The SQL oracles keep their own inline fragments
(they are the independent spec), but the Spark side can no longer
drift between the two ops.

Scale shape: ONE user-keyed exchange serves the lag window AND the
running sum (same partitioning, Catalyst reuses it); downstream
per-(user_id, session_id) groups stay co-located under hash(user_id),
so sessionized pipelines add no further exchange — plan-pinned by
tests/test_plan_shape.py for both consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionized(events: DataFrame, gap_s: int) -> DataFrame:
    """``events`` plus a ``session_id`` BIGINT column.

    A new session starts at a user's first event or when the gap to
    the previous event (ordered by ``ts, event_id`` — the repo's
    deterministic event tie-break) exceeds ``gap_s`` seconds; the
    session id is the running count of starts, so ids are 1-based and
    contiguous per user.
    """
    # A NULL-ts event has no place on the session timeline — excluded
    # on BOTH engines (r17 NULL-vintage probe: Spark's NULLS FIRST put
    # timeless rows at the session head, DuckDB's NULLS LAST at the
    # tail, so every downstream boundary/path diverged; the oracles
    # carry the same WHERE ts IS NOT NULL).
    events = events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = F.col("ts").cast("long") - prev_ts.cast("long")
    flagged = events.withColumn(
        "new_session",
        F.when(prev_ts.isNull() | (gap > gap_s), 1).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_id", F.sum("new_session").over(run).cast("bigint")
    ).drop("new_session")
