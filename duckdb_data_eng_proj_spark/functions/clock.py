"""Injectable clock (SURVEY.md G5).

The reference stamps three outputs with
``date_trunc('second', CURRENT_TIMESTAMP AT TIME ZONE 'Europe/Berlin')``
(pipeline.py:202,327,487) and anchors ``months_since_disbursement`` to
``CURRENT_DATE`` (pipeline.py:378) — both nondeterministic per run.
Every engine entry point takes an optional ``run_ts`` / ``as_of_date``
so tests and replays pin the clock; production passes None for live
wall-clock semantics identical to the reference's.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def berlin_now_second() -> Column:
    """Naive Europe/Berlin wall-clock truncated to the second."""
    return F.date_trunc(
        "second", F.from_utc_timestamp(F.current_timestamp(), "Europe/Berlin")
    )


def processed_at(run_ts: dt.datetime | None) -> Column:
    """The audit-column expression: injected instant, or live clock."""
    if run_ts is not None:
        return F.lit(run_ts).cast("timestamp")
    return berlin_now_second()
