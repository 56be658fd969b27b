"""Physical-plan introspection: the scale contract, enforced.

Correctness tests prove the right rows come out; these helpers prove
the right PLAN produces them — filters pushed to the scan, columns
pruned, small sides broadcast, no accidental extra shuffles. At 100 TB
a plan regression is an outage, so plan shape is tested like behavior
(tests/test_plan_shape.py).
"""

from duckdb_data_eng_proj_spark.plans.audit import (  # noqa: F401
    count_exchanges,
    joins_under_broadcast,
    physical_plan,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    walk_physical,
)
