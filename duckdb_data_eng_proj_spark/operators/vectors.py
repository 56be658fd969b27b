"""Vector building blocks: dot product / cosine over array<float>.

Deterministic by construction: elements are cast to DOUBLE, products
are summed left-to-right with a 0.0 seed (``F.aggregate`` is a
sequential fold), so Spark and the DuckDB oracle (a ``list_reduce``
fold in the same order) produce bit-identical doubles. Final values
are rounded by callers before comparison/thresholding.

Scale path: these are pure Column expressions — cosine over a 100 TB
embedding table is a narrow map stage. The all-pairs formulations in
the query registrations are bucketed (by label / by IVF centroid) so
the join is a bounded bucket-join, not an O(n²) crossJoin; see
``sim_ann_ivf*`` for the ANN path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in DOUBLE (order-pinned, exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) — written exactly like the oracle SQL."""
    return dot(a, b) / (norm(a) * norm(b))
