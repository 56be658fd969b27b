"""CSV export parity: our stage-5 files vs the reference's goldens.

Byte-level comparison of header + sorted data lines (row order is the
only permitted difference — the reference preserves insertion order,
Spark's is partition-dependent).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from duckdb_data_eng_proj_spark.etl.export import export_outputs
from tests.test_etl_golden import GOLD, result  # noqa: F401  (fixture)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference goldens not available"
)


@pytest.mark.parametrize(
    "name", ["cleaned_applications", "loan_portfolio", "data_quality_report"]
)
def test_export_matches_golden_bytes(result, name):  # noqa: F811
    out_dir = tempfile.mkdtemp(prefix="export_")
    paths = export_outputs(result, out_dir)
    with open(paths[name], encoding="utf-8") as f:
        ours = f.read().splitlines()
    with open(f"{GOLD}/{name}.csv", encoding="utf-8") as f:
        golden = f.read().splitlines()
    assert ours[0] == golden[0], "header mismatch"
    assert sorted(ours[1:]) == sorted(golden[1:])
