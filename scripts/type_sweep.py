"""Cross-engine result-type sweep: flag driver-hash-hazardous columns.

Round-1 lesson (VERDICT.md "What's wrong" #1): the driver's value
hasher serializes DECIMAL and DuckDB HUGEINT differently across
engines even when values are identical.  This sweep builds every
registered query's Spark schema (analysis only, no execution) and the
DuckDB oracle's result schema, then flags:

  * DECIMAL on either side
  * HUGEINT / INT128 on the DuckDB side
  * canonical-type mismatches between engines (e.g. int32 vs int64)

Run: python scripts/type_sweep.py
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.io.sources import TESTDATA_TABLES
from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def canon_duck(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "!DECIMAL"
    if t in ("HUGEINT", "INT128", "UHUGEINT"):
        return "!HUGEINT"
    m = {
        "BIGINT": "long", "INT64": "long", "UBIGINT": "!UBIGINT",
        "INTEGER": "int", "INT32": "int", "SMALLINT": "short",
        "TINYINT": "byte", "DOUBLE": "double", "FLOAT": "float",
        "VARCHAR": "string", "DATE": "date", "BOOLEAN": "bool",
        "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamptz",
        "BLOB": "binary", "JSON": "string",
    }
    if t.endswith("[]"):
        return f"array<{canon_duck(t[:-2])}>"
    if t.startswith("MAP"):
        return "map"
    if t.startswith("STRUCT"):
        return "struct"
    return m.get(t, f"?{t}")


def canon_spark(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "!DECIMAL"
    m = {
        T.LongType: "long", T.IntegerType: "int", T.ShortType: "short",
        T.ByteType: "byte", T.DoubleType: "double", T.FloatType: "float",
        T.StringType: "string", T.DateType: "date", T.BooleanType: "bool",
        T.TimestampType: "timestamp", T.TimestampNTZType: "timestamp",
        T.BinaryType: "binary",
    }
    if isinstance(dt, T.ArrayType):
        return f"array<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.StructType):
        return "struct"
    return m.get(type(dt), f"?{dt}")


def main() -> int:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    spark = get_spark(cpus="4")

    n_bad = 0
    for qid in sorted(REGISTRY):
        spec = REGISTRY[qid]
        problems = []
        try:
            sdf = spec.fn(spark, SF_DIR)
            s_types = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {qid}: spark build failed: {e}")
            n_bad += 1
            continue
        d_types = None
        if spec.oracle is not None:
            try:
                rel = con.sql(spec.oracle)
                d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
                d_types = {k: canon_duck(v) for k, v in d_types.items()}
            except Exception as e:  # noqa: BLE001
                print(f"ERROR  {qid}: oracle failed: {e}")
                n_bad += 1
                continue

        for c, ty in s_types.items():
            if "!" in ty or "?" in ty:
                problems.append(f"spark {c}:{ty}")
        if d_types is not None:
            for c, ty in d_types.items():
                if "!" in ty or "?" in ty:
                    problems.append(f"duck {c}:{ty}")
            if set(s_types) == set(d_types):
                for c in s_types:
                    if s_types[c] != d_types[c] and "!" not in (
                        s_types[c] + d_types[c]
                    ):
                        problems.append(
                            f"mismatch {c}: spark={s_types[c]} duck={d_types[c]}"
                        )
            else:
                problems.append(
                    f"colset mismatch: spark={sorted(s_types)} duck={sorted(d_types)}"
                )
        if problems:
            n_bad += 1
            print(f"FLAG   {qid}: " + "; ".join(problems))
    print(f"\n{n_bad} flagged / {len(REGISTRY)} entries")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
