"""Seeded cross-engine fuzz of the tolerant all-VARCHAR CSV contract.

The reference's ingestion heart (pipeline.py:85-113, SURVEY.md G1):
header + all-string columns, short rows null-fill, a row carrying one
field more than the header binds it to the trailing overflow column
(the quarantine predicate), RFC-4180 quoting with doubled quotes.

This fuzz generates a few hundred rows mixing every edge class the
contract covers — quoted separators, doubled quotes, unicode, empty
fields, whitespace padding, short and over-long rows — and asserts
the Spark loader and DuckDB's read_csv(all_varchar, null_padding)
produce the identical row multiset. Deterministic seed: failures
reproduce.

Deliberately out of scope (documented contract bounds, not covered by
the reference's machine-generated feeds): embedded newlines inside
quoted fields (Spark needs multiLine=true, a different scan mode that
breaks input splitting at scale) and rows more than one field over
the header (the overflow column captures exactly one extra token).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_data_eng_proj_spark.io.sources import read_csv_all_varchar

_COLUMNS = ["id", "name", "amt"]

# Edge-class generators; each returns the RAW (unquoted) field value.
_FIELD_CLASSES = [
    lambda rng: str(rng.randint(0, 10**9)),
    lambda rng: "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 12))),
    lambda rng: f"with, comma {rng.randint(0, 99)}",
    lambda rng: f'says "{rng.choice(["hi", "no", "yes"])}"',
    lambda rng: rng.choice(["ünïcode £€", "naïve", "🙂 emoji", "Ω≈ç√"]),
    lambda rng: "",
    lambda rng: f"  padded {rng.randint(0, 9)}  ",
    lambda rng: f"{rng.randint(0, 9999) / 100:.2f}",
]


def _encode(field: str, rng: random.Random) -> str:
    needs_quote = any(c in field for c in ',"') or field != field.strip()
    if needs_quote or (field and rng.random() < 0.3):
        return '"' + field.replace('"', '""') + '"'
    return field


def _gen_csv(path: str, n_rows: int, seed: int) -> None:
    rng = random.Random(seed)
    lines = [",".join(_COLUMNS)]
    for _ in range(n_rows):
        # 1-3 fields = short rows; 4 = one-over -> overflow column
        n_fields = rng.choice([1, 2, 3, 3, 3, 3, 4])
        fields = [rng.choice(_FIELD_CLASSES)(rng) for _ in range(n_fields)]
        line = ",".join(_encode(f, rng) for f in fields)
        # A lone empty unquoted field serializes to a BLANK LINE, where
        # the engines genuinely diverge (Spark's line reader skips it,
        # DuckDB null_padding emits an all-NULL row). Blank lines are
        # outside the contract (the reference's feeds are machine-
        # generated); quote it so both engines see a 1-field row.
        lines.append('""' if line == "" else line)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_csv_all_varchar_matches_duckdb(spark, tmp_path):
    path = str(tmp_path / "fuzz.csv")
    _gen_csv(path, n_rows=400, seed=20260814)

    def key(row):
        return tuple("\x00" if v is None else "s" + v for v in row)

    sdf = read_csv_all_varchar(spark, path, _COLUMNS, extra="overflow")
    spark_rows = sorted((tuple(r) for r in sdf.collect()), key=key)

    duck = duckdb.sql(
        f"SELECT * FROM read_csv('{path}', header=true, all_varchar=true, "
        "null_padding=true)"
    ).fetchall()
    # If no generated row overflowed, DuckDB infers only the 3 header
    # columns — pad to the Spark schema's trailing overflow column.
    width = len(_COLUMNS) + 1
    duck_rows = sorted(
        (tuple(r) + (None,) * (width - len(r)) for r in duck), key=key
    )

    assert len(spark_rows) == 400 == len(duck_rows)
    assert spark_rows == duck_rows
