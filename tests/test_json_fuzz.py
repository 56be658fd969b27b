"""Seeded cross-engine fuzz of JSON field extraction.

`F.get_json_object` backs ext_json_extract / fn_json_map over
events.props; the oracles spell it `json_extract_string`. This fuzz
generates JSON documents — nested objects, arrays, escaped quotes,
\\uXXXX escapes, emoji, int64-range numbers, floats, bools, JSON
null, empty strings, missing keys, surrounding whitespace — and
asserts extraction parity against the null-guarded DuckDB spelling
(`CASE WHEN json_valid THEN json_extract_string END`; DuckDB's
extractor THROWS on malformed input where Spark's returns NULL, so
tolerant pipelines must guard — that asymmetry is itself pinned
below).

Notable agreements the fuzz relies on: scientific notation
normalizes identically ('1e3' -> '1000.0' both), duplicate keys take
the FIRST value on both, leading-zero numbers are invalid on both.

Known residual divergences, pinned as expected:
- trailing garbage '{"k": 12}extra': Spark's Jackson parses the
  leading document, DuckDB rejects the whole input;
- single-quoted keys "{'k': 5}": Jackson tolerance, invalid JSON to
  DuckDB (and per RFC 8259);
- integers beyond int64: Spark preserves the digit string, DuckDB's
  yyjson converts to a double ('1e21');
- non-ASCII inside a NESTED container: extracting a sub-object or
  array re-serializes it, and Spark's Jackson emits \\uXXXX escapes
  where DuckDB emits raw UTF-8 (top-level string extraction
  unescapes identically on both).
None occurs in events.props (machine-generated strict JSON).
"""

from __future__ import annotations

import json
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _gen_value(rng: random.Random, depth: int = 0):
    roll = rng.random()
    if depth < 2 and roll < 0.15:
        return {
            rng.choice(["n", "m", "k"]): _gen_value(rng, depth + 1)
            for _ in range(rng.randint(1, 2))
        }
    if depth < 2 and roll < 0.25:
        return [_gen_value(rng, depth + 1) for _ in range(rng.randint(0, 3))]
    if roll < 0.45:
        return rng.randint(-(2**63) + 1, 2**63 - 1)
    if roll < 0.6:
        return round(rng.uniform(-1e6, 1e6), rng.randint(0, 6))
    if roll < 0.7:
        return rng.choice([True, False, None])
    if depth > 0:
        # non-ASCII inside a NESTED container re-serializes divergently
        # (pinned below) — keep nested strings ASCII
        return rng.choice(["", "plain", 'quote"inside', "null", "12",
                           "back\\slash", "tab\there"])
    return rng.choice(
        ["", "plain", 'quote"inside', "unié", "🙂", "null", "12",
         "back\\slash", "tab\there", "line\nbreak"]
    )


def _gen_doc(rng: random.Random) -> str:
    obj = {}
    if rng.random() < 0.85:  # else: the probed key is absent
        obj["k"] = _gen_value(rng)
    for extra in ("j", "x"):
        if rng.random() < 0.5:
            obj[extra] = _gen_value(rng)
    doc = json.dumps(obj, ensure_ascii=rng.random() < 0.5)
    if rng.random() < 0.2:
        doc = f"  {doc}  "
    return doc


_DUCK_SQL = (
    "SELECT CASE WHEN ? IS NOT NULL AND json_valid(?) "
    "THEN json_extract_string(?::JSON, '$.k') END"
)


def test_json_extraction_matches_duckdb(spark):
    rng = random.Random(90210)
    docs = [_gen_doc(rng) for _ in range(400)]
    docs += ["not json", "", "[1,2,3]", '{"k": 012}', '{"k ": 8}',
             '{"k": 12, "k": 99}']
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["i", "props"])
    got = {
        r.i: r.s
        for r in df.select(
            "i", F.get_json_object("props", "$.k").alias("s")
        ).collect()
    }
    con = duckdb.connect()
    for i, d in enumerate(docs):
        (want,) = con.execute(_DUCK_SQL, [d, d, d]).fetchone()
        assert got[i] == want, f"doc {i} {d!r}: spark={got[i]!r} duck={want!r}"


def test_known_json_divergences_stay_divergent(spark):
    cases = ['{"k": 12}extra', "{'k': 5}", '{"k": 999999999999999999999}',
             "not json"]
    df = spark.createDataFrame([(c,) for c in cases], ["props"])
    got = {
        r.props: r.s
        for r in df.select(
            "props", F.get_json_object("props", "$.k").alias("s")
        ).collect()
    }
    con = duckdb.connect()

    def duck(d):
        return con.execute(_DUCK_SQL, [d, d, d]).fetchone()[0]

    assert got['{"k": 12}extra'] == "12" and duck('{"k": 12}extra') is None
    assert got["{'k': 5}"] == "5" and duck("{'k': 5}") is None
    assert got['{"k": 999999999999999999999}'] == "999999999999999999999"
    assert duck('{"k": 999999999999999999999}') == "1e21"
    # the guard asymmetry: unguarded DuckDB extraction THROWS on
    # malformed input, Spark's returns NULL — tolerant oracles must
    # wrap in json_valid
    assert got["not json"] is None
    import pytest as _pytest

    with _pytest.raises(duckdb.Error):
        con.execute(
            "SELECT json_extract_string(?::JSON, '$.k')", ["not json"]
        ).fetchone()
    # nested-container re-serialization of non-ASCII
    ndf = spark.createDataFrame([('{"k": ["🙂"]}',)], ["props"])
    (nv,) = ndf.select(F.get_json_object("props", "$.k")).collect()[0]
    assert nv == '["\\uD83D\\uDE42"]'
    assert con.execute(_DUCK_SQL, ['{"k": ["🙂"]}'] * 3).fetchone()[0] == '["🙂"]'
