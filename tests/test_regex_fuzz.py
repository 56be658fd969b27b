"""Seeded cross-engine fuzz of the registry's ACTUAL regex patterns.

Java's regex engine (Spark rlike / regexp_extract_all /
regexp_replace) and DuckDB's RE2 differ in feature sets (lookaround,
backrefs exist only in Java) — but every pattern a registry operator
ships is deliberately within the common RE2-safe subset
(scalar_fns.py module docstring, txt_pii_scrub doc). This fuzz runs
those REAL patterns — the BPE sub-token pattern (training.py:210),
the email/phone PII patterns (training.py:1109/1124), the customer-
name anchor (relational.py:381), the non-alphanumeric punctuation
class (training.py:325) — over generated adversarial strings
(boundary-adjacent near-matches, repeated candidates, unicode
neighbors, empty) and asserts match counts, extracted match lists,
and global-replace outputs agree exactly.

Replace-flag reminder pinned here as executable fact: DuckDB
regexp_replace is FIRST-match unless the 'g' flag is passed; Spark's
replaces all matches always. Every oracle spells the 'g'.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.operators.textops import BPE_TOKEN_RE

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_NAME_RE = r"^Customer#00000000[0-9]$"
_PUNCT_RE = r"[^a-z0-9\s]"

_CHUNKS = [
    "user@example.com", "bad@@x.y", "a@b.c", "x@y.z extra", "no-at-sign.com",
    "user.name+tag@sub.domain.org", "@leading.com", "trail@dot.",
    "+1-555-1234", "+1-555-123", "+1-555-12345", "+2-555-9999",
    "Customer#000000001", "Customer#0000000012", "customer#000000001",
    "word", "x9", "!?!", "a b  c", "", "под", "中文", "🙂", "tab\there",
    "UPPER lower", "a@b.cd e@f.gh", "12.5%", "(parens)", "semi;colon",
]


def _gen_strings(n: int, seed: int) -> list:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 5)
        out.append(" ".join(rng.choice(_CHUNKS) for _ in range(k)))
    out += _CHUNKS  # every chunk alone, deterministically
    return out


def test_registry_regexes_match_duckdb(spark):
    texts = _gen_strings(300, seed=5150)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "body"])
    lowered = F.lower(F.trim(F.col("body")))
    got = {
        r.i: (r.n_bpe, r.emails, r.n_phone, r.name_hit, r.scrubbed, r.depunct)
        for r in df.select(
            "i",
            F.size(F.regexp_extract_all(lowered, F.lit(BPE_TOKEN_RE), 0)).alias("n_bpe"),
            F.regexp_extract_all(F.col("body"), F.lit(_EMAIL_RE), 0).alias("emails"),
            F.size(F.regexp_extract_all(F.col("body"), F.lit(_PHONE_RE), 0)).alias("n_phone"),
            F.col("body").rlike(_NAME_RE).alias("name_hit"),
            F.regexp_replace(
                F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE, "<PHONE>",
            ).alias("scrubbed"),
            F.regexp_replace(lowered, _PUNCT_RE, "").alias("depunct"),
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        "SELECT len(regexp_extract_all(lower(trim(?)), ?)), "
        "regexp_extract_all(?, ?), "
        "len(regexp_extract_all(?, ?)), "
        "regexp_matches(?, ?), "
        "regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), "
        "regexp_replace(lower(trim(?)), ?, '', 'g')"
    )
    for i, t in enumerate(texts):
        want = con.execute(
            sql,
            [t, BPE_TOKEN_RE, t, _EMAIL_RE, t, _PHONE_RE, t, _NAME_RE,
             t, _EMAIL_RE, _PHONE_RE, t, _PUNCT_RE],
        ).fetchone()
        have = got[i]
        assert have[0] == want[0], f"bpe({t!r}): {have[0]} != {want[0]}"
        assert list(have[1]) == want[1], f"emails({t!r}): {have[1]} != {want[1]}"
        assert have[2] == want[2], f"phones({t!r}): {have[2]} != {want[2]}"
        assert have[3] == want[3], f"name({t!r}): {have[3]} != {want[3]}"
        assert have[4] == want[4], f"scrub({t!r}): {have[4]!r} != {want[4]!r}"
        assert have[5] == want[5], f"depunct({t!r}): {have[5]!r} != {want[5]!r}"


def test_replace_flag_semantics(spark):
    """DuckDB without 'g' replaces only the first match; Spark always
    replaces all — the exact trap the oracles' 'g' flags exist for."""
    body = "a@b.cd and e@f.gh"
    (spark_out,) = (
        spark.createDataFrame([(body,)], ["b"])
        .select(F.regexp_replace("b", _EMAIL_RE, "<EMAIL>"))
        .collect()[0]
    )
    con = duckdb.connect()
    first_only = con.execute(
        "SELECT regexp_replace(?, ?, '<EMAIL>')", [body, _EMAIL_RE]
    ).fetchone()[0]
    global_ = con.execute(
        "SELECT regexp_replace(?, ?, '<EMAIL>', 'g')", [body, _EMAIL_RE]
    ).fetchone()[0]
    assert spark_out == "<EMAIL> and <EMAIL>" == global_
    assert first_only == "<EMAIL> and e@f.gh"
