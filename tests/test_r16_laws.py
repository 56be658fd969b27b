"""Round-16 law tests.

1. _star_fixpoint exit soundness (VERDICT r15 item 1): the exit is now
   signature-screen + EXACT no-change confirm, and the round cap
   raises instead of returning a truncated contraction. The laws here
   pin (a) that the returned edge set is a TRUE fixpoint (one more
   star round changes nothing — exactly the property the bare
   signature could not prove), (b) that the confirm predicate
   distinguishes signature-colliding edge sets, and (c) the loud cap
   failure.
2. Zero-norm centroid guard (VERDICT r15 item 2 / SURVEY queue 6d):
   on a fixture whose centroid seed set contains an all-zero vector,
   the admission/drift/repair family must produce HASH-IDENTICAL
   results on Spark and DuckDB — previously the NaN cosines made the
   engines break the argmax tie differently.
"""

from __future__ import annotations

import math
import os
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.corpus import (
    _large_star,
    _small_star,
    _star_fixpoint,
)
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# _star_fixpoint exit soundness


def _rand_edges(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return sorted(edges)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_star_fixpoint_result_is_true_fixpoint(spark, seed):
    """One more alternating star round over the returned edge set must
    change NOTHING — set-exactly, not signature-exactly. This is the
    property the old (count, Σu, Σv) exit assumed without proof."""
    edges = spark.createDataFrame(
        _rand_edges(seed, 40, 70), "u long, v long"
    ).localCheckpoint()
    fixed = _star_fixpoint(edges).localCheckpoint()
    again = _small_star(_large_star(fixed))
    assert again.exceptAll(fixed).isEmpty()
    assert fixed.exceptAll(again).isEmpty()
    # and the stars are rooted: every u is a component minimum, so no
    # u may appear as a member (v) of another star
    roots = {r.u for r in fixed.select("u").distinct().collect()}
    members = {r.v for r in fixed.select("v").distinct().collect()}
    assert not roots & members


def test_star_confirm_distinguishes_signature_collision(spark):
    """Two different edge sets with the IDENTICAL (count, Σu, Σv)
    signature — {(1,4),(2,3)} vs {(1,3),(2,4)} — must fail the exact
    confirm. Pins the exceptAll check that guards the exit; the bare
    signature break (the pre-r16 exit) called these equal, the exact
    bug class that produced duplicate MST edges in r15."""
    a = spark.createDataFrame([(1, 4), (2, 3)], "u long, v long")
    b = spark.createDataFrame([(1, 3), (2, 4)], "u long, v long")
    sig = lambda d: tuple(d.agg(F.count("*"), F.sum("u"), F.sum("v")).first())
    assert sig(a) == sig(b)
    assert not a.exceptAll(b).isEmpty()


def test_star_fixpoint_raises_on_cap_exhaustion(spark, monkeypatch):
    """A path graph cannot converge in one round; with the cap forced
    to 1 the helper must raise, never return a truncated (under-
    merged) contraction."""
    import duckdb_data_eng_proj_spark.queries.corpus as corpus

    monkeypatch.setattr(corpus, "_CC_MAX_ROUNDS", 1)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _star_fixpoint(chain)


def test_star_components_match_union_find(spark):
    """End-to-end: star-fixpoint components equal union-find ground
    truth on random graphs (root = component minimum)."""
    for seed in (7, 8):
        raw = _rand_edges(seed, 60, 90)
        parent = list(range(60))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in raw:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        want = {}
        for u, v in raw:
            for n in (u, v):
                want[n] = find(n)

        fixed = _star_fixpoint(
            spark.createDataFrame(raw, "u long, v long").localCheckpoint()
        )
        got = dict(want)  # roots label themselves; members overwritten
        for n in got:
            got[n] = n
        for r in fixed.collect():
            got[r.v] = r.u
        # vertices that kept their own id must be true component minima
        assert got == want, f"seed {seed}"


# ---------------------------------------------------------------------------
# zero-norm centroid guard (admission / drift / repair family)


@pytest.fixture(scope="module")
def zero_norm_dir(tmp_path_factory):
    """A tiny embeddings fixture whose CENTROID SEED SET contains an
    all-zero vector: vec_id 1 (< _DRIFT_SEED_LIMIT, % 3 != 0) is the
    zero vector, so without the guard every cosine against it is NaN
    and the two engines disagree on the argmax tie-break."""
    d = tmp_path_factory.mktemp("zeronorm")
    rng = random.Random(42)
    rows = []
    # dim 64 — the drift/repair oracles hardcode range(64) in their
    # per-dim mean and displacement folds (the real table's width)
    for vid in range(60):
        if vid == 1:
            emb = [0.0] * 64
        else:
            emb = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        rows.append((vid, emb, vid % 10))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    con.execute(
        f"COPY embeddings TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return str(d)


def _norm_rows(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize(
    "qid", ["sim_ann_ivf_admit", "sim_ann_index_drift", "sim_ann_ivf_repair"]
)
def test_zero_norm_centroid_cross_engine(spark, zero_norm_dir, qid):
    """Spark fn and DuckDB oracle must agree value-exactly on the
    zero-vector fixture — the law the r15 review said a regen with a
    zero embedding would break."""
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, zero_norm_dir)
    got = _norm_rows(
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{zero_norm_dir}/embeddings.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = _norm_rows(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    assert sorted(c for c in sdf.columns) == sorted(cols)
    assert got == want
