"""Algorithmic laws for the late-round-10 operators.

Same adversarial posture as tests/test_r10_laws.py: the oracle rows
prove cross-engine equality; these tests prove the shared definition
is the RIGHT one, via independent pure-Python replays on sf0.001.

- ts_seasonal_profile: full replay from raw events (Counter by
  (type, date), Python date.weekday() for the dow mapping), plus the
  mass-conservation law (Σ ev_dow over dows = the type's event count)
  and the weighted-index law (the n_days-weighted mean of the EXACT
  pre-rounding index is exactly 1000 per mille by construction).
- ext_compact_plan: full replay of the cumulative-byte-boundary
  binning (grp = exclusive-cumsum DIV target; NOT next-fit — no
  capacity reset at group close) over an
  independently rebuilt file inventory, plus the structural laws —
  group ids are non-decreasing in file_id within a source, and
  grp_files/grp_bytes equal the member sums.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

from duckdb_data_eng_proj_spark.queries import REGISTRY
from duckdb_data_eng_proj_spark.queries.extras_r10b import _COMPACT_TARGET
from tests.conftest import SF_DIR


def test_seasonal_profile_replays_raw_events(spark):
    from duckdb_data_eng_proj_spark.queries.registry import t

    events = t(spark, SF_DIR, "events").select("event_type", "ts").collect()
    daily = Counter((r.event_type, r.ts.date()) for r in events)
    by_type_dow = defaultdict(lambda: [0, 0])  # (type, dow) -> [n_days, ev]
    for (etype, d), cnt in daily.items():
        dow = (d.weekday() + 1) % 7  # Python Mon=0 -> ours Sun=0
        cell = by_type_dow[(etype, dow)]
        cell[0] += 1
        cell[1] += cnt

    rows = REGISTRY["ts_seasonal_profile"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(by_type_dow)
    totals = defaultdict(lambda: [0, 0])  # type -> [n_days_all, ev_all]
    for (etype, _), (nd, ev) in by_type_dow.items():
        totals[etype][0] += nd
        totals[etype][1] += ev
    for r in rows:
        nd, ev = by_type_dow[(r.event_type, r.dow)]
        assert (r.n_days, r.ev_dow) == (nd, ev)
        assert r.avg_daily_md == ev * 1000 // nd
        nd_all, ev_all = totals[r.event_type]
        exact = Fraction(ev * nd_all * 1000, nd * ev_all)
        assert abs(r.idx_pml - exact) <= Fraction(1, 2) + Fraction(1, 10**6)


def test_seasonal_profile_mass_and_weighted_index(spark):
    rows = REGISTRY["ts_seasonal_profile"].fn(spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for etype, rs in by_type.items():
        nd_all = sum(r.n_days for r in rs)
        ev_all = sum(r.ev_dow for r in rs)
        # the n_days-weighted mean of the EXACT index is 1000 per mille:
        # Σ n_days·(ev·nd_all·1000)/(n_days·ev_all) = 1000·nd_all
        weighted = sum(
            Fraction(r.ev_dow * nd_all * 1000, ev_all) for r in rs
        )
        assert weighted == 1000 * nd_all
        assert 1 <= len(rs) <= 7 and len({r.dow for r in rs}) == len(rs)
        assert all(0 <= r.dow <= 6 for r in rs)
        assert ev_all == sum(r.ev_dow for r in rs)


def test_compact_plan_replays_boundary_binning(spark):
    from duckdb_data_eng_proj_spark.queries.registry import t

    docs = t(spark, SF_DIR, "documents").select("source", "doc_id", "n_chars").collect()
    inv = defaultdict(int)
    for r in docs:
        inv[(r.source, r.doc_id // 50)] += r.n_chars
    files = defaultdict(list)  # source -> [(file_id, bytes)]
    for (src, fid), nch in inv.items():
        files[src].append((fid, 512 + nch))

    expected = {}
    for src, fl in files.items():
        cum = 0
        for fid, b in sorted(fl):
            expected[(src, fid)] = (b, cum // _COMPACT_TARGET)
            cum += b

    rows = REGISTRY["ext_compact_plan"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    group_members = defaultdict(list)
    for r in rows:
        b, grp = expected[(r.source, r.file_id)]
        assert (r.file_bytes, r.grp) == (b, grp)
        group_members[(r.source, r.grp)].append(r)
    for (_, _), members in group_members.items():
        assert all(m.grp_files == len(members) for m in members)
        total = sum(m.file_bytes for m in members)
        assert all(m.grp_bytes == total for m in members)


def test_compact_plan_groups_contiguous(spark):
    rows = REGISTRY["ext_compact_plan"].fn(spark, SF_DIR).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.file_id)
        grps = [r.grp for r in rs]
        assert grps == sorted(grps)  # non-decreasing in file order
        assert grps[0] == 0
        # a group id is only ever skipped when the preceding file was
        # itself bigger than the target (its inclusion spans boundaries)
        for i in range(1, len(rs)):
            step = grps[i] - grps[i - 1]
            assert step in (0, 1) or rs[i - 1].file_bytes > _COMPACT_TARGET
