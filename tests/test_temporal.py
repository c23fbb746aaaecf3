"""asof_join semantics (operators/temporal.py) — backward inclusive
match, tie handling, no-match nulls, null-key hygiene, row-atomicity.
"""

from datetime import datetime

from pyspark.sql import functions as F

from surfactant_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    probe = spark.createDataFrame(
        [
            (1, "u1", _ts("2026-01-01T10:00:00")),  # after b@09:00 -> x
            (2, "u1", _ts("2026-01-01T12:00:00")),  # after b@11:00 -> y
            (3, "u1", _ts("2026-01-01T11:00:00")),  # tie: inclusive -> y
            (4, "u2", _ts("2026-01-01T08:00:00")),  # before any u2 build -> null
            (5, "u3", _ts("2026-01-01T10:00:00")),  # key with no builds -> null
        ],
        "pid long, k string, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01T09:00:00"), "x", 1.0),
            ("u1", _ts("2026-01-01T11:00:00"), "y", 2.0),
            ("u2", _ts("2026-01-01T09:00:00"), "z", 3.0),
            (None, _ts("2026-01-01T00:00:00"), "nullkey", 9.0),
        ],
        "k string, ts timestamp, tag string, v double",
    )
    return probe, build


def test_asof_backward_inclusive_and_nulls(spark):
    probe, build = _frames(spark)
    out = {
        r.pid: (r.last_tag, r.last_v, r.last_ts)
        for r in asof_join(probe, build, key="k").collect()
    }
    assert out[1] == ("x", 1.0, _ts("2026-01-01T09:00:00"))
    assert out[2] == ("y", 2.0, _ts("2026-01-01T11:00:00"))
    # equal timestamps match (build sorts before probe at a tie)
    assert out[3] == ("y", 2.0, _ts("2026-01-01T11:00:00"))
    # probe before any build, and key absent from build: all-null match
    assert out[4] == (None, None, None)
    assert out[5] == (None, None, None)
    assert len(out) == 5  # every probe row survives (left semantics)


def test_asof_match_is_row_atomic(spark):
    """A null VALUE inside the matched build row must not fall back to
    an earlier build row's value for that column (the struct carries
    the whole row, per-column last(ignorenulls) would mix rows)."""
    probe = spark.createDataFrame(
        [(1, "u", _ts("2026-01-01T12:00:00"))], "pid long, k string, ts timestamp"
    )
    build = spark.createDataFrame(
        [
            ("u", _ts("2026-01-01T09:00:00"), "old", 1.0),
            ("u", _ts("2026-01-01T11:00:00"), None, None),
        ],
        "k string, ts timestamp, tag string, v double",
    )
    r = asof_join(probe, build, key="k").collect()[0]
    assert r.last_ts == _ts("2026-01-01T11:00:00")
    assert r.last_tag is None and r.last_v is None


def test_asof_value_cols_subset_and_prefix(spark):
    probe, build = _frames(spark)
    out = asof_join(
        probe, build, key="k", value_cols=["tag"], prefix="prev_"
    )
    assert set(out.columns) == {"pid", "k", "ts", "prev_ts", "prev_tag"}


def test_asof_plan_single_key_shuffle_no_bnlj(spark):
    """The scale claim: the plan is a window over ONE key-hash
    exchange — no BroadcastNestedLoopJoin / CartesianProduct (what a
    theta-join formulation would lower to)."""
    probe, build = _frames(spark)
    plan = asof_join(probe, build, key="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# funnel_stages
# ---------------------------------------------------------------------------
def test_funnel_order_matters_and_earliest_completion(spark):
    import pytest as _pytest

    from surfactant_spark.operators.temporal import funnel_stages

    rows = [
        # A: full funnel, with an early click BEFORE the view that must
        # be ignored, and two valid clicks where the earliest wins
        ("A", "click", "2026-01-01T08:00:00"),
        ("A", "view", "2026-01-01T09:00:00"),
        ("A", "click", "2026-01-01T10:00:00"),
        ("A", "click", "2026-01-01T11:00:00"),
        ("A", "purchase", "2026-01-01T12:00:00"),
        # B: purchase happens before the click -> funnel stops at 2
        ("B", "view", "2026-01-01T09:00:00"),
        ("B", "purchase", "2026-01-01T09:30:00"),
        ("B", "click", "2026-01-01T10:00:00"),
        # C: view only
        ("C", "view", "2026-01-01T09:00:00"),
        # D: never views -> no row at all
        ("D", "click", "2026-01-01T09:00:00"),
        ("D", "purchase", "2026-01-01T10:00:00"),
        # E: same-timestamp chain is inclusive
        ("E", "view", "2026-01-01T09:00:00"),
        ("E", "click", "2026-01-01T09:00:00"),
        ("E", "purchase", "2026-01-01T09:00:00"),
    ]
    ev = spark.createDataFrame(
        [(u, t, _ts(s)) for u, t, s in rows],
        "user_id string, event_type string, ts timestamp",
    )
    got = {
        r.user_id: (r.stage, r.t1, r.t2, r.t3)
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {"A", "B", "C", "E"}
    assert got["A"] == (
        3,
        _ts("2026-01-01T09:00:00"),
        _ts("2026-01-01T10:00:00"),
        _ts("2026-01-01T12:00:00"),
    )
    assert got["B"][0] == 2 and got["B"][3] is None
    assert got["C"][0] == 1 and got["C"][2] is None and got["C"][3] is None
    assert got["E"][0] == 3 and got["E"][1] == got["E"][3]
    with _pytest.raises(ValueError):
        funnel_stages(ev, [])


# ---------------------------------------------------------------------------
# property: asof_join == pandas merge_asof (an INDEPENDENT third
# implementation, alongside the DuckDB native ASOF oracle in
# test_entry) on arbitrary integer timelines
# ---------------------------------------------------------------------------
import pandas as pd
from hypothesis import given, settings, strategies as st

_key = st.integers(min_value=0, max_value=3)
_t = st.integers(min_value=0, max_value=40)
_probe_rows = st.lists(st.tuples(_key, _t), min_size=1, max_size=25)
_build_rows = st.lists(
    st.tuples(_key, _t, st.integers(min_value=-99, max_value=99)),
    min_size=0,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(_probe_rows, _build_rows)
def test_asof_matches_pandas_merge_asof(spark, probes, builds):
    # unique (k, ts) on the build side (documented contract)
    builds = list({(k, t): (k, t, v) for k, t, v in builds}.values())
    probe = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(probes)],
        "pid long, k long, ts long",
    )
    build = spark.createDataFrame(builds or [(99, -1, 0)], "k long, ts long, v long")
    if not builds:
        build = build.where(F.lit(False))
    got = {
        r.pid: (r.last_ts, r.last_v)
        for r in asof_join(probe, build, key="k").collect()
    }
    left = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(probes)],
        columns=["pid", "k", "ts"],
    ).sort_values("ts", kind="stable")
    right = pd.DataFrame(builds, columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    want_df = pd.merge_asof(
        left, right, on="ts", by="k", allow_exact_matches=True,
        suffixes=("", "_b"), direction="backward",
    ) if len(right) else left.assign(v=None)
    for row in want_df.itertuples():
        v = None if pd.isna(getattr(row, "v")) else int(getattr(row, "v"))
        gt, gv = got[row.pid]
        assert gv == v, (row.pid, gv, v)
        if v is not None:
            # matched build ts must be the greatest <= probe ts
            assert gt <= row.ts


# ---------------------------------------------------------------------------
# property: funnel_stages vs a pure-python per-user scan
# ---------------------------------------------------------------------------
_STEPS = ["a", "b", "c"]
_ev = st.tuples(
    st.integers(min_value=0, max_value=3),           # user
    st.sampled_from(_STEPS + ["x"]),                 # type (x = noise)
    st.integers(min_value=0, max_value=30),          # ts
)


def _py_funnel(events, steps):
    by_user = {}
    for u, typ, t in events:
        by_user.setdefault(u, []).append((typ, t))
    out = {}
    for u, evs in by_user.items():
        first = [t for typ, t in evs if typ == steps[0]]
        if not first:
            continue
        stamps = [min(first)]
        for s in steps[1:]:
            cand = [t for typ, t in evs if typ == s and t >= stamps[-1]]
            if not cand:
                break
            stamps.append(min(cand))
        out[u] = stamps
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(_ev, min_size=1, max_size=30))
def test_funnel_matches_python_scan(spark, events):
    from surfactant_spark.operators.temporal import funnel_stages

    ev = spark.createDataFrame(events, "user_id long, event_type string, ts long")
    got = {
        r.user_id: [t for t in (r.t1, r.t2, r.t3) if t is not None]
        for r in funnel_stages(ev, _STEPS).collect()
    }
    assert got == _py_funnel(events, _STEPS)


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------
def _day_ts(day, sec=0):
    from datetime import datetime, timedelta

    return datetime(2024, 1, 1) + timedelta(days=day, seconds=sec)


DAY0 = 1704067200  # 2024-01-01 UTC, a multiple of 86400


def test_cohort_retention_hand_computed(spark):
    """u1/u2 cohort on day 0 (u1 twice that day — distinct-bucket dedup),
    u1 returns day 2, u3 cohorts on day 1 and returns day 2."""
    from surfactant_spark.operators.temporal import cohort_retention

    events = spark.createDataFrame(
        [
            (1, _day_ts(0, 10)),
            (1, _day_ts(0, 20)),
            (2, _day_ts(0, 30)),
            (1, _day_ts(2, 5)),
            (3, _day_ts(1, 0)),
            (3, _day_ts(2, 0)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r.cohort_epoch, r.offset_buckets): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(events).collect()
    }
    d = 86400
    assert got == {
        (DAY0, 0): (2, 2, 1.0),
        (DAY0 + 0 * d, 2): (1, 2, 0.5),
        (DAY0 + d, 0): (1, 1, 1.0),
        (DAY0 + d, 1): (1, 1, 1.0),
    }


def _py_cohort(rows, bucket_s):
    from collections import Counter

    from tests.test_training_ops import _round6_half_up

    act = {(u, e - e % bucket_s) for u, e in rows}
    coh = {}
    for u, b in act:
        coh[u] = min(coh.get(u, b), b)
    sizes = Counter(coh.values())
    cells = Counter(
        (coh[u], (b - coh[u]) // bucket_s) for (u, b) in act
    )
    return {
        (c, off): (n, sizes[c], _round6_half_up(n / sizes[c]))
        for (c, off), n in cells.items()
    }


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=60),
)
def test_cohort_retention_matches_python(spark, rows, bucket_s):
    from datetime import datetime, timedelta

    from surfactant_spark.operators.temporal import cohort_retention

    base = datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(u, base + timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp",
    )
    got = {
        (r.cohort_epoch, r.offset_buckets): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(events, bucket_s=bucket_s).collect()
    }
    assert got == _py_cohort([(u, DAY0 + s) for u, s in rows], bucket_s)
