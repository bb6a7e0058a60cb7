"""Semantics tests for the event-analytics query family (funnel, cohort
retention, sliding frames) on hand-built fixtures — the oracle gate
checks them against DuckDB on the driver's tables; these pin the edge
cases small real data may not cover (out-of-order stages, frame
boundaries)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from powa_archivist_spark.queries import (
    events_cohort_retention,
    events_funnel,
    events_window_frames,
)


def _mk_events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    d = tempfile.mkdtemp(prefix="ana_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.parquet(d + "/events.parquet")
    return d


def _t(day: int, hour: int = 0, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture()
def tmp_sf():
    dirs = []

    def make(spark, rows):
        d = _mk_events(spark, rows)
        dirs.append(d)
        return d

    yield make
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_funnel_requires_stage_order(spark, tmp_sf):
    """click-before-view and purchase-before-click must NOT convert:
    the funnel is strictly ordered on each user's FIRST qualifying
    timestamp per stage."""
    rows = [
        # u1: clean view -> click -> purchase
        (1, _t(1), 1, "view", 1.0),
        (2, _t(2), 1, "click", 1.0),
        (3, _t(3), 1, "purchase", 1.0),
        # u2: click BEFORE its only view -> stops at view
        (4, _t(1), 2, "click", 1.0),
        (5, _t(2), 2, "view", 1.0),
        (6, _t(3), 2, "purchase", 1.0),
        # u3: view then purchase, no click -> stops at view
        (7, _t(1), 3, "view", 1.0),
        (8, _t(2), 3, "purchase", 1.0),
        # u4: never views
        (9, _t(1), 4, "signup", 1.0),
    ]
    d = tmp_sf(spark, rows)
    out = events_funnel(spark, d).collect()[0]
    assert (out.n_users, out.n_view, out.n_view_click,
            out.n_view_click_purchase) == (4, 3, 1, 1)


def test_cohort_retention_week_offsets(spark, tmp_sf):
    """cohort_week is the Monday of each user's first event; later
    activity lands in floor(days/7) offsets relative to that Monday."""
    rows = [
        (1, _t(1), 1, "view", 1.0),    # 2024-01-01 is a Monday
        (2, _t(2), 1, "view", 1.0),    # same week -> offset 0
        (3, _t(16), 1, "view", 1.0),   # +15 days -> offset 2
        (4, _t(3), 2, "view", 1.0),    # first event Wed -> same Monday cohort
        (5, _t(9), 2, "view", 1.0),    # next week -> offset 1
    ]
    d = tmp_sf(spark, rows)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in events_cohort_retention(spark, d).collect()
    }
    monday = dt.datetime(2024, 1, 1)
    assert got == {
        (monday, 0): 2,
        (monday, 1): 1,
        (monday, 2): 1,
    }


def test_window_frames_rows_vs_range(spark, tmp_sf):
    """The ROWS frame counts physical rows; the RANGE frame collects
    everything in the trailing hour including same-instant peers."""
    rows = [
        (1, _t(1, 9, 0), 1, "view", 1.0),     # 100 cents
        (2, _t(1, 9, 30), 1, "view", 2.0),    # 200
        (3, _t(1, 10, 15), 1, "view", 4.0),   # 400: 9:00 is outside its hour
        (4, _t(1, 10, 15), 1, "view", 8.0),   # 800: same instant as event 3
    ]
    d = tmp_sf(spark, rows)
    got = {r.event_id: r for r in events_window_frames(spark, d).collect()}
    assert got[2].roll7_cents == 300 and got[2].hour_cents == 300
    # rows frame is cumulative over the unique order; range frame drops
    # 9:00 (>1h before 10:15) but includes the same-instant peer
    assert got[3].roll7_cents == 700
    assert got[3].hour_cents == 1400
    assert got[4].roll7_cents == 1500
    assert got[4].hour_cents == 1400


def test_grouped_quantiles_nearest_rank(spark):
    """Nearest-rank semantics: rank = ceil(p*n/100); single-row groups
    return that row for every percentile; duplicate values stay
    deterministic through the tiebreak column."""
    from powa_archivist_spark.operators.quantiles import grouped_quantiles

    rows = [("a", i, v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    rows += [("b", 0, 7)]
    rows += [("c", i, 5) for i in range(4)]  # all-equal values
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r.g: r for r in
           grouped_quantiles(df, ["g"], "v", "id", (50, 90, 99)).collect()}
    # n=10: p50 -> rank 5 (=50), p90 -> rank 9 (=90), p99 -> rank 10 (=100)
    assert (out["a"].p50, out["a"].p90, out["a"].p99) == (50, 90, 100)
    assert (out["b"].n, out["b"].p50, out["b"].p99) == (1, 7, 7)
    assert (out["c"].p50, out["c"].p90, out["c"].p99) == (5, 5, 5)


def test_salted_join_equals_plain_join(spark):
    """Salting must never change the result set, only the routing —
    including duplicate keys on BOTH sides and keys missing from the
    dim (inner-join drops them)."""
    from powa_archivist_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30), (9, 99)], "k long, v long"
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b2"), (3, "c")], "k long, d string"
    )
    got = sorted(
        map(tuple, salted_join(big, dim, ["k"], salt=4).collect())
    )
    want = sorted(map(tuple, big.join(dim, ["k"]).collect()))
    assert got == want
