"""Bin range-join semantics (operators/interval.py): exact overlap
boundaries, cross-bin dedup, per-key isolation, and the no-cross-join
plan guarantee."""

from __future__ import annotations

import datetime as dt

import pytest

from powa_archivist_spark.operators.interval import interval_join
from powa_archivist_spark.plans import inspect as pi


def T(m):
    return dt.datetime(2026, 1, 1, 12, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, T(0), T(30)),     # spans several 5-min bins
         (1, 11, T(40), T(45)),
         (2, 12, T(0), T(30))],
        "user_id long, iid long, start timestamp, stop timestamp",
    )
    right = spark.createDataFrame(
        [(1, 20, T(30), T(35)),    # touches iid=10 exactly at the bound
         (1, 21, T(36), T(39)),    # gap -> matches nothing
         (1, 22, T(44), T(50)),    # overlaps iid=11
         (2, 23, T(29), T(29))],   # instant inside iid=12
        "user_id long, rid long, start timestamp, stop timestamp",
    )
    return left, right


def test_interval_join_overlap_and_boundaries(spark):
    left, right = _frames(spark)
    out = interval_join(
        left, right, ["user_id"], "start", "stop", "start", "stop",
        bin_width_s=300,
    )
    pairs = {(r.iid, r.rid) for r in out.collect()}
    assert pairs == {(10, 20), (11, 22), (12, 23)}
    # closed-interval touch (10,20) kept exactly once despite the two
    # intervals co-occupying multiple bins
    assert out.count() == 3


def test_interval_join_no_cartesian(spark):
    left, right = _frames(spark)
    out = interval_join(
        left, right, ["user_id"], "start", "stop", "start", "stop",
        bin_width_s=300,
    )
    assert not pi.has_cartesian(out)


def test_interval_join_rejects_outer(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        interval_join(left, right, ["user_id"], how="left")
