"""As-of join semantics (operators/asof.py): boundary inclusion,
strictness, per-key isolation, tie-breaking, and the left-outer NULL."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from powa_archivist_spark.operators.asof import asof_join


def T(m):
    return dt.datetime(2026, 1, 1, 12, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, T(10), "p1"), (1, T(20), "p2"), (2, T(10), "p3"),
         (3, T(5), "p4")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, T(10), 100), (1, T(15), 101), (2, T(9), 200), (2, T(9), 201)],
        "user_id long, ts timestamp, rid long",
    )
    return left, right


def test_asof_backward_match_and_null(spark):
    left, right = _frames(spark)
    out = {r.tag: r for r in
           asof_join(left, right, ["user_id"], "ts",
                     right_seq_col="rid").collect()}
    assert out["p1"].asof_rid == 100          # same-ts row matches (<=)
    assert out["p2"].asof_rid == 101          # latest prior, not first
    assert out["p2"].asof_ts == T(15)
    assert out["p3"].asof_rid == 201          # (key, ts) tie -> max seq
    assert out["p4"].asof_rid is None         # no prior row -> NULL
    assert out["p4"].asof_ts is None


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {r.tag: r for r in
           asof_join(left, right, ["user_id"], "ts",
                     right_seq_col="rid", strict=True).collect()}
    assert out["p1"].asof_rid is None         # same-ts row hidden (<)
    assert out["p2"].asof_rid == 101


def test_asof_single_shuffle(spark):
    """The union-window shape: exactly one Exchange (keyed), regardless
    of row multiplicity — the property that makes it scale."""
    from powa_archivist_spark.plans import inspect as pi

    left, right = _frames(spark)
    df = asof_join(left, right, ["user_id"], "ts", right_seq_col="rid")
    assert pi.exchange_count(df) == 1
