"""Landing-zone schema-drift contract: the loader ``t()`` must yield the
same rows and the same dtype no matter which timestamp encoding the
upstream writer used.  The reference absorbs exactly this class of drift
with per-version src shims (powa--5.2.0.sql:3798-4004); a silent testdata
regeneration must fail THIS test loudly, not 7 oracle entries.

Also pins the NTZ-tolerance of the two operators that take caller frames
and therefore bypass ``t()`` entirely: ``interval_join`` and
``sessionize_batch``.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from powa_archivist_spark.operators.interval import interval_join
from powa_archivist_spark.queries import t
from powa_archivist_spark.streaming.sessionize import sessionize_batch

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 5), 10, "click", 1.5),
    (2, dt.datetime(2024, 1, 1, 0, 30, 0), 10, "view", 2.0),
    (3, dt.datetime(2024, 1, 1, 2, 0, 0), 11, "click", 0.25),
]

ENCODINGS = {
    # legacy writer: TIMESTAMP(NANOS), which Spark's reader rejects and
    # t() reads as long via spark.sql.legacy.parquet.nanosAsLong
    "nanos": pa.timestamp("ns"),
    # current writer: naive micros -> Spark TIMESTAMP_NTZ
    "ntz_micros": pa.timestamp("us"),
    # instant-typed micros -> Spark TIMESTAMP_LTZ
    "ltz_micros": pa.timestamp("us", tz="UTC"),
}


def _write_events(path: str, ts_type: pa.DataType) -> str:
    cols = list(zip(*ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")
    return path


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_loader_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = _write_events(str(tmp_path), ENCODINGS[enc])
    df = t(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{enc}: t() must yield TIMESTAMP_LTZ, got {dict(df.dtypes)['ts']}"
    )
    got = sorted(
        (r.event_id, r.ts, r.user_id) for r in df.collect()
    )
    assert got == [(eid, ts, uid) for eid, ts, uid, _, _ in ROWS]


def test_loader_encodings_agree_pairwise(spark, tmp_path):
    """All three encodings of the same rows collect identically."""
    frames = {}
    for enc, typ in ENCODINGS.items():
        d = tmp_path / enc
        d.mkdir()
        _write_events(str(d), typ)
        frames[enc] = sorted(
            map(tuple, t(spark, str(d), "events").collect())
        )
    assert frames["nanos"] == frames["ntz_micros"] == frames["ltz_micros"]


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_interval_join_accepts_both_timestamp_types(spark, ts_type):
    T = dt.datetime
    left = spark.createDataFrame(
        [(10, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 0, 30))],
        f"user_id long, start {ts_type}, stop {ts_type}",
    )
    right = spark.createDataFrame(
        [(10, T(2024, 1, 1, 0, 29), T(2024, 1, 1, 0, 45)),
         (10, T(2024, 1, 1, 0, 31), T(2024, 1, 1, 0, 45))],
        f"user_id long, start {ts_type}, stop {ts_type}",
    )
    out = interval_join(
        left, right, ["user_id"], "start", "stop", "start", "stop",
        bin_width_s=300,
    )
    assert out.count() == 1  # only the overlapping pair


def test_interval_join_numeric_bounds_pass_through(spark):
    """Numeric-seconds interval bounds must NOT route through a
    timestamp cast (it truncates to micros and saturates past the
    timestamp range) — large epoch-like numerics still bin exactly."""
    big = 9.3e12  # past the LTZ-representable seconds range
    left = spark.createDataFrame(
        [(10, big, big + 600.0)], "user_id long, start double, stop double"
    )
    right = spark.createDataFrame(
        [(10, big + 500.0, big + 900.0),      # overlaps
         (10, big + 4000.0, big + 5000.0)],   # disjoint
        "user_id long, start double, stop double",
    )
    out = interval_join(
        left, right, ["user_id"], "start", "stop", "start", "stop",
        bin_width_s=300,
    )
    assert out.count() == 1


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_sessionize_batch_accepts_both_timestamp_types(spark, ts_type):
    T = dt.datetime
    ev = spark.createDataFrame(
        [(10, T(2024, 1, 1, 0, 0), 1),
         (10, T(2024, 1, 1, 0, 10), 2),     # same session (gap 600s)
         (10, T(2024, 1, 1, 2, 0), 3)],     # new session (gap > 1800s)
        f"user_id long, ts {ts_type}, event_id long",
    )
    out = sessionize_batch(ev, gap_s=1800)
    assert out.count() == 2
    assert sorted(r.n_events for r in out.collect()) == [1, 2]
