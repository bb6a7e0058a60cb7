"""Warehouse schema-version migration (operators/migrate.py) — the
analog of the reference's upgrade scripts (powa--5.1.2--5.2.0.sql
rebuilds record types when counters are added).  A warehouse written at
spec v1 must migrate to v2 (counter added + counter dropped) with packed
history rows NULL-padded/projected in place, reads staying green on
mixed pre/post rows, and the whole job idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from powa_archivist_spark.operators.aggregate import aggregate
from powa_archivist_spark.operators.migrate import (
    conform,
    layout_version,
    migrate_warehouse,
)
from powa_archivist_spark.operators.snapshot import snapshot
from powa_archivist_spark.specs import Counter, DatasourceSpec, Key
from powa_archivist_spark.storage import Warehouse

from .conftest import ts

SPEC_V1 = DatasourceSpec(
    name="mig_demo",
    keys=(Key("dbid", "oid"), Key("funcid", "oid")),
    counters=(
        Counter("calls"),
        Counter("total_time", "double"),
        Counter("legacy_counter"),  # dropped in v2
    ),
    db_rollup=True,
)

SPEC_V2 = DatasourceSpec(
    name="mig_demo",
    keys=(Key("dbid", "oid"), Key("funcid", "oid")),
    counters=(
        Counter("calls"),
        Counter("total_time", "double"),
        Counter("parallel_workers", "bigint"),  # added in v2
    ),
    db_rollup=True,
)


def v1_cap(spark, t, rows):
    data = [(1, t, dbid, funcid, calls, calls * 1.5, 7)
            for dbid, funcid, calls in rows]
    return spark.createDataFrame(data, SPEC_V1.staging_schema)


def v2_cap(spark, t, rows):
    data = [(1, t, dbid, funcid, calls, calls * 1.5, 3)
            for dbid, funcid, calls in rows]
    return spark.createDataFrame(data, SPEC_V2.staging_schema)


@pytest.fixture()
def v1_warehouse(spark, wh):
    """Two v1 snapshots packed into history + one left in current."""
    snapshot(wh, SPEC_V1, 1, capture=v1_cap(spark, ts(0), [(10, 1, 100),
                                                           (10, 2, 40)]))
    snapshot(wh, SPEC_V1, 1, capture=v1_cap(spark, ts(5), [(10, 1, 110),
                                                           (10, 2, 44)]))
    aggregate(wh, SPEC_V1, 1)  # packs current -> history (+db twin)
    snapshot(wh, SPEC_V1, 1, capture=v1_cap(spark, ts(10), [(10, 1, 120)]))
    return wh


def test_migrate_nullpads_and_drops_everywhere(spark, v1_warehouse):
    wh = v1_warehouse
    rewritten = migrate_warehouse(wh, SPEC_V1, SPEC_V2, to_version="2")
    assert layout_version(wh, "mig_demo") == "2"
    # all four layout tables existed and were rewritten
    assert set(rewritten) == {
        Warehouse.current("mig_demo"), Warehouse.history("mig_demo"),
        Warehouse.current_db("mig_demo"), Warehouse.history_db("mig_demo"),
    }

    # SCHEMALESS read: the dropped counter must be physically gone from
    # the rewritten files, not merely hidden by an explicit read schema
    # (r5 code-review regression — stranded columns caused mixed parquet
    # schemas on later appends)
    assert "legacy_counter" not in wh.read(
        Warehouse.current("mig_demo")).columns
    assert "legacy_counter" not in wh.read(
        Warehouse.history("mig_demo")).columns
    cur = wh.read(Warehouse.current("mig_demo"), SPEC_V2.current_schema)
    assert "legacy_counter" not in cur.columns
    row = cur.collect()[0]
    assert row.parallel_workers is None and row.calls == 120

    hist = wh.read(Warehouse.history("mig_demo"), SPEC_V2.history_schema)
    h = hist.filter(F.col("funcid") == 1).collect()[0]
    # packed records NULL-padded, ts order kept, dropped field gone
    assert [r.calls for r in h.records] == [100, 110]
    assert all(r.parallel_workers is None for r in h.records)
    assert "legacy_counter" not in h.records[0].asDict()
    # minmax summary structs conformed too
    assert h.mins_in_range.parallel_workers is None
    assert h.maxs_in_range.calls == 110


def test_mixed_history_reads_after_migration(spark, v1_warehouse):
    """Post-migration, a v2 snapshot + coalesce appends next to migrated
    rows and the unpack read is green across pre/post rows."""
    from powa_archivist_spark.functions.packing import unpack

    wh = v1_warehouse
    migrate_warehouse(wh, SPEC_V1, SPEC_V2, to_version="2")

    snapshot(wh, SPEC_V2, 1, capture=v2_cap(spark, ts(15), [(10, 1, 130)]))
    aggregate(wh, SPEC_V2, 1)

    hist = wh.read(Warehouse.history("mig_demo"), SPEC_V2.history_schema)
    flat = unpack(hist, SPEC_V2).filter(F.col("funcid") == 1)
    rows = sorted(flat.collect(), key=lambda r: r.ts)
    assert [r.calls for r in rows] == [100, 110, 120, 130]
    # pre-migration rows read NULL for the new counter, post reads value
    assert [r.parallel_workers for r in rows] == [None, None, None, 3]
    # db rollup twin also coherent
    db_hist = wh.read(Warehouse.history_db("mig_demo"))
    assert db_hist.count() > 0


def test_migration_is_idempotent(spark, v1_warehouse):
    wh = v1_warehouse
    migrate_warehouse(wh, SPEC_V1, SPEC_V2, to_version="2")
    before = sorted(
        map(repr, wh.read(Warehouse.history("mig_demo")).collect())
    )
    # crash-replay: run the whole migration again (conform is identity)
    migrate_warehouse(wh, SPEC_V2, SPEC_V2, to_version="2")
    after = sorted(
        map(repr, wh.read(Warehouse.history("mig_demo")).collect())
    )
    assert before == after


def test_conform_preserves_null_structs(spark):
    """A NULL mins_in_range must stay NULL, not become a struct of
    NULLs (the reference distinguishes absent minmax rows)."""
    from pyspark.sql import types as T

    src = spark.createDataFrame(
        [(1, None)],
        T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("s", T.StructType(
                [T.StructField("a", T.LongType())])),
        ]),
    )
    target = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("s", T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ])),
    ])
    (row,) = conform(src, target).collect()
    assert row.s is None


def test_dropped_key_degrades_to_multiple_packed_rows(spark, v1_warehouse):
    """Dropping a KEY (beyond the reference's add/drop-attribute
    upgrades) must not break reads: the projected history keeps one
    packed row per old entity — a valid layout, since entities already
    span multiple coalesce windows — and unpack sees every record."""
    from powa_archivist_spark.functions.packing import unpack

    wh = v1_warehouse
    v2_keyless = DatasourceSpec(
        name="mig_demo",
        keys=(Key("dbid", "oid"),),  # funcid dropped
        counters=SPEC_V1.counters,
        db_rollup=True,
    )
    migrate_warehouse(wh, SPEC_V1, v2_keyless, to_version="2-keyless")

    hist = wh.read(Warehouse.history("mig_demo"), v2_keyless.history_schema)
    # two old entities in dbid 10 -> two packed rows for the one new key
    assert hist.filter(F.col("dbid") == 10).count() == 2
    flat = unpack(hist, v2_keyless)
    # every original record still readable: 2 snapshots x 2 funcs + 1
    assert flat.filter(F.col("dbid") == 10).count() == 4
    assert "funcid" not in flat.columns


def test_retyped_counter_casts_in_place(spark, v1_warehouse):
    """A retyped counter (bigint -> double, the reference's
    ALTER ATTRIBUTE TYPE) casts inside records and minmax structs."""
    wh = v1_warehouse
    v2_retyped = DatasourceSpec(
        name="mig_demo",
        keys=SPEC_V1.keys,
        counters=(
            Counter("calls", "double"),  # was bigint
            Counter("total_time", "double"),
            Counter("legacy_counter"),
        ),
        db_rollup=True,
    )
    migrate_warehouse(wh, SPEC_V1, v2_retyped, to_version="2-retype")
    hist = wh.read(Warehouse.history("mig_demo"), v2_retyped.history_schema)
    h = hist.filter(F.col("funcid") == 1).collect()[0]
    assert [r.calls for r in h.records] == [100.0, 110.0]
    assert isinstance(h.records[0].calls, float)
    assert h.maxs_in_range.calls == 110.0


def test_map_conform_key_rules(spark):
    """Map conform must be total AT RUNTIME on real values (r5 review:
    key rewrites can abort the job with NULL_MAP_KEY / DUPLICATED_MAP_KEY):
    identical key types pass keys through and conform values; any key
    type change is drop+add — the old map conforms to NULL."""
    from pyspark.sql import types as T

    src_schema = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("m", T.MapType(T.DoubleType(), T.LongType()), True),
    ])
    df = spark.createDataFrame([(1, {1.1: 10, 1.2: 20})], src_schema)

    # same key type: values retype in place
    same_key = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("m", T.MapType(T.DoubleType(), T.DoubleType()), True),
    ])
    (row,) = conform(df, same_key).collect()
    assert row.m == {1.1: 10.0, 1.2: 20.0}

    # narrowing key retype would collide (1.1 and 1.2 -> 1): NULL map,
    # not a DUPLICATED_MAP_KEY crash
    narrowed = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("m", T.MapType(T.IntegerType(), T.LongType()), True),
    ])
    (row,) = conform(df, narrowed).collect()
    assert row.m is None
