"""Versioned source resolution, schema shims, statements filters, and
catalog mirroring (reference golden tests 03_db_module.sql /
04_catalog.sql semantics).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from powa_archivist_spark.sources import catalog as cat
from powa_archivist_spark.sources.readers import (
    VersionedSource,
    resolve_versioned,
    shim_to_schema,
    statements_filters,
)
from powa_archivist_spark.specs import PG_STAT_BGWRITER

from .conftest import ts


def test_resolve_versioned_picks_newest_not_newer():
    src = (
        VersionedSource("pg_stat_all_tables")
        .add(0, "v-ancient")
        .add(120000, "v-12")
        .add(130000, "v-13")
    )
    # 03_db_module.sql: powa_db_functions(1, 130001) vs (1, 120012)
    assert resolve_versioned(src, 130001) == "v-13"
    assert resolve_versioned(src, 120012) == "v-12"
    assert resolve_versioned(src, 110005) == "v-ancient"
    with pytest.raises(KeyError):
        resolve_versioned(VersionedSource("x").add(150000, "v15"), 140000)


def test_shim_to_schema_pads_and_casts(spark):
    # old-version source missing two counters, carrying an extra column
    df = spark.createDataFrame(
        [(1, ts(0), 10, 5)],
        "srvid int, ts timestamp, buffers_clean int, maxwritten_clean long",
    ).withColumn("junk", F.lit("x"))
    out = shim_to_schema(df, PG_STAT_BGWRITER.staging_schema)
    # names+types must match exactly (nullability is parquet-lossy anyway)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in PG_STAT_BGWRITER.staging_schema.fields
    ]
    row = out.collect()[0]
    assert row.buffers_clean == 10          # cast int -> long
    assert row.buffers_backend == 0         # numeric shim default
    assert "junk" not in out.columns


def test_statements_filters(spark):
    df = spark.createDataFrame(
        [
            (1, "SELECT 1", "alice"),
            (2, "  deallocate foo", "alice"),
            (3, "PREPARE TRANSACTION 't'", "bob"),
            (4, "UPDATE t SET x=1", "ignored_bot"),
            (5, "commit prepared 'x'", "carol"),
        ],
        "id long, query string, username string",
    )
    out = statements_filters(df, ignored_users=["ignored_bot"])
    assert {r.id for r in out.collect()} == {1}  # only the real statement


def test_read_staging_versioned_full_path(spark, wh):
    """staging parquet -> versioned column-map resolution -> schema shim
    -> srvid filter, end to end."""
    from powa_archivist_spark.sources.readers import read_staging
    from powa_archivist_spark.storage import Warehouse

    # stage rows under OLD column names (renamed across source versions)
    staged = spark.createDataFrame(
        [(1, ts(0), 10, 5), (2, ts(0), 20, 6)],
        "srvid int, ts timestamp, buf_clean long, maxwritten long",
    )
    wh.append(staged, Warehouse.src_tmp(PG_STAT_BGWRITER.name),
              partition_by=["srvid"])

    src = (
        VersionedSource("pg_stat_bgwriter")
        # v17+: native names; v<17 staged under legacy names
        .add(170000, None)
        .add(0, {
            "srvid": "srvid", "ts": "ts",
            "buffers_clean": "buf_clean",
            "maxwritten_clean": "maxwritten",
        })
    )
    out = read_staging(wh, PG_STAT_BGWRITER, srvid=1,
                       server_version=160002, source=src)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.buffers_clean == 10 and r.maxwritten_clean == 5
    assert r.buffers_alloc == 0  # shimmed counter default


CAT_SCHEMA = "srvid int, dbid long, oid long, relname string"


def test_catalog_snapshot_replace_and_refresh_gating(spark, wh):
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    staged = spark.createDataFrame(
        [(1, 10, 100, "t_a"), (1, 10, 101, "t_b"), (1, 20, 200, "t_c")],
        CAT_SCHEMA,
    )
    n = cat.catalog_snapshot(wh, 1, "pg_class", staged, now=t0)
    assert n == 3
    assert wh.read(cat.catalog_table("pg_class")).count() == 3
    assert cat.last_refresh(wh, 1, 10) == t0
    assert cat.last_refresh(wh, 1, 20) == t0

    # partial re-snapshot of dbid 10 ONLY replaces dbid 10's slice (D4)
    staged2 = spark.createDataFrame([(1, 10, 100, "t_a_renamed")], CAT_SCHEMA)
    cat.catalog_snapshot(wh, 1, "pg_class", staged2, now=t0 + dt.timedelta(days=2))
    rows = {
        (r.dbid, r.oid): r.relname
        for r in wh.read(cat.catalog_table("pg_class")).collect()
    }
    assert rows == {(10, 100): "t_a_renamed", (20, 200): "t_c"}
    assert cat.last_refresh(wh, 1, 10) == t0 + dt.timedelta(days=2)
    assert cat.last_refresh(wh, 1, 20) == t0  # untouched

    # refresh-interval exclusion (04_catalog.sql): recently refreshed dbs
    # are skipped; stale ones selected
    need = cat.dbs_needing_refresh(
        wh, 1, [10, 20, 30], now=t0 + dt.timedelta(days=3),
        refresh_interval=dt.timedelta(days=2),
    )
    assert need == [20, 30]  # 10 refreshed 1 day ago; 30 never seen

    # reset drops the server's mirror + stamps
    cat.catalog_reset(wh, 1)
    assert cat.last_refresh(wh, 1, 10) is None


def test_catalog_priority_order(spark, wh):
    """pg_class runs last so last_refresh is stamped only after the other
    catalogs landed (powa--5.2.0.sql:445-448)."""
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    order = [c for c, _ in sorted(cat.CATALOGS, key=lambda c: c[1])]
    assert order[-1] == "pg_class"
    staged = {
        "pg_namespace": spark.createDataFrame([(1, 10, 1, "ns")], CAT_SCHEMA),
        "pg_class": spark.createDataFrame([(1, 10, 100, "t")], CAT_SCHEMA),
    }
    counts = cat.catalog_snapshot_all(wh, 1, staged, now=t0)
    assert counts == {"pg_namespace": 1, "pg_class": 1}
    assert cat.last_refresh(wh, 1, 10) == t0
