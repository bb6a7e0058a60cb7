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


def test_module_layouts_cover_all_16_modules():
    """Every generic module has registered version-layout data
    (powa--5.2.0.sql:4315-5547), and every layout only references
    staging-schema columns."""
    from powa_archivist_spark.sources.versions import MODULE_SOURCES
    from powa_archivist_spark.specs import MODULE_SPECS

    assert set(MODULE_SOURCES) == set(MODULE_SPECS)
    for name, src in MODULE_SOURCES.items():
        spec = MODULE_SPECS[name]
        staging = {f.name for f in spec.staging_schema.fields}
        assert src.variants, name
        for v in src.variants:
            lay = v.payload
            assert set(lay.columns) <= staging, (name, set(lay.columns) - staging)
            assert set(lay.renames) <= staging, name
            assert set(lay.defaults) <= staging, name


# the 03_db_module.sql golden pair generalized: (module, version) ->
# columns that must be NATIVE (read off the monitored catalog, possibly
# renamed), provided as LITERAL defaults (the reference's explicit
# 0/false/'apply' paddings), or NULL-shimmed (column truly absent)
VERSION_PICK_GOLDENS = [
    # powa_db_functions(1, 130001) vs (1, 120012) analog pairs
    ("pg_stat_database", 130001, ["checksum_failures"], [], ["session_time"]),
    ("pg_stat_database", 120012, ["checksum_failures"], [], ["session_time"]),
    # pre-pg12: checksum_failures is the literal 0 of powa--5.2.0.sql:4773
    ("pg_stat_database", 110000, [], ["checksum_failures"],
     ["checksum_last_failure", "session_time"]),
    ("pg_stat_database", 140000, ["checksum_failures", "session_time"], [], []),
    ("pg_stat_activity", 130001, ["leader_pid"], [], ["query_id"]),
    ("pg_stat_activity", 120012, [], [], ["leader_pid", "query_id"]),
    ("pg_stat_activity", 140000, ["leader_pid", "query_id"], [], []),
    # two_phase/conflicting are literal false until native
    # (powa--5.2.0.sql:4392,4404)
    ("pg_replication_slots", 120000, ["temporary"],
     ["two_phase", "conflicting"], ["wal_status", "safe_wal_size"]),
    ("pg_replication_slots", 130001, ["wal_status", "safe_wal_size"],
     ["two_phase", "conflicting"], []),
    ("pg_replication_slots", 90500, ["active_pid"], ["temporary"],
     ["confirmed_flush_lsn", "wal_status"]),
    ("pg_replication_slots", 160000, ["two_phase", "conflicting"], [], []),
    ("pg_stat_io", 170000, ["op_bytes"],
     ["read_bytes", "write_bytes", "extend_bytes"], []),
    ("pg_stat_io", 180000, ["read_bytes", "write_bytes"], ["op_bytes"], []),
    ("pg_stat_wal", 170000, ["wal_write", "wal_sync"], [], []),
    ("pg_stat_wal", 180000, ["wal_records"], ["wal_write", "wal_sync"], []),
    ("pg_stat_database_conflicts", 150000, ["confl_deadlock"],
     ["confl_active_logicalslot"], []),
    ("pg_stat_database_conflicts", 160000,
     ["confl_active_logicalslot"], [], []),
    # worker_type: native on pg17+, the literal 'apply' before
    # (powa--5.2.0.sql:5216)
    ("pg_stat_subscription", 150000, [], ["worker_type"], ["leader_pid"]),
    ("pg_stat_subscription", 160000, ["leader_pid"], ["worker_type"], []),
    ("pg_stat_subscription", 170000, ["leader_pid", "worker_type"], [], []),
    # checkpointer pre-17 is a pure rename map off pg_stat_bgwriter
    ("pg_stat_checkpointer", 160000, ["num_timed", "buffers_written"], [], []),
    ("pg_stat_subscription_stats", 170000, ["sync_table_error_count"],
     ["sync_seq_error_count", "confl_insert_exists"], []),
    ("pg_stat_subscription_stats", 190000,
     ["sync_seq_error_count", "confl_update_deleted"], [], []),
    ("pg_stat_wal_receiver", 120000, ["flushed_lsn", "sender_host"], [],
     ["written_lsn"]),
    ("pg_stat_wal_receiver", 130001, ["written_lsn", "flushed_lsn"], [], []),
]


@pytest.mark.parametrize("name,version,native,defaulted,nulled",
                         VERSION_PICK_GOLDENS)
def test_module_version_pick_golden(name, version, native, defaulted, nulled):
    """Version resolution picks the newest layout not newer than the
    server (03_db_module.sql:55-60 semantics, applied to every module)."""
    from powa_archivist_spark.sources.versions import MODULE_SOURCES

    lay = resolve_versioned(MODULE_SOURCES[name], version)
    native_cols = set(lay.columns) | set(lay.renames)
    for col in native:
        assert col in native_cols, (name, version, col)
    for col in defaulted:
        assert col in lay.defaults, (name, version, col)
    for col in nulled:
        assert col not in native_cols and col not in lay.defaults, \
            (name, version, col)


def test_too_old_server_yields_empty_capture(spark, wh):
    """A server older than every layout epoch gets an EMPTY capture, not
    an error — pg_stat_io on pg15- (powa--5.2.0.sql:4897-4918)."""
    from powa_archivist_spark.sources.readers import read_staging
    from powa_archivist_spark.sources.versions import MODULE_SOURCES
    from powa_archivist_spark.specs import MODULE_SPECS
    from powa_archivist_spark.storage import Warehouse

    spec = MODULE_SPECS["pg_stat_io"]
    staged = spark.createDataFrame(
        [(1, ts(0), "client backend", "relation", "normal")],
        "srvid int, ts timestamp, backend_type string, object string, "
        "context string",
    )
    wh.append(staged, Warehouse.src_tmp(spec.name), partition_by=["srvid"])
    out = read_staging(wh, spec, srvid=1, server_version=150004,
                       source=MODULE_SOURCES[spec.name])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        [f.name for f in spec.staging_schema.fields]


def test_layout_renames_and_defaults(spark, wh):
    """pg_stat_wal_receiver pg11 layout: received_lsn feeds flushed_lsn
    (rename, powa--5.2.0.sql:5487), written_lsn shimmed NULL;
    pg_stat_subscription pg10-16 layouts inject 'apply' AS worker_type
    (powa--5.2.0.sql:5216)."""
    from powa_archivist_spark.sources.readers import read_staging
    from powa_archivist_spark.sources.versions import MODULE_SOURCES
    from powa_archivist_spark.specs import MODULE_SPECS
    from powa_archivist_spark.storage import Warehouse

    wr = MODULE_SPECS["pg_stat_wal_receiver"]
    staged = spark.createDataFrame(
        [(1, ts(0), "slot1", "h1", 5432, 77, "streaming", 1234)],
        "srvid int, ts timestamp, slot_name string, sender_host string, "
        "sender_port int, pid int, status string, received_lsn long",
    )
    wh.append(staged, Warehouse.src_tmp(wr.name), partition_by=["srvid"])
    out = read_staging(wh, wr, srvid=1, server_version=110000,
                       source=MODULE_SOURCES[wr.name]).collect()[0]
    assert out.flushed_lsn == 1234      # rename received_lsn -> flushed_lsn
    assert out.written_lsn is None      # not split yet on pg11
    assert out.sender_host == "h1"      # pg11+ native

    sub = MODULE_SPECS["pg_stat_subscription"]
    staged = spark.createDataFrame(
        [(1, ts(0), 16385, "mysub", 99, 0)],
        "srvid int, ts timestamp, subid long, subname string, pid int, "
        "relid long",
    )
    wh.append(staged, Warehouse.src_tmp(sub.name), partition_by=["srvid"])
    out = read_staging(wh, sub, srvid=1, server_version=150000,
                       source=MODULE_SOURCES[sub.name]).collect()[0]
    assert out.worker_type == "apply"   # literal default pre-pg17
    assert out.leader_pid is None       # pg16+ only


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


def test_catalog_layout_registry_covers_all_catalogs():
    """Every mirrored catalog has versioned layout data
    (powa_catalog_src_queries, powa--5.2.0.sql:457-687), consistent with
    its mirror schema."""
    for catname, _ in cat.CATALOGS:
        assert catname in cat.CATALOG_SOURCES
        schema_cols = {f.name for f in cat.CATALOG_SCHEMAS[catname].fields}
        for v in cat.CATALOG_SOURCES[catname].variants:
            lay = v.payload
            assert set(lay.columns) <= schema_cols, (catname, v.min_version)
            assert set(lay.renames) <= schema_cols
            assert set(lay.defaults) <= schema_cols


@pytest.mark.parametrize("catname,version,native,defaulted,nulled", [
    # powa_catalog_src_query(_catname, version) resolution goldens
    ("pg_class", 90400, ["relreplident"],
     ["relrowsecurity", "relispartition"], ["relpartbound"]),
    ("pg_class", 90600, ["relrowsecurity"], ["relispartition"],
     ["relpartbound"]),
    ("pg_class", 130000, ["relispartition", "relpartbound"], [], []),
    ("pg_attribute", 90600, ["attnotnull"],
     ["attidentity", "atthasmissing", "attgenerated", "attcompression"], []),
    ("pg_attribute", 110000, ["attidentity", "atthasmissing"],
     ["attgenerated", "attcompression"], []),
    ("pg_attribute", 140000, ["attcompression", "attgenerated"], [], []),
    ("pg_collation", 90400, ["collencoding"], ["collisdeterministic"],
     ["collprovider", "collversion", "colllocale"]),
    ("pg_collation", 110000, ["collprovider", "collversion"],
     ["collisdeterministic"], ["colllocale"]),
    ("pg_collation", 150000, ["colllocale"], [], ["collicurules"]),
    ("pg_collation", 170000, ["colllocale", "collicurules"], [], []),
    ("pg_proc", 90400, ["provolatile"], ["proparallel"], ["prokind"]),
    ("pg_proc", 100000, ["proparallel"], [], ["prokind"]),
    ("pg_proc", 120000, ["prokind", "proparallel"], [], []),
])
def test_catalog_version_pick_golden(catname, version, native, defaulted,
                                     nulled):
    lay = cat.catalog_src_layout(catname, version)
    native_cols = set(lay.columns) | set(lay.renames)
    for col in native:
        assert col in native_cols, (catname, version, col)
    for col in defaulted:
        assert col in lay.defaults, (catname, version, col)
    for col in nulled:
        assert col not in native_cols and col not in lay.defaults, \
            (catname, version, col)


@pytest.mark.parametrize("version", [90400, 110000, 170000])
def test_catalog_src_query_rendering(version):
    """The collector-side capture SQL payloads (powa_catalog_src_queries,
    powa--5.2.0.sql:457-687) render from the layout config: native
    columns pass through, renames alias, reference literals inject, and
    missing columns pad to NULL, so every epoch lands the full staging
    schema."""
    qs = cat.catalog_src_queries(version)
    assert list(qs) == [n for n, _ in sorted(cat.CATALOGS,
                                             key=lambda c: c[1])]
    for catname, sql in qs.items():
        assert sql.startswith("SELECT ")
        assert f"pg_catalog.{catname}" in sql
        # every non-context staging column appears exactly once
        for f in cat.CATALOG_SCHEMAS[catname].fields:
            if f.name not in ("srvid", "dbid"):
                assert f" {f.name}" in sql or sql.count(f.name), \
                    (catname, f.name)
    # temp-object exclusion (:467-470, :504-509)
    assert "relpersistence != 't'" in qs["pg_class"]
    assert "NOT attisdropped" in qs["pg_attribute"]


def test_catalog_src_query_version_goldens():
    # pre-9.5 pg_class: rowsecurity cols are literal false, partbound NULL
    old = cat.catalog_src_query("pg_class", 90400)
    assert "false AS relrowsecurity" in old
    assert "NULL AS relpartbound" in old
    # pg10+: native
    new = cat.catalog_src_query("pg_class", 130000)
    assert "relispartition" in new and "false AS relispartition" not in new
    # pg15 collation: colliculocale renamed to the colllocale surface
    coll = cat.catalog_src_query("pg_collation", 150000)
    assert "colliculocale AS colllocale" in coll
    # pg17: native colllocale, no alias
    coll17 = cat.catalog_src_query("pg_collation", 170000)
    assert "colliculocale" not in coll17 and "colllocale" in coll17
    # pre-9.6 proc: proparallel literal 'u'
    assert "'u' AS proparallel" in cat.catalog_src_query("pg_proc", 90400)


def test_catalog_staging_projection(spark, wh):
    """End-to-end: a pg15 collation batch lands with colliculocale, the
    layout renames it to colllocale (powa--5.2.0.sql:603-610); a pg9.6
    attribute batch gets the literal '' identity/generated paddings
    (:500-509)."""
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    coll = spark.createDataFrame(
        [(1, 10, 100, "my_coll", 11, "c", True, "UTF8", "C", "C",
          "en-US-u-x", "1.2")],
        "srvid int, dbid long, oid long, collname string, collnamespace long, "
        "collprovider string, collisdeterministic boolean, collencoding "
        "string, collcollate string, collctype string, colliculocale string, "
        "collversion string",
    )
    counts = cat.catalog_snapshot_all(wh, 1, {"pg_collation": coll}, now=t0,
                                      server_version=150004)
    assert counts == {"pg_collation": 1}
    row = wh.read(cat.catalog_table("pg_collation")).collect()[0]
    assert row.colllocale == "en-US-u-x"   # renamed from colliculocale
    assert row.collicurules is None        # pg16+ only

    attr = spark.createDataFrame(
        [(1, 10, 100, "col_a", 23, 4, 1, False, False, -1, 0)],
        "srvid int, dbid long, attrelid long, attname string, atttypid long, "
        "attlen int, attnum int, attnotnull boolean, atthasdef boolean, "
        "attstattarget int, attcollation long",
    )
    out = cat.stage_catalog(attr, "pg_attribute", 90600).collect()[0]
    assert out.attidentity == "" and out.attgenerated == ""
    assert out.atthasmissing is False and out.attcompression == ""


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


def test_landing_formats_agree(spark, wh, tmp_path):
    """JSON, CSV, and ORC collector drops land identically to parquet
    through the staging shim, and feed the snapshot operator
    unchanged."""
    import json as jsonlib

    from powa_archivist_spark.operators.snapshot import snapshot
    from powa_archivist_spark.sources.landing import read_landing
    from powa_archivist_spark.storage import Warehouse

    rows = [(1, ts(0), 110, 50, 105, 10, 200),
            (1, ts(5), 120, 55, 110, 12, 220)]
    df = spark.createDataFrame(rows, PG_STAT_BGWRITER.staging_schema)
    names = [f.name for f in PG_STAT_BGWRITER.staging_schema.fields]

    pq = str(tmp_path / "drop_parquet")
    df.coalesce(1).write.parquet(pq)
    oc = str(tmp_path / "drop_orc")
    df.coalesce(1).write.orc(oc)
    jpath = tmp_path / "drop.json"
    with open(jpath, "w") as f:
        for r in df.collect():
            f.write(jsonlib.dumps(
                {n: (getattr(r, n).isoformat() if n == "ts"
                     else getattr(r, n)) for n in names}) + "\n")
    cpath = tmp_path / "drop.csv"
    with open(cpath, "w") as f:
        f.write(",".join(names) + "\n")
        for r in df.collect():
            f.write(",".join(
                getattr(r, n).isoformat() if n == "ts" else str(getattr(r, n))
                for n in names) + "\n")

    got = {}
    for fmt, p in (("parquet", pq), ("orc", oc), ("json", str(jpath)),
                   ("csv", str(cpath))):
        landed = read_landing(spark, p, PG_STAT_BGWRITER, fmt=fmt)
        assert [f.name for f in landed.schema.fields] == names
        got[fmt] = sorted(map(tuple, landed.collect()))
    assert got["parquet"] == got["json"] == got["csv"] == got["orc"]

    # a landed frame is a valid snapshot capture
    n = snapshot(wh, PG_STAT_BGWRITER, 1, capture=read_landing(
        spark, str(jpath), PG_STAT_BGWRITER, fmt="json"))
    assert n == 2
    assert wh.read(Warehouse.current(PG_STAT_BGWRITER.name)).count() == 2


def test_landing_rejects_unknown_format(spark):
    import pytest

    from powa_archivist_spark.sources.landing import read_landing

    with pytest.raises(ValueError):
        read_landing(spark, "/nope", PG_STAT_BGWRITER, fmt="xml")
