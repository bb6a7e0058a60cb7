"""Admin API semantics ported from the reference's remote-API golden test
(/root/reference/sql/02_remote_api.sql): register server -> snapshot from
injected staging -> configure patch (whitelist) -> retention resolution ->
activate/deactivate -> delete cascades.
"""

from __future__ import annotations

import datetime as dt

import pytest

from powa_archivist_spark import admin
from powa_archivist_spark.orchestrator import Orchestrator
from powa_archivist_spark.specs import PG_STAT_BGWRITER
from powa_archivist_spark.storage import Warehouse

from .conftest import ts

SPEC = PG_STAT_BGWRITER


def test_register_and_configure(wh):
    srvid = admin.register_server(wh, "db1.example.net", alias="db1",
                                  frequency_s=60)
    assert srvid == 1
    assert admin.register_server(wh, "db2.example.net") == 2
    with pytest.raises(admin.AdminError, match="already registered"):
        admin.register_server(wh, "db1.example.net")
    with pytest.raises(admin.AdminError, match="frequency"):
        admin.register_server(wh, "db3.example.net", frequency_s=1)

    assert admin.configure_server(wh, 1, {"retention_s": 3600})
    assert admin.get_server_retention(wh, 1) == dt.timedelta(hours=1)
    # default chain: unconfigured server -> engine default
    assert admin.get_server_retention(wh, 2) == dt.timedelta(days=1)
    with pytest.raises(admin.AdminError, match="unknown config keys"):
        admin.configure_server(wh, 1, {"not_a_key": 1})
    with pytest.raises(admin.AdminError, match="no server"):
        admin.configure_server(wh, 99, {"port": 1})
    with pytest.raises(admin.AdminError, match="local server"):
        admin.configure_server(wh, 0, {"port": 1})


def test_datasource_activation_roundtrip(wh):
    srvid = admin.register_server(wh, "db1.example.net")
    cfg = admin.server_config(wh, srvid)
    assert cfg.enabled is None  # all datasources
    admin.set_datasource_enabled(wh, srvid, SPEC.name, False)
    cfg = admin.server_config(wh, srvid)
    assert SPEC.name not in cfg.enabled and len(cfg.enabled) > 0
    admin.set_datasource_enabled(wh, srvid, SPEC.name, True)
    assert SPEC.name in admin.server_config(wh, srvid).enabled
    with pytest.raises(admin.AdminError, match="unknown datasource"):
        admin.set_datasource_enabled(wh, srvid, "nope", True)


def test_db_module_activation_state_machine(wh):
    """Mirror of the reference golden sql/03_db_module.sql:1-45 on the
    powa_activate/deactivate_db_module state machine
    (powa--5.2.0.sql:2397-2567)."""
    srvid = admin.register_server(wh, "db1.example.net")
    mod = "user_functions"

    # registering a server registers all default db modules, enabled,
    # all-databases (03_db_module.sql:4-6)
    cfg = admin.db_module_config(wh, srvid)
    assert {"user_functions", "all_tables", "all_indexes"} <= set(cfg)
    assert cfg[mod] == {"enabled": True, "dbnames": None}

    # can't deactivate a specific db on an "all databases" config (:9-10)
    with pytest.raises(admin.AdminError, match="no specific database"):
        admin.deactivate_db_module(wh, srvid, mod, ["test"])

    # activating a specific db on an "all databases" config switches to
    # that db only (:13-14)
    admin.activate_db_module(wh, srvid, mod, ["d1"])
    assert admin.db_module_config(wh, srvid)[mod] == \
        {"enabled": True, "dbnames": ["d1"]}

    # activating another db REPLACES the list (:17-18)
    admin.activate_db_module(wh, srvid, mod, ["d2"])
    assert admin.db_module_config(wh, srvid)[mod]["dbnames"] == ["d2"]

    # deactivating without a list switches back to all-db, disabled (:21-22)
    admin.deactivate_db_module(wh, srvid, mod)
    assert admin.db_module_config(wh, srvid)[mod] == \
        {"enabled": False, "dbnames": None}

    # activating with multiple dbs re-enables with those dbs (:25-26)
    admin.activate_db_module(wh, srvid, mod, ["d1", "d3", "d4"])
    assert admin.db_module_config(wh, srvid)[mod] == \
        {"enabled": True, "dbnames": ["d1", "d3", "d4"]}

    # deactivating one specific db just removes it (:29-30)
    admin.deactivate_db_module(wh, srvid, mod, ["d3"])
    assert admin.db_module_config(wh, srvid)[mod]["dbnames"] == ["d1", "d4"]

    # can't deactivate a db that isn't activated (:33-34)
    with pytest.raises(admin.AdminError, match="not already activated"):
        admin.deactivate_db_module(wh, srvid, mod, ["d3"])

    # removing every remaining db disables the module (:37-38)
    admin.deactivate_db_module(wh, srvid, mod, ["d1", "d4"])
    assert admin.db_module_config(wh, srvid)[mod] == \
        {"enabled": False, "dbnames": None}

    # deactivating a deactivated module is a noop (:41-42)
    assert admin.deactivate_db_module(wh, srvid, mod, None)

    # unknown module raises (:44-45 analog)
    with pytest.raises(admin.AdminError, match="not known"):
        admin.deactivate_db_module(wh, srvid, "pg_stat_bgwriter")


def test_db_module_dbnames_scope_filters_capture(spark, wh):
    """A dbnames-scoped db module only captures rows whose database
    resolves to one of the configured names (powa_db_functions.dbnames
    drive the collector's per-db iteration, powa--5.2.0.sql:402-426)."""
    from powa_archivist_spark.operators import databases as dbs
    from powa_archivist_spark.specs import USER_FUNCTIONS

    srvid = admin.register_server(wh, "db1.example.net", powa_coalesce=5)
    admin.activate_db_module(wh, srvid, "user_functions", ["keep_me"])
    server = admin.server_config(wh, srvid)
    orch = Orchestrator(wh, specs={USER_FUNCTIONS.name: USER_FUNCTIONS})

    dbdim = spark.createDataFrame(
        [(10, "keep_me"), (11, "drop_me")], "oid long, datname string"
    )
    cap = spark.createDataFrame(
        [(srvid, ts(0), 10, 500, 3, 1.0, 0.5),
         (srvid, ts(0), 11, 501, 9, 2.0, 1.0)],
        USER_FUNCTIONS.staging_schema,
    )
    errs = orch.take_snapshot(
        server, captures={"databases": dbdim, USER_FUNCTIONS.name: cap},
        now=ts(0),
    )
    assert errs == 0, orch.read_metas(srvid)["errors"]
    kept = wh.read(Warehouse.current(USER_FUNCTIONS.name)).collect()
    assert [r.dbid for r in kept] == [10]

    # disabling the module drops it from dispatch entirely
    admin.deactivate_db_module(wh, srvid, "user_functions")
    server = admin.server_config(wh, srvid)
    assert all(s.name != "user_functions"
               for s in orch._dispatch_order(server))


def test_version_gates_dispatch(wh):
    """powa_functions filters datasources by module min_version
    (powa--5.2.0.sql:259-271): a pg12 server must not dispatch pg13+
    modules like pg_stat_replication or pg_replication_slots."""
    from powa_archivist_spark.specs import ALL_SPECS

    srvid = admin.register_server(wh, "db1.example.net")
    admin.configure_server(wh, srvid, {"version": 120012})
    orch = Orchestrator(wh, specs=dict(ALL_SPECS))
    names = {s.name for s in orch._dispatch_order(admin.server_config(wh, srvid))}
    assert "pg_stat_replication" not in names
    assert "pg_replication_slots" not in names
    assert "pg_stat_lock" not in names
    assert "pg_stat_bgwriter" in names
    admin.configure_server(wh, srvid, {"version": 190000})
    names = {s.name for s in orch._dispatch_order(admin.server_config(wh, srvid))}
    assert "pg_stat_lock" in names and "pg_stat_recovery" in names


def test_registered_server_lifecycle_and_delete(spark, wh):
    srvid = admin.register_server(
        wh, "db1.example.net", powa_coalesce=5,
        enabled_datasources=[SPEC.name],
    )
    admin.configure_server(wh, srvid, {"retention_s": 86400})
    orch = Orchestrator(wh, specs={SPEC.name: SPEC})
    server = admin.server_config(wh, srvid)
    assert server.powa_coalesce == 5 and server.enabled == [SPEC.name]

    cap = spark.createDataFrame(
        [(srvid, ts(0), 110, 50, 105, 10, 200)], SPEC.staging_schema
    )
    assert orch.take_snapshot(server, captures={SPEC.name: cap}, now=ts(0)) == 0
    assert wh.read(Warehouse.current(SPEC.name)).count() == 1

    admin.set_server_active(wh, srvid, False)
    assert not admin.load_servers(wh)[srvid]["active"]

    admin.delete_and_purge_server(wh, srvid)
    assert srvid not in admin.load_servers(wh)
    assert wh.read(Warehouse.current(SPEC.name), SPEC.current_schema).count() == 0
    assert orch.read_metas(srvid)["coalesce_seq"] == 0  # metas gone -> fresh


def test_srvid_never_reused_and_delete_cascades_side_tables(spark, wh):
    """powa_delete_and_purge_server's FK cascade covers the qualstats
    side tables, databases dimension, and catalog mirrors; the srvid
    sequence never hands a deleted id to a new registration."""
    from powa_archivist_spark.operators import databases, qualstats as qs
    from powa_archivist_spark.sources import catalog as cat

    srvid = admin.register_server(wh, "cascade.example.net")
    # plant side-table rows for the server
    databases.databases_snapshot(
        wh, srvid,
        spark.createDataFrame([(1, "db1")], "oid long, datname string"),
        now=ts(0),
    )
    wh.append(
        spark.createDataFrame(
            [(srvid, 70, 100, 10, 5, ts(0), 1, 10, 4, 1.5, 2.0, ["42"])],
            "srvid int, qualid long, queryid long, dbid long, userid long, "
            "ts timestamp, occurences long, execution_count long, "
            "nbfiltered long, mean_err_estimate_ratio double, "
            "mean_err_estimate_num double, constvalues array<string>",
        ),
        qs.CONSTVALUES_TABLE, partition_by=["srvid"],
    )
    staged = spark.createDataFrame(
        [(srvid, 1, 2200, "pg_catalog")], "srvid int, dbid long, oid long, nspname string"
    )
    cat.catalog_snapshot(wh, srvid, "pg_namespace", staged, now=ts(0))

    admin.delete_and_purge_server(wh, srvid)
    assert databases.read_databases(wh, srvid).count() == 0
    assert qs.constvalues_current(wh, srvid).count() == 0
    assert (not wh.exists(cat.catalog_table("pg_namespace"))) or (
        wh.read(cat.catalog_table("pg_namespace"))
        .filter(f"srvid = {srvid}").count() == 0
    )
    # the freed id is NOT reassigned
    assert admin.register_server(wh, "next.example.net") == srvid + 1


def test_register_server_rejects_unknown_kwargs(wh):
    import pytest

    with pytest.raises(admin.AdminError):
        admin.register_server(wh, "typo.example.net", frequency=60)
