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
