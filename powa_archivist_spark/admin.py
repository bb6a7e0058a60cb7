"""Admin / configuration API — the reference's server & datasource
registry surface re-expressed as engine config state.

Reference parity (powa--5.2.0.sql):
- ``powa_register_server`` (2686-2750) -> :func:`register_server`
- ``powa_configure_server`` JSON patch with key whitelist (2752-2796)
  -> :func:`configure_server`
- ``powa_deactivate_server`` / reactivation (2798-2814) ->
  :func:`set_server_active`
- ``powa_delete_and_purge_server`` FK-cascade delete (2816-2893) ->
  :func:`delete_and_purge_server` (explicit multi-table partition drop —
  no FKs in Spark)
- ``powa_activate_extension`` / ``powa_deactivate_extension``
  (2570-2684) -> :func:`set_datasource_enabled`
- ``powa_get_server_retention`` resolution chain: per-server override
  else engine default (2942-2990) -> :func:`get_server_retention`

Config lives in one atomic JSON file per concern under the warehouse
root (it is orchestration state for a handful of servers, not
analytical data — a distributed table for N<10^4 config rows is pure
overhead; the snapshot metas made the same call).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from .operators.purge import DEFAULT_RETENTION
from .orchestrator import DEFAULT_COALESCE, ServerConfig
from .specs import ALL_SPECS
from .storage import Warehouse

SERVERS_FILE = "powa_servers.json"

# powa_configure_server whitelist (powa--5.2.0.sql:2773-2777); `version`
# is the collector-stamped pg version num (powa_servers.version, :132)
CONFIGURABLE_KEYS = {
    "hostname", "alias", "port", "username", "password", "dbname",
    "frequency_s", "retention_s", "powa_coalesce", "allow_ui_connection",
    "version",
}

MIN_FREQUENCY_S = 5      # powa_servers.frequency CHECK (powa--5.2.0.sql:128)
MIN_COALESCE = 5         # powa.c:277-281


class AdminError(ValueError):
    pass


def _servers_path(wh: Warehouse) -> str:
    return os.path.join(wh.root, SERVERS_FILE)


def load_servers(wh: Warehouse) -> dict[int, dict]:
    p = _servers_path(wh)
    if not os.path.exists(p):
        # srvid 0 = the local server, always present (powa--5.2.0.sql:132-136)
        return {0: _default_row(0, hostname="<local>")}
    with open(p) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def _save(wh: Warehouse, servers: dict[int, dict]) -> None:
    p = _servers_path(wh)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in servers.items()}, f, indent=1)
    os.replace(tmp, p)


def _next_srvid(wh: Warehouse, servers: dict[int, dict]) -> int:
    """Monotonic srvid assignment, like the reference's never-reused
    sequence: a high-watermark file survives deletions, so deleting the
    highest-id server can't hand its srvid (and any leftover partitions)
    to the next registration."""
    p = _servers_path(wh) + ".seq"
    hwm = 0
    if os.path.exists(p):
        with open(p) as f:
            hwm = int(f.read().strip() or 0)
    nxt = max(max(servers) + 1, hwm + 1)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, p)
    return nxt


def _default_row(srvid: int, **over) -> dict:
    row = {
        "srvid": srvid,
        "hostname": None,
        "alias": None,
        "port": 5432,
        "username": "powa",
        "password": None,
        "dbname": "powa",
        "frequency_s": 300,
        "retention_s": int(DEFAULT_RETENTION.total_seconds()),
        "powa_coalesce": DEFAULT_COALESCE,
        "allow_ui_connection": True,
        "active": True,
        "enabled_datasources": None,  # None = all registered
        "version": None,  # pg version num, stamped by the collector
        # powa_db_module_config rows (powa--5.2.0.sql:345-351): per
        # db-module {enabled, dbnames}; dbnames None = all databases.
        # Registering a server registers every default db module
        # (mirrors sql/03_db_module.sql:4-6)
        "db_module_config": {
            name: {"enabled": True, "dbnames": None}
            for name, s in ALL_SPECS.items() if s.kind == "db_module"
        },
    }
    row.update(over)
    return row


def register_server(
    wh: Warehouse,
    hostname: str,
    alias: str | None = None,
    frequency_s: int = 300,
    retention: dt.timedelta = DEFAULT_RETENTION,
    powa_coalesce: int = DEFAULT_COALESCE,
    enabled_datasources: list[str] | None = None,
    **extra,
) -> int:
    """Returns the newly assigned srvid (monotonic, like the sequence)."""
    if frequency_s != -1 and frequency_s < MIN_FREQUENCY_S:
        raise AdminError(f"frequency must be >= {MIN_FREQUENCY_S}s or -1 (disabled)")
    if powa_coalesce < MIN_COALESCE:
        raise AdminError(f"powa_coalesce must be >= {MIN_COALESCE}")
    if enabled_datasources is not None:
        unknown = set(enabled_datasources) - set(ALL_SPECS)
        if unknown:
            raise AdminError(f"unknown datasources: {sorted(unknown)}")
    # fail fast on unknown/misspelled kwargs (configure_server does the
    # same) — a typo like frequency=60 would otherwise be stored as a
    # junk key while the real knob silently keeps its default
    bad = set(extra) - CONFIGURABLE_KEYS
    if bad:
        raise AdminError(f"unknown config keys: {sorted(bad)}")
    servers = load_servers(wh)
    if any(
        s.get("hostname") == hostname and s.get("port") == extra.get("port", 5432)
        for s in servers.values() if s["srvid"] != 0
    ):
        raise AdminError(f"server {hostname} already registered")
    srvid = _next_srvid(wh, servers)
    servers[srvid] = _default_row(
        srvid,
        hostname=hostname,
        alias=alias,
        frequency_s=frequency_s,
        retention_s=int(retention.total_seconds()),
        powa_coalesce=powa_coalesce,
        enabled_datasources=enabled_datasources,
        **extra,
    )
    _save(wh, servers)
    return srvid


def configure_server(wh: Warehouse, srvid: int, patch: dict) -> bool:
    """JSON-patch semantics with key whitelist; unknown keys raise
    (powa--5.2.0.sql:2779-2786 emits WARNING and ignores; we fail fast)."""
    servers = load_servers(wh)
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    if srvid == 0:
        raise AdminError("local server (srvid 0) is configured via engine defaults")
    bad = set(patch) - CONFIGURABLE_KEYS
    if bad:
        raise AdminError(f"unknown config keys: {sorted(bad)}")
    if "frequency_s" in patch and patch["frequency_s"] != -1 \
            and patch["frequency_s"] < MIN_FREQUENCY_S:
        raise AdminError(f"frequency must be >= {MIN_FREQUENCY_S}s or -1")
    if "powa_coalesce" in patch and patch["powa_coalesce"] < MIN_COALESCE:
        raise AdminError(f"powa_coalesce must be >= {MIN_COALESCE}")
    servers[srvid].update(patch)
    _save(wh, servers)
    return True


def set_server_active(wh: Warehouse, srvid: int, active: bool) -> None:
    servers = load_servers(wh)
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    servers[srvid]["active"] = active
    _save(wh, servers)


def set_datasource_enabled(wh: Warehouse, srvid: int, name: str,
                           enabled: bool) -> None:
    """powa_activate/deactivate_extension per server."""
    if name not in ALL_SPECS:
        raise AdminError(f"unknown datasource {name}")
    servers = load_servers(wh)
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    row = servers[srvid]
    current = row["enabled_datasources"]
    if current is None:
        current = sorted(ALL_SPECS)
    if enabled and name not in current:
        current = sorted([*current, name])
    if not enabled and name in current:
        current = [d for d in current if d != name]
    row["enabled_datasources"] = current
    _save(wh, servers)


def _db_module_entry(servers: dict, srvid: int, name: str) -> dict:
    if name not in ALL_SPECS or ALL_SPECS[name].kind != "db_module":
        raise AdminError(f'db module "{name}" is not known')
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    return servers[srvid].setdefault("db_module_config", {})


def activate_db_module(wh: Warehouse, srvid: int, name: str,
                       databases: list[str] | None = None) -> bool:
    """``powa_activate_db_module`` (powa--5.2.0.sql:2397-2455): enable the
    db module for the server, scoped to ``databases`` (None = all).
    Activating with a database list REPLACES the stored list — activating
    'd2' on a {'d1'} config yields {'d2'}, not {'d1','d2'}
    (sql/03_db_module.sql:16-18)."""
    servers = load_servers(wh)
    cfg = _db_module_entry(servers, srvid, name)
    entry = cfg.get(name)
    if entry is not None:
        if entry["enabled"] and entry["dbnames"] == databases:
            return True  # existing info already matches, bail out (:2436)
        entry.update(enabled=True, dbnames=databases)
    else:
        cfg[name] = {"enabled": True, "dbnames": databases}
    _save(wh, servers)
    return True


def deactivate_db_module(wh: Warehouse, srvid: int, name: str,
                         databases: list[str] | None = None) -> bool:
    """``powa_deactivate_db_module`` (powa--5.2.0.sql:2459-2567) — the
    golden state machine of sql/03_db_module.sql:

    - deactivating with no list disables the module and resets dbnames;
    - deactivating specific dbs on an "all databases" (None) config is an
      error (:2510-2513);
    - deactivating dbs not currently activated is an error (:2515-2519);
    - removing every remaining db disables the module (:2547-2553);
    - deactivating an already-disabled module is a no-op (:2502-2506)."""
    servers = load_servers(wh)
    cfg = _db_module_entry(servers, srvid, name)
    entry = cfg.get(name)
    if entry is None:
        raise AdminError(f'db module "{name}" is not configured')
    if not entry["enabled"]:
        return True  # noop; disabled entries carry no dbnames
    if databases is not None:
        if entry["dbnames"] is None:
            raise AdminError(
                "cannot deactivate a db module for a specific database "
                "if no specific database is configured"
            )
        if not set(databases) <= set(entry["dbnames"]):
            raise AdminError(
                "cannot deactivate a db module for a specific database "
                "if not already activated on that database"
            )
        remaining = sorted(set(entry["dbnames"]) - set(databases))
        if remaining:
            entry["dbnames"] = remaining
        else:
            entry.update(enabled=False, dbnames=None)
    else:
        entry.update(enabled=False, dbnames=None)
    _save(wh, servers)
    return True


def db_module_config(wh: Warehouse, srvid: int) -> dict[str, dict]:
    """The server's powa_db_module_config rows."""
    servers = load_servers(wh)
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    return servers[srvid].get("db_module_config", {})


def get_server_retention(wh: Warehouse, srvid: int) -> dt.timedelta:
    """Resolution chain: server override else engine default
    (powa--5.2.0.sql:2942-2990)."""
    servers = load_servers(wh)
    row = servers.get(srvid)
    if row is None or row.get("retention_s") is None:
        return DEFAULT_RETENTION
    return dt.timedelta(seconds=row["retention_s"])


def server_config(wh: Warehouse, srvid: int) -> ServerConfig:
    """Materialize the orchestrator's ServerConfig from the registry."""
    servers = load_servers(wh)
    if srvid not in servers:
        raise AdminError(f"no server {srvid}")
    row = servers[srvid]
    return ServerConfig(
        srvid=srvid,
        frequency_s=row["frequency_s"],
        retention=dt.timedelta(seconds=row["retention_s"]),
        powa_coalesce=row["powa_coalesce"],
        enabled=row["enabled_datasources"],
        version=row.get("version"),
        db_modules=row.get("db_module_config"),
    )


def delete_and_purge_server(wh: Warehouse, srvid: int) -> None:
    """The FK-cascade server delete (powa--5.2.0.sql:2816-2893): drop the
    server's partitions in EVERY datasource table — generic specs
    (reset also covers their staging), the statements dictionary, the
    qualstats side tables, the databases dimension, and the catalog
    mirrors — then the registry row and metas."""
    from .operators import databases, dictionary
    from .operators.purge import reset
    from .operators.qualstats import reset_qualstats
    from .orchestrator import METAS_DIR
    from .sources.catalog import catalog_reset

    for spec in ALL_SPECS.values():
        reset(wh, spec, srvid)
    reset_qualstats(wh, srvid)
    wh.drop_srvid(dictionary.TABLE, srvid)
    wh.drop_srvid(databases.TABLE, srvid)
    catalog_reset(wh, srvid)
    servers = load_servers(wh)
    servers.pop(srvid, None)
    _save(wh, servers)
    metas = os.path.join(wh.path(METAS_DIR), f"srvid={srvid}.json")
    if os.path.exists(metas):
        os.remove(metas)
