"""Catalog mirroring — remote servers' pg_catalog snapshots.

Reference (powa--5.2.0.sql):
- 7 mirrored catalogs with versioned src queries keyed by
  ``(catname, min_version)`` (457-697) — version pick handled by
  :func:`..sources.readers.resolve_versioned`;
- ``powa_catalog_generic_snapshot`` (5714-5787): move staged rows into
  the mirror per (srvid, dbid) — a DELETE...RETURNING feeding INSERT in
  Postgres (D3), a partition overwrite here;
- pg_class carries the ``last_refresh`` stamp and runs LAST (priority 99,
  445-448) so a partial snapshot never looks complete;
- refresh-interval gating: databases refreshed within
  ``refresh_interval`` are excluded from the next pass (725-745).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import Warehouse

# ORDER BY priority: pg_class last — it stamps last_refresh
CATALOGS: list[tuple[str, int]] = [
    ("pg_namespace", 1),
    ("pg_type", 2),
    ("pg_collation", 3),
    ("pg_proc", 4),
    ("pg_language", 5),
    ("pg_attribute", 6),
    ("pg_class", 99),
]

DEFAULT_REFRESH_INTERVAL = dt.timedelta(days=365)  # powa--5.2.0.sql:726

REFRESH_FILE = "powa_catalog_refresh.json"


def catalog_table(catname: str) -> str:
    return f"powa_catalog_{catname}"


def catalog_staging(catname: str) -> str:
    return f"powa_catalog_{catname}_src_tmp"


def _refresh_path(wh: Warehouse) -> str:
    return os.path.join(wh.root, REFRESH_FILE)


def load_refresh(wh: Warehouse) -> dict:
    p = _refresh_path(wh)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _save_refresh(wh: Warehouse, state: dict) -> None:
    p = _refresh_path(wh)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, p)


def last_refresh(wh: Warehouse, srvid: int, dbid: int) -> dt.datetime | None:
    raw = load_refresh(wh).get(f"{srvid}:{dbid}")
    return dt.datetime.fromisoformat(raw) if raw else None


def dbs_needing_refresh(
    wh: Warehouse,
    srvid: int,
    dbids: list[int],
    now: dt.datetime,
    refresh_interval: dt.timedelta = DEFAULT_REFRESH_INTERVAL,
) -> list[int]:
    """Databases whose mirror is stale (never refreshed or older than the
    interval) — the exclusion of recently-refreshed dbs
    (powa--5.2.0.sql:725-745)."""
    out = []
    for dbid in dbids:
        lr = last_refresh(wh, srvid, dbid)
        if lr is None or lr <= now - refresh_interval:
            out.append(dbid)
    return out


def catalog_snapshot(
    wh: Warehouse,
    srvid: int,
    catname: str,
    staged: DataFrame,
    now: dt.datetime,
) -> int:
    """Generic catalog snapshot for one catalog: replace the mirror's
    (srvid, dbid) slices present in the staged batch (snapshot-replace
    diff D4 — full replace is MERGE with matched-update + not-matched-
    insert + not-matched-by-source-delete in one overwrite).

    pg_class additionally stamps ``last_refresh`` per refreshed dbid
    (powa--5.2.0.sql:5767-5774).  Returns staged row count."""
    staged = staged.cache()
    try:
        n = staged.count()
        if n == 0:
            return 0
        table = catalog_table(catname)
        dbids = [r.dbid for r in staged.select("dbid").distinct().collect()]
        if wh.exists(table):
            keep = wh.read(table).filter(
                ~((F.col("srvid") == srvid) & F.col("dbid").isin(dbids))
            )
            merged = keep.unionByName(staged, allowMissingColumns=True)
        else:
            merged = staged
        wh.overwrite(merged, table, partition_by=["srvid"])
        if catname == "pg_class":
            state = load_refresh(wh)
            for dbid in dbids:
                state[f"{srvid}:{dbid}"] = now.isoformat()
            _save_refresh(wh, state)
        return n
    finally:
        staged.unpersist()


def catalog_snapshot_all(
    wh: Warehouse,
    srvid: int,
    staged_by_cat: dict[str, DataFrame],
    now: dt.datetime,
) -> dict[str, int]:
    """Run all staged catalogs in priority order (pg_class last)."""
    counts = {}
    for catname, _prio in sorted(CATALOGS, key=lambda c: c[1]):
        if catname in staged_by_cat:
            counts[catname] = catalog_snapshot(
                wh, srvid, catname, staged_by_cat[catname], now
            )
    return counts


def catalog_reset(wh: Warehouse, srvid: int) -> None:
    """Drop one server's catalog mirror + refresh stamps (FK-cascade
    analog of powa_catalog_databases deletes, 99_cleanup.sql)."""
    for catname, _ in CATALOGS:
        wh.drop_srvid(catalog_table(catname), srvid)
    state = {
        k: v for k, v in load_refresh(wh).items()
        if not k.startswith(f"{srvid}:")
    }
    _save_refresh(wh, state)
