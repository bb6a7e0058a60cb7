"""Generic coalesce/aggregate job — pack current rows into history.

Reference: ``powa_statements_aggregate`` (powa--5.2.0.sql:5990-6114) and
the generated module variant (powa--5.2.0.sql:1490-1539): two
INSERT..SELECT with array-of-struct packing, then DELETE the current rows.

Spark shape: read the srvid partition of the current table, groupBy-pack
(functions/packing.py), append to history partitioned by (srvid,
range_day), then drain the current partition.  The pack groupBy is the
only shuffle; its key (srvid, entity keys) is exactly the storage key, so
at scale the same partitioning serves the aggregate AND the read path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.packing import pack
from ..session import narrow_exchanges
from ..specs import DatasourceSpec
from ..storage import Warehouse


def aggregate(wh: Warehouse, spec: DatasourceSpec, srvid: int) -> int:
    """Pack one server's current rows into history; returns packed rows.

    The whole pass runs under :func:`narrow_exchanges` (r12): a coalesce
    pass packs ONE server's current window — bounded per (srvid,
    coalesce interval) by the snapshot contract — so its pack groupBy
    and history append plan at cluster parallelism instead of paying
    the wide analytics posture on a micro-batch."""
    with narrow_exchanges(wh.spark):
        total = 0
        total += _aggregate_one(
            wh, spec, srvid,
            Warehouse.current(spec.name), Warehouse.history(spec.name),
            key_names=spec.key_names,
        )
        if spec.db_rollup:
            total += _aggregate_one(
                wh, spec, srvid,
                Warehouse.current_db(spec.name),
                Warehouse.history_db(spec.name),
                key_names=[spec.dbid_col],
            )
        return total


def _aggregate_one(
    wh: Warehouse,
    spec: DatasourceSpec,
    srvid: int,
    current_table: str,
    history_table: str,
    key_names: list[str],
) -> int:
    if not wh.exists(current_table):
        return 0
    cur = wh.read(current_table).filter(F.col("srvid") == srvid)

    if key_names == spec.key_names:
        packed = pack(cur, spec)
    else:
        # per-db rollup history packs the db_record (aggregatable counters
        # only — powa--5.2.0.sql:1047-1056)
        packed = pack(cur, _db_subspec(spec))

    packed = packed.withColumn("range_day", F.to_date("range_end"))
    # cache the packed output (~coalesce:1 smaller than current) so the
    # count and the write don't each re-run the pack groupBy
    packed = packed.persist()
    try:
        n = packed.count()
        if n > 0:
            wh.append(packed, history_table,
                      partition_by=["srvid", "range_day"])
    finally:
        packed.unpersist()
    # drain the current partition (DELETE FROM *_current WHERE srvid —
    # powa--5.2.0.sql:6051-6056)
    wh.drop_srvid(current_table, srvid)
    return n


def _db_subspec(spec: DatasourceSpec) -> DatasourceSpec:
    """Derived spec for the `_db` tables: keyed by dbid, aggregatable
    counters only."""
    from ..specs import Counter, DatasourceSpec, Key

    return DatasourceSpec(
        name=f"{spec.name}_db",
        kind=spec.kind,
        priority=spec.priority,
        keys=(Key(spec.dbid_col, "oid"),),
        counters=tuple(c for c in spec.counters if c.aggregatable),
    )
