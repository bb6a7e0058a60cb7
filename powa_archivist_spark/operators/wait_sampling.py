"""wait_sampling capture resolution — the J8 queryid->dbid join wired
into the datasource's snapshot path.

Reference: ``powa_wait_sampling_src`` (powa--5.2.0.sql:7297-7341).
pg_wait_sampling profiles by pid, and pids are reused across databases
and users, so the only way to attribute a sample to a database is via
its queryid: join a DISTINCT (dbid, queryid) projection of
pg_stat_statements (a queryid can appear once per executing user — the
DISTINCT is load-bearing), default dbid 0 when unknown, drop samples of
dropped databases (P3), then pre-aggregate ``sum(count)`` per
(dbid, event_type, event, queryid).

Spark shape: the DISTINCT dictionary projection is tiny (it is the
statements dictionary, the engine's most-broadcast dimension) — a
broadcast left join plus one map-side-combinable groupBy; the samples
side never shuffles before the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import Warehouse
from . import databases, dictionary


def resolve_wait_sampling(
    wh: Warehouse, srvid: int, samples: DataFrame
) -> DataFrame:
    """Raw profile samples (ts, event_type, event, queryid, count — no
    dbid) -> staging-shaped capture with the dbid resolved.

    Matches powa--5.2.0.sql:7315-7334 step for step."""
    ids = (
        dictionary.read_statements(wh, srvid)
        .select("dbid", "queryid")
        .distinct()  # critical: one row per (dbid, queryid) (:7324-7327)
    )
    resolved = (
        samples.filter(
            F.col("event_type").isNotNull() & F.col("event").isNotNull()
        )
        .join(F.broadcast(ids), "queryid", "left")
        .withColumn("dbid", F.coalesce(F.col("dbid"), F.lit(0)))
    )
    # P3: exclude samples attributed to dropped databases (:7329-7332)
    if wh.exists(databases.TABLE):
        dropped = (
            wh.read(databases.TABLE, databases.SCHEMA)
            .filter((F.col("srvid") == srvid) & F.col("dropped").isNotNull())
            .select(F.col("oid").alias("dbid"))
        )
        resolved = resolved.join(F.broadcast(dropped), "dbid", "left_anti")
    return (
        resolved.groupBy(
            F.lit(srvid).cast("int").alias("srvid"),
            "ts", "dbid", "event_type", "event", "queryid",
        )
        .agg(F.sum("count").cast("decimal(38,0)").alias("count"))
        .select("srvid", "ts", "dbid", "event_type", "event", "queryid",
                "count")
    )
