"""Generic snapshot job — staging -> current (+ per-db rollup).

Reference: the generated ``<ds>_snapshot`` functions
(powa--5.2.0.sql:1427-1488) and the handwritten
``powa_statements_snapshot`` wCTE pipeline (powa--5.2.0.sql:4006-4108):

    capture   := <ds>_src(srvid)           -- one scan
    [dict]    := MRU-touch + insert-missing into powa_statements
    by_query  := INSERT INTO *_history_current
    by_db     := INSERT INTO *_history_current_db (SUM ... GROUP BY dbid, ts)
    cleanup   := DELETE staging rows for srvid

Spark shape: cache the capture once, run the dependent writes, then drop
the staging partition.  The per-db rollup is materialized at write time on
purpose ("first screens stay reactive" — powa--5.2.0.sql:4013-4015): at
100 TB the rollup is a map-side-combine groupBy over the snapshot slice
only, never a re-aggregation of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..specs import DatasourceSpec
from ..storage import Warehouse


def db_rollup_agg(df: DataFrame, spec: DatasourceSpec) -> DataFrame:
    """SUM of every aggregatable counter GROUP BY (srvid, dbid, ts)
    (powa--5.2.0.sql:4070-4093).  Partial aggregation (map-side combine) is
    automatic for sum(); no extra shuffle beyond the one groupBy."""
    sums = [F.sum(c.name).alias(c.name) for c in spec.agg_counters]
    return df.groupBy("srvid", spec.dbid_col, "ts").agg(*sums)


def snapshot(
    wh: Warehouse,
    spec: DatasourceSpec,
    srvid: int,
    capture: DataFrame | None = None,
    drop_staging: bool = True,
    idempotent: bool = True,
) -> int:
    """Run one snapshot pass for ``spec`` on server ``srvid``.

    ``capture`` defaults to the staging table filtered to srvid (the remote
    path); a local datasource can pass its own source DataFrame (the
    version-shimmed reader, sources/readers.py).

    ``idempotent``: replaying a staging batch must not double-count.  The
    reference gets this by truncating staging inside the same transaction
    (powa--5.2.0.sql:4102-4104); without that atomicity, capture rows
    IDENTICAL to a row already in the server's current partition are
    skipped (null-safe full-row anti-join against the small
    between-coalesce current slice).  Staging rows are immutable
    samples, so an exact duplicate can only be a replay; keying on
    anything coarser (ts alone, or even (ts, entity keys) for keyless
    modules) silently drops the remainder of a snapshot whose rows
    arrive split across two batches (streaming epochs split on file
    boundaries).  When a batch partially overlaps an existing snapshot
    ts, the per-db rollup for the affected ts values is RECOMPUTED from
    the updated current slice instead of appended — an appended partial
    rollup would leave two half-sums for one (dbid, ts).  When the
    anti-join finds NO new rows but the capture is non-empty (a pure
    replay — e.g. a crash landed after the current-table append but
    before the db-rollup write), the rollup for the capture's ts values
    is still recomputed from the current slice so the replay CONVERGES:
    without this, a lost rollup write would be skipped forever because
    the ``n > 0`` gate never reopens (ADVICE r4 fix).

    Returns the number of captured rows (the reference's ``final`` count,
    powa--5.2.0.sql:4095-4100).
    """
    if capture is None:
        staging = wh.read(Warehouse.src_tmp(spec.name), spec.staging_schema)
        capture = staging.filter(F.col("srvid") == srvid)

    # cast EVERY column to the current-table schema, not just srvid: a
    # caller-provided capture with off-spec dtypes (int32 keys, double
    # counters, NTZ timestamps) would otherwise append mixed-type
    # parquet files next to the spec-typed ones and break every later
    # read of the partition
    cur_types = {f.name: f.dataType for f in spec.current_schema.fields}
    capture = capture.select(
        *[
            F.col(name).cast(cur_types[name]).alias(name)
            for name in ["srvid", *spec.key_names, "ts", *spec.counter_names]
        ]
    )
    if spec.requires_statements:
        from . import dictionary

        capture = dictionary.gate_to_statements(wh, srvid, capture)
    capture = capture.cache()
    current_t = Warehouse.current(spec.name)
    overlap_ts: list | None = None
    new_rows = capture
    try:
        if idempotent and wh.exists(current_t):
            existing = (
                wh.read(current_t, spec.current_schema)
                .filter(F.col("srvid") == srvid)
            )
            cap_a, ex_a = capture.alias("c"), existing.alias("e")
            same_row = None
            for cname in capture.columns:
                eq = F.col(f"c.{cname}").eqNullSafe(F.col(f"e.{cname}"))
                same_row = eq if same_row is None else (same_row & eq)
            new_rows = cap_a.join(
                F.broadcast(ex_a), same_row, "left_anti"
            ).cache()
            n = new_rows.count()
            if n > 0:
                # snapshot timestamps this batch SHARES with committed
                # rows: their rollups must be recomputed, not appended
                overlap_ts = [
                    r.ts
                    for r in capture.select("ts").distinct()
                    .join(existing.select("ts").distinct(), "ts", "left_semi")
                    .collect()
                ]
        else:
            new_rows = capture
            n = capture.count()
        if n > 0:
            wh.append(new_rows, current_t, partition_by=["srvid"])
            if spec.db_rollup:
                db_t = Warehouse.current_db(spec.name)
                if overlap_ts:
                    updated = (
                        wh.read(current_t, spec.current_schema)
                        .filter(F.col("srvid") == srvid)
                        .filter(F.col("ts").isin(overlap_ts))
                    )
                    fresh = db_rollup_agg(updated, spec).unionByName(
                        db_rollup_agg(
                            new_rows.filter(~F.col("ts").isin(overlap_ts)),
                            spec,
                        )
                    )
                    if wh.exists(db_t):
                        kept = wh.read(db_t).filter(
                            (F.col("srvid") == srvid)
                            & ~F.col("ts").isin(overlap_ts)
                        )
                        fresh = kept.unionByName(fresh)
                    wh.rewrite_srvid_partition(fresh, db_t, None, srvid)
                else:
                    wh.append(
                        db_rollup_agg(new_rows, spec),
                        db_t,
                        partition_by=["srvid"],
                    )
        elif idempotent and spec.db_rollup and wh.exists(current_t):
            # pure replay (capture non-empty, zero new rows): every row
            # is already committed in current, but the ROLLUP write for
            # this batch may have been lost to a crash between the two
            # appends.  Recompute the rollup for the capture's ts values
            # from the authoritative current slice — a fixpoint, so a
            # healthy replay rewrites identical rows and a crashed one
            # heals (ADVICE r4: the n>0 gate must not be the only way
            # the rollup converges).
            cap_ts = [r.ts for r in capture.select("ts").distinct().collect()]
            if cap_ts:
                db_t = Warehouse.current_db(spec.name)
                updated = (
                    wh.read(current_t, spec.current_schema)
                    .filter(F.col("srvid") == srvid)
                    .filter(F.col("ts").isin(cap_ts))
                )
                fresh = db_rollup_agg(updated, spec)
                if wh.exists(db_t):
                    kept = wh.read(db_t).filter(
                        (F.col("srvid") == srvid) & ~F.col("ts").isin(cap_ts)
                    )
                    fresh = kept.unionByName(fresh)
                wh.rewrite_srvid_partition(fresh, db_t, None, srvid)
        if drop_staging and wh.exists(Warehouse.src_tmp(spec.name)):
            # staging truncate per srvid (powa--5.2.0.sql:4102-4104)
            wh.drop_srvid(Warehouse.src_tmp(spec.name), srvid)
        return n
    finally:
        if new_rows is not capture:
            new_rows.unpersist()
        capture.unpersist()
