"""Scheduler drift-freedom, snapshot replay idempotency, and the
orchestrator's databases integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from powa_archivist_spark.operators import databases as dbs
from powa_archivist_spark.operators.snapshot import snapshot
from powa_archivist_spark.orchestrator import Orchestrator, ServerConfig
from powa_archivist_spark.scheduler import run_loop
from powa_archivist_spark.specs import PG_STAT_BGWRITER
from powa_archivist_spark.storage import Warehouse

from .conftest import ts

SPEC = PG_STAT_BGWRITER


class FakeClock:
    """Clock advanced by sleep() AND by simulated work inside passes."""

    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_drift_free_schedule(spark, wh):
    orch = Orchestrator(wh, specs={SPEC.name: SPEC})
    server = ServerConfig(srvid=0, frequency_s=10)
    clock = FakeClock()
    calls = []

    real_take = orch.take_snapshot

    def slow_take(*a, **k):
        calls.append(clock.t)
        clock.t += 13.0 if len(calls) == 2 else 2.0  # pass 2 overruns
        return real_take(*a, **k)

    orch.take_snapshot = slow_take
    starts = run_loop(orch, server, max_passes=4, clock=clock,
                      sleep=clock.sleep)
    # scheduled grid stays at exact multiples of the frequency: the
    # 13s overrun of pass 2 does not shift passes 3/4
    assert starts == [1000.0, 1010.0, 1020.0, 1030.0]
    # pass 3 started late (23s into its slot -> immediately), pass 4 on time
    assert calls[2] > 1020.0 and calls[3] == 1030.0


def test_snapshot_replay_is_idempotent(spark, wh):
    cap = spark.createDataFrame(
        [(0, ts(0), 110, 50, 105, 10, 200)], SPEC.staging_schema
    )
    assert snapshot(wh, SPEC, 0, capture=cap) == 1
    # replaying the SAME batch (same ts) appends nothing
    assert snapshot(wh, SPEC, 0, capture=cap) == 0
    assert wh.read(Warehouse.current(SPEC.name)).count() == 1
    # a new ts still lands
    cap2 = spark.createDataFrame(
        [(0, ts(5), 120, 55, 110, 12, 220)], SPEC.staging_schema
    )
    assert snapshot(wh, SPEC, 0, capture=cap2) == 1
    assert wh.read(Warehouse.current(SPEC.name)).count() == 2


def test_qualstats_gated_to_known_statements(spark, wh):
    """J2: qualstats rows referencing unknown statements are dropped
    (mirrors 02_remote_api.sql's missing-FK tolerance)."""
    from powa_archivist_spark.operators import dictionary
    from powa_archivist_spark.specs import QUALSTATS_SPEC as QUALSTATS

    cap = spark.createDataFrame(
        [(100, 10, 5, "SELECT a", ts(0))],
        "queryid long, dbid long, userid long, query string, ts timestamp",
    )
    dictionary.merge_statements(wh, 1, cap, now=ts(0))

    rows = [
        # (srvid, ts, qualid, queryid, dbid, userid, counters...)
        (1, ts(0), 7, 100, 10, 5, 4, 10, 2, 1.0, 1.0),   # known statement
        (1, ts(0), 8, 999, 10, 5, 4, 10, 2, 1.0, 1.0),   # unknown queryid
    ]
    staged = spark.createDataFrame(rows, QUALSTATS.staging_schema)
    n = snapshot(wh, QUALSTATS, 1, capture=staged)
    assert n == 1
    kept = wh.read(Warehouse.current(QUALSTATS.name)).collect()
    assert [r.qualid for r in kept] == [7]


def test_statements_remote_path_populates_dictionary(spark, wh):
    """The staging (remote) path must feed the dictionary merge from the
    SAME capture the snapshot consumes: staging carries the `query` text
    column (powa_statements_src_tmp, powa--5.2.0.sql:1987) that the
    history tables drop, and the merge must happen against the staging
    slice — not a re-read of the just-written current table."""
    from powa_archivist_spark.operators import dictionary
    from powa_archivist_spark.sources.readers import shim_to_schema
    from powa_archivist_spark.specs import STATEMENTS

    small = spark.createDataFrame(
        [(1, ts(0), 100, 10, True, 5, "SELECT a", 3, 1.5),
         (1, ts(0), 101, 10, True, 5, "SELECT b", 2, 0.5)],
        "srvid int, ts timestamp, queryid long, dbid long, toplevel boolean, "
        "userid long, query string, calls long, total_exec_time double",
    )
    staged = shim_to_schema(small, STATEMENTS.staging_schema)
    wh.append(staged, Warehouse.src_tmp(STATEMENTS.name), partition_by=["srvid"])

    orch = Orchestrator(wh, specs={STATEMENTS.name: STATEMENTS})
    errs = orch.take_snapshot(ServerConfig(srvid=1), now=ts(0))
    assert errs == 0, orch.read_metas(1)["errors"]
    cur = wh.read(Warehouse.current(STATEMENTS.name))
    assert cur.count() == 2 and "query" not in cur.columns
    d = {r.queryid: r.query
         for r in dictionary.read_statements(wh, 1).collect()}
    assert d == {100: "SELECT a", 101: "SELECT b"}
    # staging drained by the snapshot (powa--5.2.0.sql:4102-4104)
    assert not wh.exists(Warehouse.src_tmp(STATEMENTS.name))


def test_qualstats_end_to_end_snapshot(spark, wh):
    """The wired powa_qualstats_snapshot pipeline
    (powa--5.2.0.sql:7104-7184): staging -> statements gate -> quals-atom
    dedup -> per-qual rollup -> constvalues, then staging drain
    (pattern of sql/02_remote_api.sql:11-21)."""
    from powa_archivist_spark.operators import dictionary
    from powa_archivist_spark.operators import qualstats as qs
    from powa_archivist_spark.specs import QUALSTATS_SPEC

    cap = spark.createDataFrame(
        [(100, 10, 5, "SELECT a", ts(0))],
        "queryid long, dbid long, userid long, query string, ts timestamp",
    )
    dictionary.merge_statements(wh, 1, cap, now=ts(0))

    rows = [
        # two plan instances (uniquequalnodeid) of the same qual 70
        (1, ts(0), 7001, 10, 5, 70, 2, 10, 4, 1.5, 2.0, 100,
         ["42"], [(1259, 1, 96, "f"), (1259, 2, 97, "f")]),
        (1, ts(0), 7002, 10, 5, 70, 3, 20, 6, 1.5, 2.0, 100,
         ["43"], [(1259, 1, 96, "f")]),
        # unknown queryid 999 -> dropped by the statements gate
        (1, ts(0), 8001, 10, 5, 80, 1, 5, 1, 9.0, 9.0, 999,
         ["x"], [(1259, 3, 96, "f")]),
    ]
    staged = spark.createDataFrame(rows, qs.SRC_SCHEMA)
    wh.append(staged, Warehouse.src_tmp(QUALSTATS_SPEC.name),
              partition_by=["srvid"])

    assert qs.qualstats_snapshot(wh, 1) == 2  # gate dropped the third row

    # quals dictionary: one row, atoms deduped across plan instances
    quals = qs.read_quals(wh, 1).collect()
    assert len(quals) == 1
    q = quals[0]
    assert (q.qualid, q.queryid, q.dbid, q.userid) == (70, 100, 10, 5)
    assert sorted((a.attnum, a.opno) for a in q.quals) == [(1, 96), (2, 97)]

    # per-qual rollup: SUM counters, AVG estimates (:7148-7152)
    cur = wh.read(Warehouse.current(QUALSTATS_SPEC.name)).collect()
    assert len(cur) == 1
    r = cur[0]
    assert (r.occurences, r.execution_count, r.nbfiltered) == (5, 30, 10)
    assert (r.mean_err_estimate_ratio, r.mean_err_estimate_num) == (1.5, 2.0)

    # raw constvalues land per plan instance (:7156-7166)
    assert qs.constvalues_current(wh, 1).count() == 2

    # staging drained; replay ingests nothing
    assert qs.qualstats_snapshot(wh, 1) == 0

    qs.reset_qualstats(wh, 1)
    assert qs.read_quals(wh, 1).count() == 0


def test_qualstats_aggregate_packs_constvalues(spark, wh):
    """powa_qualstats_aggregate constvalues half (powa--5.2.0.sql:
    7193-7233 via :6924-6982): the per-snapshot constvalues rows
    collapse into ONE history row per qual with six ranked arrays and
    the covered range, and the current table drains."""
    from powa_archivist_spark.operators import qualstats as qs

    def cv_row(t, cv, occ, execc, filt):
        return (1, 70, 100, 10, 5, t, occ, execc, filt, 1.5, 2.0, [cv])

    schema = (
        "srvid int, qualid long, queryid long, dbid long, userid long, "
        "ts timestamp, occurences long, execution_count long, "
        "nbfiltered long, mean_err_estimate_ratio double, "
        "mean_err_estimate_num double, constvalues array<string>"
    )
    rows = [
        # constvalue "42": seen twice, most occurences, lowest
        # filtered ratio (6/40)
        cv_row(ts(0), "42", 4, 30, 4),
        cv_row(ts(5), "42", 3, 10, 2),
        # constvalue "43": fewer occurences, highest ratio (9/10)
        cv_row(ts(5), "43", 2, 10, 9),
    ]
    wh.append(spark.createDataFrame(rows, schema), qs.CONSTVALUES_TABLE,
              partition_by=["srvid"])

    assert qs.qualstats_aggregate(wh, 1) == 1

    hist = qs.constvalues_history(wh, 1).collect()
    assert len(hist) == 1
    h = hist[0]
    assert (h.qualid, h.queryid, h.dbid, h.userid) == (70, 100, 10, 5)
    # range spans the two snapshots, inclusive
    assert h.range_start == ts(0).replace(tzinfo=None) or h.range_start == ts(0)
    assert h.range_end == ts(5).replace(tzinfo=None) or h.range_end == ts(5)
    # pre-agg summed per constvalue, rankings ordered correctly
    used = [(r.constvalues, r.sum_occurences) for r in h.most_used]
    assert used == [(["42"], 7), (["43"], 2)]
    filt = [r.constvalues for r in h.most_filtering]
    assert filt == [["43"], ["42"]]          # 0.9 > 6/40
    assert [r.constvalues for r in h.least_filtering] == [["42"], ["43"]]
    # current drained (DELETE FROM ..._current WHERE srvid, :7230)
    assert qs.constvalues_current(wh, 1).count() == 0
    # idempotent on empty current
    assert qs.qualstats_aggregate(wh, 1) == 0

    qs.reset_qualstats(wh, 1)
    assert not wh.exists(qs.CONSTVALUES_HISTORY_TABLE) or (
        qs.constvalues_history(wh, 1).count() == 0
    )


def test_wait_sampling_dbid_resolution(spark, wh):
    """J8 wired into the wait_sampling snapshot path: raw per-pid
    samples carry no dbid; it resolves via DISTINCT (dbid, queryid) off
    the statements dictionary, unknown -> 0, dropped dbs excluded,
    counts pre-summed (powa--5.2.0.sql:7315-7334)."""
    from powa_archivist_spark.operators import databases as dbs
    from powa_archivist_spark.operators import dictionary
    from powa_archivist_spark.specs import WAIT_SAMPLING

    # statements dictionary: queryid 100 in db 10 (two users -> the
    # DISTINCT matters), queryid 200 in dropped db 66
    cap = spark.createDataFrame(
        [(100, 10, 5, "SELECT a", ts(0)), (100, 10, 6, "SELECT a", ts(0)),
         (200, 66, 5, "SELECT b", ts(0))],
        "queryid long, dbid long, userid long, query string, ts timestamp",
    )
    dictionary.merge_statements(wh, 1, cap, now=ts(0))
    dbs.databases_snapshot(wh, 1, spark.createDataFrame(
        [(10, "app"), (66, "legacy")], "oid long, datname string"), now=ts(0))
    dbs.databases_snapshot(wh, 1, spark.createDataFrame(
        [(10, "app")], "oid long, datname string"), now=ts(5))  # 66 dropped

    samples = spark.createDataFrame(
        [(ts(5), "LWLock", "WALWriteLock", 100, 3),
         (ts(5), "LWLock", "WALWriteLock", 100, 4),   # same key -> summed
         (ts(5), "IO", "DataFileRead", 999, 7),       # unknown -> dbid 0
         (ts(5), "IO", "DataFileRead", 200, 5),       # dropped db -> excluded
         (ts(5), None, "x", 100, 1)],                 # NULL event_type -> out
        "ts timestamp, event_type string, event string, queryid long, "
        "count long",
    )
    orch = Orchestrator(wh, specs={WAIT_SAMPLING.name: WAIT_SAMPLING})
    errs = orch.take_snapshot(ServerConfig(srvid=1, powa_coalesce=5),
                              captures={WAIT_SAMPLING.name: samples},
                              now=ts(5))
    assert errs == 0, orch.read_metas(1)["errors"]
    rows = {(r.dbid, r.event_type, r.event, r.queryid): int(r["count"])
            for r in wh.read(Warehouse.current(WAIT_SAMPLING.name)).collect()}
    assert rows == {
        (10, "LWLock", "WALWriteLock", 100): 7,
        (0, "IO", "DataFileRead", 999): 7,
    }


def test_metas_df_surfaces_errors_ledger(spark, wh):
    """powa_snapshot_metas as a DataFrame view: failed datasources must
    surface in the errors array (powa--5.2.0.sql:908-918)."""
    orch = Orchestrator(wh, specs={SPEC.name: SPEC})

    class Boom:
        def select(self, *a, **k):
            raise RuntimeError("datasource exploded")

    orch.take_snapshot(ServerConfig(srvid=2),
                       captures={SPEC.name: Boom()}, now=ts(0))
    row = orch.read_metas_df().filter(F.col("srvid") == 2).collect()[0]
    assert row.coalesce_seq == 1
    assert row.snapts is not None
    assert any("pg_stat_bgwriter" in e for e in row.errors)


def test_orchestrator_runs_databases_first_and_purges(spark, wh):
    orch = Orchestrator(wh, specs={SPEC.name: SPEC})
    server = ServerConfig(srvid=1, powa_coalesce=5)
    feed = spark.createDataFrame([(10, "app")], "oid long, datname string")
    cap = spark.createDataFrame(
        [(1, ts(0), 110, 50, 105, 10, 200)], SPEC.staging_schema
    )
    errs = orch.take_snapshot(
        server, captures={"databases": feed, SPEC.name: cap}, now=ts(0)
    )
    assert errs == 0
    assert {r.oid for r in dbs.read_databases(wh, 1).collect()} == {10}
    # reset clears the dimension too
    orch.reset_server(server)
    assert wh.read(dbs.TABLE, dbs.SCHEMA).count() == 0


def test_overrun_pass_stamps_execution_time(spark, wh):
    """Snapshots are stamped with the actual execution clock (reference
    powa_take_snapshot uses now()), not the scheduled grid slot: after
    an overrun, a catch-up pass samples near-now counters, and a
    grid-time stamp would warp every diff/rate around the hiccup."""
    orch = Orchestrator(wh, specs={SPEC.name: SPEC})
    server = ServerConfig(srvid=0, frequency_s=10)
    clock = FakeClock()
    stamped = []

    real_take = orch.take_snapshot

    def slow_take(*a, **k):
        stamped.append(k["now"].timestamp())
        clock.t += 25.0 if len(stamped) == 1 else 1.0  # pass 1 overruns 2 slots
        return real_take(*a, **k)

    orch.take_snapshot = slow_take
    run_loop(orch, server, max_passes=3, clock=clock, sleep=clock.sleep)
    assert stamped[0] == 1000.0
    # catch-up passes run back-to-back at ~1025/1026, NOT at grid 1010/1020
    assert stamped[1] == 1025.0
    assert stamped[2] == 1026.0


def test_crash_between_append_and_merge_replays_exactly_once(spark, wh,
                                                             monkeypatch):
    """VERDICT r4 item 4: process death between the statements history
    append and the dictionary merge.  The begin-marker (txn.py) must
    survive as proof, the staging slice must survive as the replay
    source (truncate-last), and the NEXT pass must converge: exactly-once
    current rows, dictionary populated, staging drained, marker gone."""
    from powa_archivist_spark.operators import dictionary
    from powa_archivist_spark.sources.readers import shim_to_schema
    from powa_archivist_spark.specs import STATEMENTS

    small = spark.createDataFrame(
        [(1, ts(0), 100, 10, True, 5, "SELECT a", 3, 1.5),
         (1, ts(0), 101, 10, True, 5, "SELECT b", 2, 0.5)],
        "srvid int, ts timestamp, queryid long, dbid long, toplevel boolean, "
        "userid long, query string, calls long, total_exec_time double",
    )
    staged = shim_to_schema(small, STATEMENTS.staging_schema)
    wh.append(staged, Warehouse.src_tmp(STATEMENTS.name),
              partition_by=["srvid"])
    orch = Orchestrator(wh, specs={STATEMENTS.name: STATEMENTS})

    # simulate the kill: merge raises a BaseException that the
    # per-datasource `except Exception` trapping does NOT swallow —
    # the pass dies exactly between the append and the merge
    def die(*a, **k):
        raise KeyboardInterrupt("process killed mid-pass")

    monkeypatch.setattr(dictionary, "merge_statements", die)
    try:
        orch.take_snapshot(ServerConfig(srvid=1), now=ts(0))
        raise AssertionError("kill did not propagate")
    except KeyboardInterrupt:
        pass
    monkeypatch.undo()

    # crash evidence: marker pending, staging intact — and since r6 the
    # history append is STAGED into the same pass as the merge
    # (txn.StagedPass co-commit), so a kill between them leaves NO
    # visible append either: a concurrent reader sees the pre-pass
    # state, not a half-applied snapshot
    assert len(orch.txns.pending(1)) == 1
    assert wh.read(Warehouse.src_tmp(STATEMENTS.name)).count() == 2
    assert not wh.exists(Warehouse.current(STATEMENTS.name))
    # the dictionary merge never ran
    assert dictionary.read_statements(wh, 1).count() == 0

    # replay pass: detected + converged
    errs = orch.take_snapshot(ServerConfig(srvid=1), now=ts(5))
    meta = orch.read_metas(1)
    assert any("interrupted pass" in e for e in meta["errors"])
    assert errs == len(meta["errors"])
    # exactly-once: the replay is the FIRST publish of these rows
    cur = wh.read(Warehouse.current(STATEMENTS.name))
    assert cur.count() == 2
    d = {r.queryid: r.query
         for r in dictionary.read_statements(wh, 1).collect()}
    assert d == {100: "SELECT a", 101: "SELECT b"}
    # staging drained, marker gone: the logical txn finally committed
    assert not wh.exists(Warehouse.src_tmp(STATEMENTS.name))
    assert orch.txns.pending(1) == []
