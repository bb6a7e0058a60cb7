"""Per-module versioned source layouts — the DATA behind the reference's
version-branched ``powa_stat_*_src`` functions (powa--5.2.0.sql:4315-5547).

Each module gets a :class:`~.readers.VersionedSource` whose variants are
:class:`~.readers.SourceLayout` rows keyed by ``min_version`` (pg version
num format).  Resolution picks the newest layout not newer than the
monitored server (``ORDER BY min_version DESC LIMIT 1`` semantics,
powa--5.2.0.sql:421-422); columns a layout doesn't list get the generic
typed shim (``0::bigint`` / ``NULL::pg_lsn`` padding); a server older
than every layout yields an EMPTY capture — the reference's
``WHERE false`` branches for views that don't exist yet.

Layouts mirror the reference branch-by-branch; each variant cites the
``powa--5.2.0.sql`` lines it encodes.  Layout epochs below the module's
registry ``min_version`` (powa_modules, registry calls 1656-1938) are
kept where the reference keeps them: the repository server may be newer
than a monitored remote, and the collector supports the old shape.
"""

from __future__ import annotations

from .readers import SourceLayout, VersionedSource

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _vs(name: str, *variants: tuple[int, SourceLayout]) -> VersionedSource:
    src = VersionedSource(name)
    for min_version, layout in variants:
        src.add(min_version, layout)
    return src


def _cols(names: str) -> tuple[str, ...]:
    return tuple(names.split())


# ---------------------------------------------------------------------------
# the 16 generic modules
# ---------------------------------------------------------------------------

_SLOT_BASE = "slot_name plugin slot_type datoid cur_txid current_lsn active"

PG_REPLICATION_SLOTS_SRC = _vs(
    "pg_replication_slots",
    # pg9.4 (4449-4461): no active_pid / temporary / confirmed_flush_lsn;
    # temporary/two_phase/conflicting are literal false, not NULL
    (90400, SourceLayout(_cols(
        _SLOT_BASE + " slot_xmin catalog_xmin restart_lsn"),
        defaults={"temporary": False, "two_phase": False,
                  "conflicting": False})),
    # pg9.5 (4435-4448): active_pid added
    (90500, SourceLayout(_cols(
        _SLOT_BASE + " active_pid slot_xmin catalog_xmin restart_lsn"),
        defaults={"temporary": False, "two_phase": False,
                  "conflicting": False})),
    # pg9.6 (4421-4434): confirmed_flush_lsn added
    (90600, SourceLayout(_cols(
        _SLOT_BASE + " active_pid slot_xmin catalog_xmin restart_lsn "
        "confirmed_flush_lsn"),
        defaults={"temporary": False, "two_phase": False,
                  "conflicting": False})),
    # pg10 (4407-4420): temporary added
    (100000, SourceLayout(_cols(
        _SLOT_BASE + " temporary active_pid slot_xmin catalog_xmin "
        "restart_lsn confirmed_flush_lsn"),
        defaults={"two_phase": False, "conflicting": False})),
    # pg13 (4395-4406): wal_status + safe_wal_size added
    (130000, SourceLayout(_cols(
        _SLOT_BASE + " temporary active_pid slot_xmin catalog_xmin "
        "restart_lsn confirmed_flush_lsn wal_status safe_wal_size"),
        defaults={"two_phase": False, "conflicting": False})),
    # pg14 (4383-4394): two_phase added
    (140000, SourceLayout(_cols(
        _SLOT_BASE + " temporary active_pid slot_xmin catalog_xmin "
        "restart_lsn confirmed_flush_lsn wal_status safe_wal_size two_phase"),
        defaults={"conflicting": False})),
    # pg16 (4371-4382): conflicting added — the full layout
    (160000, SourceLayout(_cols(
        _SLOT_BASE + " temporary active_pid slot_xmin catalog_xmin "
        "restart_lsn confirmed_flush_lsn wal_status safe_wal_size two_phase "
        "conflicting"))),
)

_ACTIVITY_BASE = (
    "cur_txid datid pid usesysid application_name client_addr backend_start "
    "xact_start query_start state_change state backend_xid backend_xmin "
    "clock_ts"
)

PG_STAT_ACTIVITY_SRC = _vs(
    "pg_stat_activity",
    # pg9.4 (4550-4560): no backend_type / leader_pid / query_id
    (90400, SourceLayout(_cols(_ACTIVITY_BASE))),
    # pg10 (4539-4549): backend_type added
    (100000, SourceLayout(_cols(_ACTIVITY_BASE + " backend_type"))),
    # pg13 (4528-4538): leader_pid added
    (130000, SourceLayout(_cols(
        _ACTIVITY_BASE + " backend_type leader_pid"))),
    # pg14 (4517-4527): query_id added — the full layout
    (140000, SourceLayout(_cols(
        _ACTIVITY_BASE + " backend_type leader_pid query_id"))),
)

PG_STAT_ARCHIVER_SRC = _vs(
    "pg_stat_archiver",
    # single layout, all versions (4578-4620; only the current-WAL-name
    # helper call differs below pg10)
    (90400, SourceLayout(_cols(
        "current_wal archived_count last_archived_wal last_archived_time "
        "failed_count last_failed_wal last_failed_time"))),
)

PG_STAT_BGWRITER_SRC = _vs(
    "pg_stat_bgwriter",
    # layout is version-stable; on pg17+ the collector derives
    # buffers_backend / buffers_backend_fsync from pg_stat_io
    # ('client backend' writes+extends / fsyncs) because the columns left
    # pg_stat_bgwriter (4631-4663) — same staging shape either way
    (90400, SourceLayout(_cols(
        "buffers_clean maxwritten_clean buffers_backend "
        "buffers_backend_fsync buffers_alloc"))),
)

PG_STAT_CHECKPOINTER_SRC = _vs(
    "pg_stat_checkpointer",
    # pre-pg17 (4684-4691): simulated from pg_stat_bgwriter's
    # checkpoint columns — a pure rename map
    (90400, SourceLayout(
        (),
        renames={
            "num_timed": "checkpoints_timed",
            "num_requested": "checkpoints_req",
            "write_time": "checkpoint_write_time",
            "sync_time": "checkpoint_sync_time",
            "buffers_written": "buffers_checkpoint",
        },
    )),
    # pg17+ (4677-4682): native pg_stat_checkpointer view
    (170000, SourceLayout(_cols(
        "num_timed num_requested write_time sync_time buffers_written"))),
)

_DB_BASE = (
    "datid numbackends xact_commit xact_rollback blks_read blks_hit "
    "tup_returned tup_fetched tup_inserted tup_updated tup_deleted conflicts "
    "temp_files temp_bytes deadlocks blk_read_time blk_write_time stats_reset"
)

PG_STAT_DATABASE_SRC = _vs(
    "pg_stat_database",
    # pre-pg12 (4768-4782): no checksum_* / session stats;
    # checksum_failures is literal 0 (:4773), the rest NULL
    (90400, SourceLayout(_cols(_DB_BASE),
                         defaults={"checksum_failures": 0})),
    # pg12 (4751-4766): checksum_failures + checksum_last_failure added
    (120000, SourceLayout(_cols(
        _DB_BASE + " checksum_failures checksum_last_failure"))),
    # pg14 (4737-4750): session/active/idle times + sessions_* added
    (140000, SourceLayout(_cols(
        _DB_BASE + " checksum_failures checksum_last_failure session_time "
        "active_time idle_in_transaction_time sessions sessions_abandoned "
        "sessions_fatal sessions_killed"))),
)

PG_STAT_DATABASE_CONFLICTS_SRC = _vs(
    "pg_stat_database_conflicts",
    # pre-pg16 (4824-4830): no confl_active_logicalslot
    (90400, SourceLayout(_cols(
        "datid confl_tablespace confl_lock confl_snapshot confl_bufferpin "
        "confl_deadlock"),
        defaults={"confl_active_logicalslot": 0})),
    # pg16 (4816-4822): confl_active_logicalslot added
    (160000, SourceLayout(_cols(
        "datid confl_tablespace confl_lock confl_snapshot confl_bufferpin "
        "confl_deadlock confl_active_logicalslot"))),
)

_IO_BASE = (
    "backend_type object context reads read_time writes write_time "
    "writebacks writeback_time extends extend_time hits evictions reuses "
    "fsyncs fsync_time stats_reset"
)

PG_STAT_IO_SRC = _vs(
    "pg_stat_io",
    # view introduced pg16 (4875-4895): op_bytes present, no *_bytes split
    (160000, SourceLayout(_cols(_IO_BASE + " op_bytes"),
        defaults={"read_bytes": 0, "write_bytes": 0, "extend_bytes": 0})),
    # pg18 (4858-4873): op_bytes split into read/write/extend_bytes
    (180000, SourceLayout(_cols(
        _IO_BASE + " read_bytes write_bytes extend_bytes"),
        defaults={"op_bytes": 0})),
    # pg15-: no variant -> empty capture (4897-4918 WHERE false)
)

PG_STAT_LOCK_SRC = _vs(
    "pg_stat_lock",
    # view only exists on pg19+ (4946-4953); older -> empty (4955-4961)
    (190000, SourceLayout(_cols(
        "locktype waits wait_time fastpath_exceeded stats_reset"))),
)

PG_STAT_RECOVERY_SRC = _vs(
    "pg_stat_recovery",
    # view only exists on pg19+ (4995-5006); older -> empty (5007-5018)
    (190000, SourceLayout(_cols(
        "last_replayed_read_lsn last_replayed_end_lsn last_replayed_tli "
        "replay_end_lsn replay_end_tli recovery_last_xact_time "
        "current_chunk_start_time pause_state"))),
)

_REPL_BASE = (
    "current_lsn pid usename application_name client_addr backend_start "
    "backend_xmin state sync_priority sync_state"
)

PG_STAT_REPLICATION_SRC = _vs(
    "pg_stat_replication",
    # pg9.4 (5108-5121): *_location names, no lag fields / reply_time
    (90400, SourceLayout(
        _cols(_REPL_BASE),
        renames={
            "sent_lsn": "sent_location",
            "write_lsn": "write_location",
            "flush_lsn": "flush_location",
            "replay_lsn": "replay_location",
        },
    )),
    # pg10 (5097-5106): *_lsn renames + lag fields added
    (100000, SourceLayout(_cols(
        _REPL_BASE + " sent_lsn write_lsn flush_lsn replay_lsn write_lag "
        "flush_lag replay_lag"))),
    # pg12 (5086-5095): reply_time added — the full layout
    (120000, SourceLayout(_cols(
        _REPL_BASE + " sent_lsn write_lsn flush_lsn replay_lsn write_lag "
        "flush_lag replay_lag reply_time"))),
)

PG_STAT_SLRU_SRC = _vs(
    "pg_stat_slru",
    # view introduced pg13 (5144-5151); older -> empty (5152-5161)
    (130000, SourceLayout(_cols(
        "name blks_zeroed blks_hit blks_read blks_written blks_exists "
        "flushes truncates stats_reset"))),
)

_SUB_BASE = (
    "subid subname pid relid received_lsn last_msg_send_time "
    "last_msg_receipt_time latest_end_lsn latest_end_time"
)

PG_STAT_SUBSCRIPTION_SRC = _vs(
    "pg_stat_subscription",
    # view introduced pg10 (5221-5231): no leader_pid, worker_type
    # defaulted to 'apply' (the only worker kind then)
    (100000, SourceLayout(_cols(_SUB_BASE),
                          defaults={"worker_type": "apply"})),
    # pg16 (5210-5220): leader_pid added, worker_type still literal
    (160000, SourceLayout(_cols(_SUB_BASE + " leader_pid"),
                          defaults={"worker_type": "apply"})),
    # pg17 (5199-5209): native worker_type — the full layout
    (170000, SourceLayout(_cols(
        _SUB_BASE + " leader_pid worker_type"))),
)

PG_STAT_SUBSCRIPTION_STATS_SRC = _vs(
    "pg_stat_subscription_stats",
    # view introduced pg15 (5319-5333): apply/sync error counts only,
    # sync_error_count under its pre-rename name
    (150000, SourceLayout(
        _cols("subid apply_error_count stats_reset"),
        renames={"sync_table_error_count": "sync_error_count"},
        defaults={"sync_seq_error_count": 0, "confl_insert_exists": 0,
                  "confl_update_origin_differs": 0, "confl_update_exists": 0,
                  "confl_update_deleted": 0, "confl_update_missing": 0,
                  "confl_delete_origin_differs": 0, "confl_delete_missing": 0,
                  "confl_multiple_unique_conflicts": 0},
    )),
    # pg18 (5301-5317): confl_* columns added (minus confl_update_deleted)
    (180000, SourceLayout(
        _cols("subid apply_error_count stats_reset confl_insert_exists "
              "confl_update_origin_differs confl_update_exists "
              "confl_update_missing confl_delete_origin_differs "
              "confl_delete_missing confl_multiple_unique_conflicts"),
        renames={"sync_table_error_count": "sync_error_count"},
        defaults={"sync_seq_error_count": 0, "confl_update_deleted": 0},
    )),
    # pg19 (5285-5299): rename lands + sync_seq_error_count +
    # confl_update_deleted — the full layout
    (190000, SourceLayout(_cols(
        "subid apply_error_count sync_table_error_count stats_reset "
        "sync_seq_error_count confl_insert_exists "
        "confl_update_origin_differs confl_update_exists "
        "confl_update_deleted confl_update_missing "
        "confl_delete_origin_differs confl_delete_missing "
        "confl_multiple_unique_conflicts"))),
)

PG_STAT_WAL_SRC = _vs(
    "pg_stat_wal",
    # view introduced pg14 (5393-5401)
    (140000, SourceLayout(_cols(
        "wal_records wal_fpi wal_bytes wal_buffers_full wal_write wal_sync "
        "wal_write_time wal_sync_time stats_reset"))),
    # pg18 (5382-5391): IO counters moved to pg_stat_io -> zero-shimmed
    (180000, SourceLayout(_cols(
        "wal_records wal_fpi wal_bytes wal_buffers_full stats_reset"),
        defaults={"wal_write": 0, "wal_sync": 0,
                  "wal_write_time": 0.0, "wal_sync_time": 0.0})),
)

_WR_BASE = (
    "slot_name pid status receive_start_lsn receive_start_tli "
    "last_received_lsn received_tli last_msg_send_time "
    "last_msg_receipt_time latest_end_lsn latest_end_time conninfo"
)

PG_STAT_WAL_RECEIVER_SRC = _vs(
    "pg_stat_wal_receiver",
    # pg9.6 (5494-5512): no sender_host/port, received_lsn feeds
    # flushed_lsn, no written_lsn
    (90600, SourceLayout(_cols(_WR_BASE),
                         renames={"flushed_lsn": "received_lsn"})),
    # pg11 (5476-5493): sender_host + sender_port added
    (110000, SourceLayout(_cols(_WR_BASE + " sender_host sender_port"),
                          renames={"flushed_lsn": "received_lsn"})),
    # pg13 (5457-5474): received_lsn split into written_lsn/flushed_lsn —
    # the full layout
    (130000, SourceLayout(_cols(
        _WR_BASE + " sender_host sender_port written_lsn flushed_lsn"))),
)

#: dispatch table: module name -> versioned source layouts
MODULE_SOURCES: dict[str, VersionedSource] = {
    s.name: s
    for s in [
        PG_REPLICATION_SLOTS_SRC,
        PG_STAT_ACTIVITY_SRC,
        PG_STAT_ARCHIVER_SRC,
        PG_STAT_BGWRITER_SRC,
        PG_STAT_CHECKPOINTER_SRC,
        PG_STAT_DATABASE_SRC,
        PG_STAT_DATABASE_CONFLICTS_SRC,
        PG_STAT_IO_SRC,
        PG_STAT_LOCK_SRC,
        PG_STAT_RECOVERY_SRC,
        PG_STAT_REPLICATION_SRC,
        PG_STAT_SLRU_SRC,
        PG_STAT_SUBSCRIPTION_SRC,
        PG_STAT_SUBSCRIPTION_STATS_SRC,
        PG_STAT_WAL_SRC,
        PG_STAT_WAL_RECEIVER_SRC,
    ]
}
