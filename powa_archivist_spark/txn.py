"""Snapshot commit-markers — crash DETECTION for the multi-table pass.

The reference's snapshot is one atomic wCTE (powa--5.2.0.sql:4006-4108):
history append, dictionary merge, and staging truncate either all land
or none do.  Plain-parquet Spark can't get that from a single statement,
so the engine layers two mechanisms:

1. **Convergence by construction** (operators/snapshot.py, streaming/
   ingest.py): every write step is idempotent (full-row anti-join
   append, fixpoint rollup recompute, upsert dictionary merge), and the
   staging slice that feeds a pass is only truncated AFTER every
   consumer of it has committed (orchestrator._statements_snapshot
   merges the dictionary BEFORE the truncate).  Re-running a crashed
   pass therefore converges to exactly the committed-once state.
2. **Detection by marker** (this module): a crash that kills the
   process mid-pass leaves no error-ledger entry — nothing RAN to
   record one.  The orchestrator writes a begin-marker per
   (srvid, snapshot ts) before the first table write and removes it
   after the last; a marker found at the START of a pass is proof of an
   interrupted pass, surfaced into the meta error ledger before this
   pass replays the preserved staging.

A marker is a tiny JSON file under ``<root>/_txn/srvid=<n>/`` written
atomically (tmp + rename).  This is deliberately NOT a lock (the
orchestrator has per-srvid locks) and NOT a WAL — the idempotent
operators make a full WAL unnecessary; the marker only closes the
observability gap.  A transactional table format (Delta/Iceberg) is the
documented swap-in that would collapse both mechanisms into real
multi-table transactions.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile


class TxnLog:
    def __init__(self, root: str) -> None:
        self.dir = os.path.join(root, "_txn")

    def _srv_dir(self, srvid: int) -> str:
        return os.path.join(self.dir, f"srvid={srvid}")

    def begin(self, srvid: int, snap_ts: dt.datetime) -> str:
        """Write the begin-marker; returns its path (the token)."""
        d = self._srv_dir(srvid)
        os.makedirs(d, exist_ok=True)
        token = os.path.join(
            d, f"snapshot-{snap_ts.strftime('%Y%m%dT%H%M%S.%f')}.pending"
        )
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"srvid": srvid, "snap_ts": snap_ts.isoformat()}, f
            )
        os.replace(tmp, token)
        return token

    def commit(self, token: str) -> None:
        if os.path.exists(token):
            os.remove(token)

    def pending(self, srvid: int) -> list[dict]:
        """Markers left by passes that never reached commit."""
        d = self._srv_dir(srvid)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".pending"):
                continue
            p = os.path.join(d, name)
            try:
                with open(p) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                rec = {"srvid": srvid, "snap_ts": None}
            rec["token"] = p
            out.append(rec)
        return out

    def clear(self, srvid: int) -> None:
        for rec in self.pending(srvid):
            self.commit(rec["token"])


class StagedPass:
    """Atomic multi-sink publish for one (srvid, pass) — crash
    INVISIBILITY, upgrading the begin/commit markers above (crash
    detection) to the reference's one-statement wCTE semantics
    (powa--5.2.0.sql:4006-4108) as far as plain parquet allows.

    Protocol:

    1. every sink write of the pass lands in a dot-prefixed stage dir
       (``.__stage__<pass>__<seq>``) inside / next to the target
       partition — Spark's file index skips dot-prefixed paths, so NO
       reader observes any of it;
    2. ``publish()`` first writes an intent file (tmp + atomic rename)
       recording every staged op, then applies them: appends MOVE the
       staged parquet files into the live partition dir (one
       ``os.replace`` per file), replaces two-rename-swap the partition
       dir.  All data movement is metadata-only renames;
    3. a crash BEFORE the intent rename leaves only invisible stage
       dirs — readers still see the pre-pass state, and the preserved
       staging replays the pass from scratch (exactly-once via the
       snapshot operator's anti-join);  a crash AFTER it is completed by
       :meth:`recover` before the next pass reads, which converges to
       the fully-published state.

    Residual window: the publish itself is a handful of renames (one
    per staged file / partition swap) — microseconds of possible
    half-visibility versus the seconds-long job window without staging.
    A transactional table format (Delta/Iceberg) is the documented
    swap-in that closes even that.

    Concurrency: stage dirs and intents are per (srvid, pass); the
    orchestrator's per-srvid lock serializes passes, so recover()'s
    stale-stage sweep can only ever see leftovers of DEAD passes.
    """

    def __init__(self, wh, srvid: int, pass_id: str | None = None) -> None:
        import uuid

        self.wh = wh
        self.srvid = srvid
        self.pass_id = pass_id or uuid.uuid4().hex[:12]
        # the stage-dir naming uses "__" as its field delimiter and
        # recovery re-parses it (_apply_ops): a pass id containing the
        # delimiter (or a path separator) would silently reassemble the
        # WRONG live path at publish/recover time — reject it up front
        if "__" in self.pass_id or "/" in self.pass_id:
            raise ValueError(
                f"invalid pass_id {self.pass_id!r}: must contain neither "
                "'__' nor '/'"
            )
        self._ops: list[dict] = []
        self._txn_dir = os.path.join(wh.root, "_txn", f"srvid={srvid}")

    # ---- staging ---------------------------------------------------------

    def _part_dir(self, table: str) -> str:
        return os.path.join(self.wh.path(table), f"srvid={self.srvid}")

    def _acl_check(self, table: str) -> None:
        # staged sinks bypass the Warehouse write methods, so an
        # acl.AclWarehouse exposes its write check through this hook —
        # staging into a table the actor may not write must fail at
        # stage time, before any invisible data lands
        chk = getattr(self.wh, "acl_check_write", None)
        if chk is not None:
            chk(table)

    def stage_append(self, df, table: str) -> None:
        """Stage an append to the srvid partition of ``table``.  ``df``
        must carry the srvid column (dropped here: partition dirs encode
        it, matching what a partitionBy append writes)."""
        self._acl_check(table)
        d = os.path.join(
            self._part_dir(table),
            f".__stage__{self.pass_id}__{len(self._ops)}",
        )
        df.drop("srvid").write.mode("overwrite").parquet(d)
        self._ops.append({"kind": "append", "table": table, "stage": d})

    def stage_replace(self, df, table: str) -> None:
        """Stage a full replace of the srvid partition of ``table``."""
        self._acl_check(table)
        d = os.path.join(
            self.wh.path(table),
            f".__stageswap__srvid={self.srvid}__{self.pass_id}__{len(self._ops)}",
        )
        df.drop("srvid").write.mode("overwrite").parquet(d)
        self._ops.append({"kind": "replace", "table": table, "stage": d})

    # ---- publish ---------------------------------------------------------

    def _intent_path(self) -> str:
        return os.path.join(self._txn_dir, f"{self.pass_id}.intent")

    def publish(self) -> None:
        """Commit point: write the intent atomically, then apply."""
        if not self._ops:
            return
        os.makedirs(self._txn_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._txn_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"srvid": self.srvid, "ops": self._ops}, f)
        os.replace(tmp, self._intent_path())
        _apply_ops(self._ops)
        os.remove(self._intent_path())
        self._ops = []

    # ---- recovery --------------------------------------------------------

    @staticmethod
    def recover(wh, srvid: int, sweep: bool = False) -> int:
        """Complete every published-but-interrupted pass for ``srvid``
        (cheap: one listing of the tiny ``_txn`` dir, normally empty).
        With ``sweep=True`` additionally walk the warehouse for stage
        dirs of passes that died before their commit point — invisible
        to readers, but disk they'd otherwise leak; the orchestrator
        does this once per pass, not per spec (a full-tree walk is
        metadata-heavy on object stores).  Returns the number of intents
        completed.  Runs under the caller's per-srvid serialization
        (orchestrator lock)."""
        txn_dir = os.path.join(wh.root, "_txn", f"srvid={srvid}")
        done = 0
        if os.path.isdir(txn_dir):
            for name in sorted(os.listdir(txn_dir)):
                if not name.endswith(".intent"):
                    continue
                p = os.path.join(txn_dir, name)
                try:
                    with open(p) as f:
                        rec = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                _apply_ops(rec.get("ops", []))
                os.remove(p)
                done += 1
        if not sweep:
            return done
        # ONE walk serves two recoveries (a full-tree walk is metadata-
        # heavy on object stores, so the orchestrator pays it once per
        # pass, not once per concern): (a) stale stage dirs — only this
        # srvid's, only uncommitted passes (committed ones were consumed
        # by _apply_ops above); (b) interrupted COMPACTION swaps
        # (operators/maintenance.py), healed here so a compact() crash
        # becomes visible again at the next pass instead of the next
        # compact call.  Each compaction base resolves under its table's
        # write lock and inside its own try/except — a stray unreadable
        # dir must not abort the snapshot pass.
        from .operators.maintenance import recover_base

        compact_bases: list[tuple[str, str]] = []
        root = wh.root
        for dirpath, dirs, _files in os.walk(root):
            if os.path.basename(dirpath) == "_txn":
                dirs[:] = []
                continue
            for d in list(dirs):
                full = os.path.join(dirpath, d)
                in_srv_part = os.path.basename(dirpath) == f"srvid={srvid}"
                if d.startswith(".__stage__") and in_srv_part:
                    shutil.rmtree(full, ignore_errors=True)
                elif d.startswith(f".__stageswap__srvid={srvid}__"):
                    shutil.rmtree(full, ignore_errors=True)
                elif d.startswith(f".__swapout__srvid={srvid}__"):
                    # completed replace whose cleanup was interrupted
                    shutil.rmtree(full, ignore_errors=True)
                elif d.startswith(".__trash__"):
                    compact_bases.append((dirpath, d[len(".__trash__"):]))
                elif d.startswith(".__compact__"):
                    compact_bases.append((dirpath, d[len(".__compact__"):]))
            dirs[:] = [d for d in dirs if not d.startswith(".")]
        for parent, base in sorted(set(compact_bases)):
            try:
                recover_base(wh, parent, base)
            except OSError:
                # leave it for the next pass / the owning compact call
                pass
        return done


def _apply_ops(ops: list[dict]) -> None:
    """Apply staged ops idempotently (safe to re-run after any crash)."""
    for op in ops:
        stage, table_kind = op["stage"], op["kind"]
        part_dir = os.path.dirname(stage)
        if table_kind == "append":
            if os.path.isdir(stage):
                os.makedirs(part_dir, exist_ok=True)
                for f in os.listdir(stage):
                    if f.endswith(".parquet"):
                        # staged part-file names are uuid-unique; a
                        # re-run only sees files not yet moved
                        os.replace(
                            os.path.join(stage, f),
                            os.path.join(part_dir, f),
                        )
                shutil.rmtree(stage, ignore_errors=True)
        elif table_kind == "replace":
            # stage name: .__stageswap__srvid=N__<pass>__<seq>
            base = os.path.basename(stage)
            suffix = base[len(".__stageswap__"):]
            live = os.path.join(part_dir, suffix.split("__")[0])
            swapout = os.path.join(part_dir, f".__swapout__{suffix}")
            if os.path.isdir(stage):
                if os.path.isdir(live):
                    if os.path.isdir(swapout):
                        shutil.rmtree(swapout)
                    os.replace(live, swapout)
                os.replace(stage, live)
            # stage consumed (or was already): drop any swapout leftover
            if os.path.isdir(swapout):
                shutil.rmtree(swapout)
