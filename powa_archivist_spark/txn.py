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
