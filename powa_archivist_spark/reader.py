"""Read-only OUT-OF-PROCESS snapshot reader (r8, VERDICT r7 task 6).

The single-manifest commit (:mod:`powa_archivist_spark.txn`) makes
crashes invisible to every reader that goes through a ``Warehouse`` in
the publishing process: reads resolve pending manifests (under
in-process table locks) before listing files.  An EXTERNAL session —
another Spark driver, a DuckDB shell — pointed straight at the table
directory bypasses that resolution and can observe a fold mid-flight
(some staged files moved, some not; a replace half-retired).

This module closes that gap without a transactional table format:
``SnapshotReader`` resolves a table's LOGICAL file set purely from the
committed manifests plus a directory listing, then pins the result as a
HARD-LINKED snapshot directory.  Three properties make this sound with
zero cooperation from the publisher:

1. **The manifest records every staged file name** (txn.py r8:
   ``_staged_files``/``_staged_children``), and staged part-file names
   are uuid-unique.  The post-commit file set of a table is therefore a
   pure function of (live listing ∪ op records): appends ADD their
   recorded names; replaces DROP the target dir's other names and add
   their own.  Fold progress never changes the answer — a recorded
   file is either still in its stage dir or already at its live path,
   and the resolver tries both.
2. **Folding only ever uses atomic renames** (``os.replace``), so each
   recorded file exists at exactly one of its two candidate paths at
   any instant; a miss at both is a transient in-flight rename and a
   bounded retry converges.
3. **Hard links survive renames**: once a resolved file is linked into
   the snapshot dir, the publisher may move/retire the source freely —
   the snapshot keeps the inode alive.  The snapshot is therefore a
   stable, fully-consistent view ANY engine can scan (Spark, DuckDB,
   pandas), for as long as the caller keeps it.

A whole-resolution retry (default 5) restarts from a fresh manifest +
directory listing when a file vanishes from both candidates — e.g. a
``replace`` committed between our listing and the link.  Each retry
observes a strictly newer state, and passes are seconds apart while
resolution is milliseconds, so this converges in practice; a pathological
publish storm raises after the retry budget rather than returning a torn
view.

Catalog-managed bucketed ledger tables (``append_files`` ops — the
streaming dedup/PQ digest ledgers) are covered since r9 (VERDICT r8
task 4): their ops record the staged bucket file names and both the
stage and the live location, so resolution works the same way — the
caller passes the table's catalog ``location=`` to :meth:`snapshot`
(an external engine knows the warehouse dir it's pointed at; it has no
session catalog to ask).  Still not covered: tables written by engines
other than this package.

Reference analog: readers of powa's one-statement wCTE snapshots
(powa--5.2.0.sql:4006-4108) get this from PostgreSQL MVCC; plain
parquet needs the manifest protocol replayed read-only.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


class TornSnapshotError(RuntimeError):
    """Resolution could not pin a consistent view within the retry
    budget (pathologically hot publish loop)."""


def _pending_ops(root: str, table: str) -> list[dict]:
    """Ops touching ``table`` from every committed-but-unretired
    manifest, in manifest order (srv dir, then intent name — passes on
    one table are serialized by the publisher, so this order is the
    publish order)."""
    txn_root = os.path.join(root, "_txn")
    if not os.path.isdir(txn_root):
        return []
    ops: list[dict] = []
    for srv in sorted(os.listdir(txn_root)):
        d = os.path.join(txn_root, srv)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if not name.endswith(".intent"):
                continue
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # being retired / torn: fully-applied or unborn
            ops.extend(
                op for op in rec.get("ops", [])
                if op.get("table") == table
            )
    return ops


def _live_listing(table_root: str) -> dict[str, dict[str, str]]:
    """relative dir -> {file name -> absolute path}, skipping dot- and
    underscore-prefixed entries (stages, swapouts, Spark markers)."""
    out: dict[str, dict[str, str]] = {}
    if not os.path.isdir(table_root):
        return out
    for cur, dirs, files in os.walk(table_root):
        dirs[:] = [x for x in dirs if not x.startswith((".", "_"))]
        rel = os.path.relpath(cur, table_root)
        rel = "" if rel == "." else rel
        keep = {
            f: os.path.join(cur, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        }
        if keep:
            out[rel] = keep
    return out


def _op_files(op: dict) -> list[str]:
    files = op.get("files")
    if files is None:
        # pre-r8 manifest without recorded names: best effort from the
        # stage dir (already-moved files are present in the live
        # listing; name-level union keeps the set right)
        stage = op["stage"]
        files = (
            sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
            if os.path.isdir(stage) else []
        )
    return files


def _resolve(root: str, table: str,
             table_root: str | None = None) -> dict[str, dict[str, list[str]]]:
    """One resolution attempt: relative dir -> {name -> candidate
    absolute paths, in preference order}."""
    if table_root is None:
        table_root = os.path.join(root, table)
    ops = _pending_ops(root, table)
    live = _live_listing(table_root)
    out: dict[str, dict[str, list[str]]] = {
        rel: {name: [p] for name, p in names.items()}
        for rel, names in live.items()
    }

    def rel_of(abs_dir: str) -> str:
        rel = os.path.relpath(abs_dir, table_root)
        return "" if rel == "." else rel

    def drop_dir(rel: str) -> None:
        out.pop(rel, None)

    def add(rel: str, name: str, candidates: list[str]) -> None:
        out.setdefault(rel, {})[name] = candidates

    for op in ops:
        kind, stage = op["kind"], op["stage"]
        if kind == "append":
            rel = rel_of(os.path.dirname(stage))
            for name in _op_files(op):
                add(rel, name, [
                    os.path.join(table_root, rel, name) if rel
                    else os.path.join(table_root, name),
                    os.path.join(stage, name),
                ])
        elif kind == "replace":
            base = os.path.basename(stage)
            suffix = base[len(".__stageswap__"):]
            live_dir = os.path.join(
                os.path.dirname(stage), suffix.split("__")[0]
            )
            rel = rel_of(live_dir)
            drop_dir(rel)
            for name in _op_files(op):
                add(rel, name, [
                    os.path.join(live_dir, name),
                    os.path.join(stage, name),
                ])
        elif kind == "replace_flat":
            rel = rel_of(os.path.dirname(stage))
            drop_dir(rel)
            for name in _op_files(op):
                add(rel, name, [
                    os.path.join(os.path.dirname(stage), name),
                    os.path.join(stage, name),
                ])
        elif kind == "append_tree":
            live_root = os.path.dirname(stage)
            for child, files in (op.get("children") or {}).items():
                rel = rel_of(os.path.join(live_root, child))
                for name in files:
                    add(rel, name, [
                        os.path.join(live_root, child, name),
                        os.path.join(stage, child, name),
                    ])
        elif kind == "replace_tree":
            live_root = os.path.dirname(stage)
            for child, files in (op.get("children") or {}).items():
                rel = rel_of(os.path.join(live_root, child))
                drop_dir(rel)
                for name in files:
                    add(rel, name, [
                        os.path.join(live_root, child, name),
                        os.path.join(stage, child, name),
                    ])
            for leaf in op.get("drops", []):
                drop_dir(rel_of(os.path.join(live_root, leaf)))
        elif kind == "append_files":
            # catalog-managed bucketed ledger (r9): the op records the
            # live catalog location in ``dest``; staged bucket files
            # (bucket id in the file name) land flat in it
            dest = op["dest"]
            rel = rel_of(dest)
            for name in _op_files(op):
                add(rel, name, [
                    os.path.join(dest, name),
                    os.path.join(stage, name),
                ])
    return out


def _link_first(candidates: list[str], dest: str) -> bool:
    """Hard-link the first candidate that exists; True on success.
    Candidates are cycled twice to ride out an in-flight atomic rename
    between them (stage -> live moves only)."""
    for path in candidates + list(reversed(candidates)):
        try:
            os.link(path, dest)
            return True
        except FileExistsError:
            return True
        except OSError:
            continue
    return False


class SnapshotReader:
    """Pin consistent snapshots of warehouse tables for external
    engines.

    >>> r = SnapshotReader("/path/to/warehouse")
    >>> snap = r.snapshot("powa_statements_current")   # a directory
    >>> spark.read.parquet(snap)                       # any session
    >>> duckdb.sql(f"SELECT * FROM read_parquet('{snap}/**/*.parquet',"
    ...            " hive_partitioning=1)")
    >>> r.release(snap)
    """

    def __init__(self, root: str, retries: int = 5) -> None:
        self.root = root
        self.retries = retries
        self._snap_root = os.path.join(root, "_snapshots")

    def snapshot(self, table: str, dest: str | None = None,
                 location: str | None = None) -> str:
        """Resolve ``table`` through the manifest protocol and return a
        hard-linked snapshot directory (hive partition structure
        preserved).  The caller owns the directory; :meth:`release` (or
        plain rmtree) frees it.

        ``location`` (r9): the table's data directory when it is NOT
        ``<root>/<table>`` — i.e. a catalog-managed bucketed ledger
        (today only ``BucketedDigestLedger`` records the per-commit
        ``files`` list this resolver needs; the streaming PQ path
        appends flat, unbucketed — any future bucketed ledger op must
        record ``files`` the same way), whose location lives in the
        Spark catalog of the publishing session.  External engines pass
        the path they were configured with."""
        last_missing = None
        for _ in range(self.retries):
            resolved = _resolve(self.root, table, location)
            if dest is None:
                os.makedirs(self._snap_root, exist_ok=True)
                out = tempfile.mkdtemp(
                    prefix=f"{table.replace('/', '_')}__",
                    dir=self._snap_root,
                )
            else:
                out = dest
                os.makedirs(out, exist_ok=True)
            ok = True
            for rel, names in resolved.items():
                d = os.path.join(out, rel) if rel else out
                os.makedirs(d, exist_ok=True)
                for name, candidates in names.items():
                    if not _link_first(candidates,
                                       os.path.join(d, name)):
                        ok = False
                        last_missing = candidates
                        break
                if not ok:
                    break
            if ok:
                return out
            shutil.rmtree(out, ignore_errors=True)
            time.sleep(0.02)  # in-flight rename: re-resolve fresh
        raise TornSnapshotError(
            f"could not pin {table!r} in {self.retries} attempts; "
            f"last missing file candidates: {last_missing}"
        )

    def release(self, snap_dir: str) -> None:
        shutil.rmtree(snap_dir, ignore_errors=True)

    def read_spark(self, spark, table: str):
        """Read via ANY SparkSession (not necessarily the publisher's).
        The snapshot dir stays alive until released; use
        ``df.localCheckpoint()`` or finish the action before releasing."""
        return spark.read.parquet(self.snapshot(table))

    def read_duckdb_sql(self, table: str) -> tuple[str, str]:
        """(snapshot_dir, SQL source expression) for a DuckDB scan."""
        snap = self.snapshot(table)
        return snap, (
            f"read_parquet('{snap}/**/*.parquet', hive_partitioning=1,"
            " union_by_name=1)"
        )
