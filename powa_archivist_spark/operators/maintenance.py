"""Storage maintenance — small-file compaction.

The reference's storage-maintenance knob retunes TOAST packing on the
history tables (``powa_fix_toast_tuple_target``, powa--5.2.0.sql:
7732-7763, D8).  The Spark-native equivalent problem is small files:
every snapshot appends one file per partition per datasource, so a
5-minute cadence writes ~288 files/day/table — scan planning and footer
reads dominate long before data volume does.  ``compact`` is the
OPTIMIZE analog: rewrite a partition into size-targeted files.

Scheduled like the reference schedules coalesce/purge — piggybacked on
the maintenance pass, per srvid, so the smear (`% 20`) spreads the IO.
"""

from __future__ import annotations

import math
import os
import shutil

from ..storage import Warehouse

TARGET_FILE_BYTES = 128 << 20  # one HDFS-ish block per file


def partition_stats(wh: Warehouse, table: str, srvid: int) -> tuple[int, int]:
    """(n_files, n_bytes) of one srvid partition's parquet files."""
    root = os.path.join(wh.path(table), f"srvid={srvid}")
    n_files = n_bytes = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(dirpath, f))
    return n_files, n_bytes


def _recover_interrupted_swaps(table_root: str) -> None:
    """Resolve any swap a previous compact() crashed in the middle of.

    Invariant of the two-rename swap: the partition's rows are always in
    exactly one of live / ``.__compact__`` scratch / ``.__trash__``.
    For each stranded dot-dir: live present -> the swap (or the write)
    completed, drop the leftover; live absent + scratch present -> the
    crash hit between the renames, finish it (scratch -> live, drop
    trash); live absent + no scratch -> roll the trash back to live."""
    for dirpath, dirs, _files in os.walk(table_root):
        for d in list(dirs):
            if not os.path.isdir(os.path.join(dirpath, d)):
                continue  # a sibling's recovery already consumed it
            if d.startswith(".__trash__"):
                live = os.path.join(dirpath, d[len(".__trash__"):])
                scratch = os.path.join(
                    dirpath, f".__compact__{d[len('.__trash__'):]}"
                )
                if os.path.isdir(live):
                    shutil.rmtree(os.path.join(dirpath, d))
                elif os.path.isdir(scratch):
                    os.replace(scratch, live)
                    shutil.rmtree(os.path.join(dirpath, d))
                else:
                    os.replace(os.path.join(dirpath, d), live)
            elif d.startswith(".__compact__"):
                live = os.path.join(dirpath, d[len(".__compact__"):])
                if os.path.isdir(live):
                    # write finished (or not) but the swap never started:
                    # live still holds the rows; scratch is stale
                    shutil.rmtree(os.path.join(dirpath, d))
        # don't descend into dot-dirs we may have just moved
        dirs[:] = [d for d in dirs if not d.startswith(".")]


def compact(
    wh: Warehouse,
    table: str,
    srvid: int,
    target_bytes: int = TARGET_FILE_BYTES,
    min_files: int = 4,
) -> tuple[int, int]:
    """Rewrite one srvid partition into ``ceil(bytes/target)`` files.

    No-op below ``min_files`` (nothing to win).  Returns
    (files_before, files_after).  Sub-partition directories (e.g.
    ``range_day=``) are compacted independently so partition pruning
    keys survive the rewrite."""
    _recover_interrupted_swaps(wh.path(table))
    part_root = os.path.join(wh.path(table), f"srvid={srvid}")
    if not os.path.isdir(part_root):
        return (0, 0)

    before_total = after_total = 0
    # leaf directories that directly hold parquet files
    for dirpath, dirs, files in os.walk(part_root):
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        before = len(pq)
        before_total += before
        nbytes = sum(os.path.getsize(os.path.join(dirpath, f)) for f in pq)
        want = max(1, math.ceil(nbytes / target_bytes))
        if before < min_files or want >= before:
            after_total += before
            continue
        df = wh.spark.read.parquet(dirpath)
        # dot-prefixed scratch next to the leaf: hidden to Spark readers
        # and partition discovery, inert if a crash strands it
        tmp = os.path.join(
            os.path.dirname(dirpath),
            f".__compact__{os.path.basename(dirpath)}",
        )
        df.coalesce(want).write.mode("overwrite").parquet(tmp)
        # two-rename swap (same protocol as Warehouse.overwrite): the
        # old rmtree-then-replace left a window where a crash between
        # the recursive delete and the rename made the leaf invisible
        # to readers.  Renames shrink that window to two metadata ops —
        # a crash strands at worst an inert dot-prefixed sibling (the
        # scratch or the trash), never an unreadable partition.
        trash = os.path.join(
            os.path.dirname(dirpath),
            f".__trash__{os.path.basename(dirpath)}",
        )
        if os.path.isdir(trash):
            shutil.rmtree(trash)
        os.replace(dirpath, trash)
        os.replace(tmp, dirpath)
        shutil.rmtree(trash)
        after = len(
            [f for f in os.listdir(dirpath) if f.endswith(".parquet")]
        )
        after_total += after
    return (before_total, after_total)
