"""In-process replay memo for the streaming folds' epoch probes (r13,
guide §1.2 — don't recompute what you already know).

Every fold starts with a replay short-circuit: "has this epoch already
landed in my state table?".  Before r13 that was one ``filter(epoch ==
e).limit(1).count()`` Spark job per micro-batch — pure fixed latency on
the common (fresh-epoch) path, and the per-fold job count is exactly
what dominates a ledger replay's wall clock at bounded batch sizes.

This module memoizes the landed-epoch set per (warehouse root, table)
inside the driver process:

- a COLD entry seeds once from the table (one distinct read over the
  pruned epoch column — same cost class as one of the probes it
  replaces), or from nothing when the table does not exist yet;
- every fold that publishes registers its epoch via :func:`landed`;
- membership is then a dict lookup — zero Spark jobs on every
  subsequent probe in the process.

Correctness rests on the contract the folds already document: ONE
writer loop per warehouse (the stream's serialized foreachBatch).  A
restart begins with a cold memo and seeds from disk, so crash-replay
semantics are unchanged; a fold that fails before ``publish`` never
registers, so its epoch stays un-landed exactly like the table.  The
memo mirrors the TABLE state, not "epochs this process attempted" —
e.g. an empty refresh epoch that lands no ledger row is not registered,
matching the probe it replaces.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

#: (warehouse root, table) -> set of landed epoch keys (ints, or tuples
#: for composite (epoch, stream_gen) protocols)
_SEEN: dict[tuple[str, str], set] = {}


def epoch_replayed(wh, table: str, member,
                   key_frame: Callable[[], DataFrame] | None = None,
                   ) -> bool:
    """True when ``member`` already landed in ``table``.

    ``member`` is an int epoch or a tuple for composite keys;
    ``key_frame`` builds the DataFrame of key columns for the one-time
    cold seed (defaults to the table's ``epoch`` column)."""
    key = (wh.root, table)
    seen = _SEEN.get(key)
    if seen is None:
        seen = set()
        if wh.exists(table):
            df = (key_frame() if key_frame is not None
                  else wh.read(table).select("epoch"))
            for r in df.distinct().collect():
                seen.add(r[0] if len(r) == 1 else tuple(r))
        _SEEN[key] = seen
    return member in seen


def landed(wh, table: str, member) -> None:
    """Register a published epoch key (call after ``publish()``)."""
    _SEEN.setdefault((wh.root, table), set()).add(member)


def invalidate(root: str) -> None:
    """Drop every memo entry under ``root`` — called by the txn layer
    whenever crash recovery (``StagedPass.recover``) or a reader's
    ``heal_table`` applies a committed-but-unretired manifest: those
    paths land epochs WITHOUT the fold's ``landed`` call (the fold
    crashed after its commit point), so the memo must re-seed from the
    table.  Recovery is rare; the reseed is one distinct read."""
    for key in [k for k in _SEEN if k[0] == root]:
        del _SEEN[key]
