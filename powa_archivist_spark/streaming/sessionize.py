"""Gap-based sessionization — batch and custom-stateful streaming forms.

Batch: per entity, a session breaks where the gap to the previous event
exceeds ``gap_s`` — lag + running-sum window arithmetic, fully
oracle-checkable.

Streaming: the same semantics as a CUSTOM STATEFUL OPERATOR via
``applyInPandasWithState`` — per-entity state carries the open session
(start, last_ts, n_events) across micro-batches and checkpoint restarts;
a session is emitted ("closed") only when a later event arrives beyond
the gap.  This is the pattern for operators Spark's built-in windowed
aggregations can't express (data-driven window boundaries).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.diff_rate import epoch_seconds

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
SESSION_STATE_SCHEMA = (
    "session_start timestamp, last_ts timestamp, n_events long"
)


def sessionize_batch(
    events: DataFrame,
    gap_s: int = 1800,
    entity_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """lag -> new-session flag -> running sum = session index -> groupBy."""
    w = Window.partitionBy(entity_col).orderBy("ts", order_col)
    epoch = epoch_seconds("ts")  # NTZ-safe: callers pass raw frames
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | (epoch - prev > gap_s), 1).otherwise(0)
    with_idx = events.withColumn(
        "session_idx", F.sum(is_new).over(w).cast("long")
    )
    return with_idx.groupBy(entity_col, "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def advance_session(cur, ts_list, gap):
    """The sessionizer's per-batch state transition as a PURE function:
    ``cur`` is the open session triple [start, last, n] (or None),
    ``ts_list`` the batch's event times sorted ascending, ``gap`` the
    inactivity timedelta.  Returns ``(closed, cur)`` — the sessions
    emitted closed this batch (start-ordered) and the new open session.
    Extracted from the applyInPandasWithState closure so the subtle
    late-event rules (join within gap, pre-chain with bridge-through,
    too-old split) are unit- and property-testable against the batch
    twin without a streaming harness (r5: the bridge rule had a bug the
    tests missed while this logic was embedded)."""
    closed = []
    pre = None  # chain of events entirely before cur[0] - gap
    for ts in ts_list:
        if cur is None:
            cur = [ts, ts, 1]
            continue
        if ts < cur[0] - gap:
            # too old to join the open session: true-order
            # semantics puts it in an earlier session of its own
            if pre is None:
                pre = [ts, ts, 1]
            elif ts - pre[1] > gap:
                closed.append(pre)
                pre = [ts, ts, 1]
            else:
                pre[1] = ts
                pre[2] += 1
            continue
        if pre is not None:
            # sorted order: ts >= cur[0] - gap resolves the chain.
            # The bridge runs THROUGH the resolving ts: every pre
            # event is < cur[0] - gap by construction, so the chain
            # can only reach the open session if ts continues it
            # (ts - pre[1] <= gap) AND ts itself joins cur (it does
            # whenever it doesn't open a new later session — the
            # ts > cur[1] + gap case implies ts - pre[1] > 2*gap,
            # so both conditions collapse to one check here).
            if ts - pre[1] <= gap:
                cur[0] = pre[0]
                cur[2] += pre[2]
            else:
                closed.append(pre)
            pre = None
        if ts - cur[1] > gap:
            closed.append(cur)
            cur = [ts, ts, 1]
        else:
            cur[0] = min(cur[0], ts)
            cur[1] = max(cur[1], ts)
            cur[2] += 1
    if pre is not None:
        # chain never reached the open session's neighborhood: every
        # pre event is < cur[0] - gap, so it closes on its own
        closed.append(pre)
    closed.sort(key=lambda c: c[0])
    return closed, cur


def stateful_sessionize(
    stream: DataFrame,
    gap_s: int = 1800,
    entity_col: str = "user_id",
):
    """applyInPandasWithState sessionizer: emits CLOSED sessions; the open
    session per entity lives in managed state across micro-batches.

    Late (out-of-order) events that land WITHIN ``gap`` of the open
    session's start join it — inserting such a point can only shrink
    gaps in the true ordered sequence, so bounds extend with min/max.
    A late event older than ``session_start - gap`` must NOT merge
    (ADVICE r4): in true order it belongs to a separate, earlier
    session, so it chains into its own "pre" session which is emitted
    CLOSED — unless a later event in the same batch bridges the chain
    through to the open session (the resolving event is within ``gap``
    of both the chain's end and the session's span), in which case the
    whole chain is provably one true-order session and merges.  An event older than an
    already-EMITTED session cannot reopen it (append-mode streaming);
    bound that staleness with a watermark upstream — an unboundedly
    late bridge event between an emitted pre-session and the open one
    is the one divergence from batch ``sessionize_batch`` semantics,
    and the watermark bounds it."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = dt.timedelta(seconds=gap_s)
    etype = stream.schema[entity_col].dataType.simpleString()
    out_schema = (
        f"{entity_col} {etype}, session_start timestamp, "
        "session_end timestamp, n_events long"
    )

    def fn(key, pdfs, state: GroupState):
        (entity,) = key
        ts_list: list = []
        for pdf in pdfs:
            ts_list.extend(pdf["ts"].tolist())
        ts_list.sort()
        if state.exists:
            start, last, n = state.get
            cur = [start, last, int(n)]
        else:
            cur = None
        closed, cur = advance_session(cur, ts_list, gap)
        if cur is not None:
            state.update((cur[0], cur[1], cur[2]))
        if closed:
            yield pd.DataFrame(
                {
                    entity_col: [entity] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn,
        out_schema,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    spark,
    landing_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    gap_s: int = 1800,
    available_now: bool = True,
):
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    sessions = stateful_sessionize(stream, gap_s)
    writer = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .format("parquet")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
