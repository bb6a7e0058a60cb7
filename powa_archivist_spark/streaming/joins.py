"""Watermarked stream-stream join — attribution under out-of-order
arrival.

The reference has no streaming joins at all (its collector joins inside
Postgres after landing, SURVEY.md §2.10); the Spark-native extension is
the event-time range join between two live streams: every click joins
the same user's views whose attribution window contains it.  Both sides
carry watermarks and the join condition bounds click time to a finite
range after the view, so Spark can expire buffered state — without the
time bound a stream-stream join must keep both sides forever.

Batch twin: ``queries.events_interval_join`` (the bin range join) — the
same pairs, computed at rest; this module is the live path.  State per
key is O(rows inside watermark + window), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    views: DataFrame,
    clicks: DataFrame,
    join_window: str = "60 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join of two (possibly streaming) event frames: each click
    matched to every view of the same user with ``v_ts <= c_ts <=
    v_ts + join_window``.  Both inputs need (user_id, event_id, ts);
    output is one row per qualifying (view, click) pair.

    ``watermark`` bounds how late either side may arrive; buffered join
    state for rows older than watermark + join_window is dropped.

    ``how='left_outer'`` additionally emits every view that attracted NO
    click inside its window, with null click columns — in streaming mode
    such rows surface only once the watermark passes the end of their
    window (Spark must be sure no matching click can still arrive), so
    an outer result for the stream's final window needs a later event to
    push the watermark (or query teardown)."""
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    cond = (
        (v.user_id == c.c_user_id)
        & (c.c_ts >= v.v_ts)
        & (c.c_ts <= v.v_ts + F.expr(f"INTERVAL {join_window}"))
    )
    return v.join(c, cond, how).select(
        "user_id", "view_id", "v_ts", "click_id", "c_ts"
    )


def stream_interval_join(
    spark,
    views_dir: str,
    clicks_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    join_window: str = "60 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
    how: str = "inner",
    max_files_per_trigger: int | None = None,
):
    """Streaming form: two parquet landing dirs -> watermarked interval
    join -> append-mode parquet sink.  ``max_files_per_trigger`` splits
    the backlog into several micro-batches — required for outer joins
    under ``availableNow`` so the watermark advances mid-run and
    unmatched rows actually flush before the query stops."""
    views = spark.readStream.schema(schema)
    clicks = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        views = views.option("maxFilesPerTrigger", max_files_per_trigger)
        clicks = clicks.option("maxFilesPerTrigger", max_files_per_trigger)
    views = views.parquet(views_dir)
    clicks = clicks.parquet(clicks_dir)
    joined = interval_join_streams(views, clicks, join_window, watermark, how)
    writer = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .format("parquet")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
