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
) -> DataFrame:
    """Inner join of two (possibly streaming) event frames: each click
    matched to every view of the same user with ``v_ts <= c_ts <=
    v_ts + join_window``.  Both inputs need (user_id, event_id, ts);
    output is one row per qualifying (view, click) pair.

    ``watermark`` bounds how late either side may arrive; buffered join
    state for rows older than watermark + join_window is dropped."""
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
    return v.join(c, cond).select(
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
):
    """Streaming form: two parquet landing dirs -> watermarked interval
    join -> append-mode parquet sink."""
    views = spark.readStream.schema(schema).parquet(views_dir)
    clicks = spark.readStream.schema(schema).parquet(clicks_dir)
    joined = interval_join_streams(views, clicks, join_window, watermark)
    writer = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .format("parquet")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
