"""Watermarked windowed aggregation over the event stream.

The reference cannot do this at all — its snapshots are fixed-cadence
cumulative samples and late rows are silently mis-binned (SURVEY.md
§2.10).  The Spark-native extension: event-time tumbling/sliding windows
with a watermark bound late-data buffering, so per-window per-entity
counters stay correct under out-of-order arrival.

The same transform works in batch (window() over a static frame) and
streaming (readStream + withWatermark + append-mode sink) — one code
path, matching how the snapshot operator is shared by both ingest modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counters(
    events: DataFrame,
    window_len: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = None,
    entity_col: str = "user_id",
    value_col: str = "value_cents",
) -> DataFrame:
    """Per-entity per-window event counts + value sums.

    For a streaming input pass ``watermark`` (e.g. "30 minutes"): windows
    finalize once the event-time watermark passes their end, bounding
    state.  For batch input leave it None."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    win = F.window("ts", window_len, slide) if slide else F.window(
        "ts", window_len
    )
    return (
        events.groupBy(win.alias("win"), F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            entity_col,
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counters(
    spark,
    landing_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    window_len: str = "10 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
):
    """Streaming form: parquet landing -> watermarked windowed counters ->
    append-mode parquet sink (only finalized windows are emitted)."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    agg = windowed_counters(stream, window_len, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .format("parquet")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
