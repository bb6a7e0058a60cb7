"""Streaming deduplication — the continuous-ingest twin of
``pipeline.dedup.exact_dedup`` for a landing stream of documents.

Two forms, matching how Spark wants this expressed:

- :func:`stream_exact_dedup` — ``dropDuplicatesWithinWatermark`` on the
  normalized-text digest: state is bounded by the watermark horizon (a
  duplicate arriving later than the horizon is re-emitted — the standard
  trade of state size vs dedup window).  Pure Structured Streaming, one
  stateful operator, no external table.
- :func:`stream_exact_dedup_ledger` — foreachBatch against a persistent
  digest ledger: each micro-batch anti-joins the seen-digest table, then
  appends the survivors' digests — UNBOUNDED dedup window at the cost of
  one broadcast-able join per batch.  This is the corpus-build shape: at
  100 TB the ledger is a digest-bucketed table and the anti-join shuffles
  only on the digest.

Both keep the batch operator's semantics (first arrival wins by
normalized text) so a corpus built from the stream equals the batch
:func:`pipeline.dedup.exact_dedup` keep-set over the same data, modulo
arrival order inside one micro-batch (resolved min-id like the batch op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import normalized_text
from ..storage import Warehouse

LEDGER_TABLE = "corpus_digest_ledger"


def with_digest(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("text_hash", F.md5(normalized_text(F.col(text_col))))


def stream_exact_dedup(
    stream: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermark-bounded streaming exact dedup: emits the first arrival
    of each normalized text within the watermark horizon."""
    return (
        with_digest(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def process_dedup_batch(
    wh: Warehouse, batch: DataFrame, sink_table: str,
    text_col: str = "text", id_col: str = "doc_id",
) -> None:
    """One ledger pass: min-id per digest inside the batch, anti-join the
    ledger, append survivors to sink + their digests to the ledger."""
    hashed = with_digest(batch, text_col)
    w_min = (
        hashed.groupBy("text_hash")
        .agg(F.min(id_col).alias("_keep_id"))
    )
    firsts = hashed.join(
        w_min,
        (hashed["text_hash"] == w_min["text_hash"])
        & (hashed[id_col] == w_min["_keep_id"]),
    ).select(hashed["*"])
    if wh.exists(LEDGER_TABLE):
        seen = wh.read(LEDGER_TABLE)
        firsts = firsts.join(F.broadcast(seen), "text_hash", "left_anti")
    firsts = firsts.cache()
    try:
        if firsts.count() == 0:
            return
        wh.append(firsts.drop("text_hash"), sink_table)
        wh.append(firsts.select("text_hash"), LEDGER_TABLE)
    finally:
        firsts.unpersist()


def stream_exact_dedup_ledger(
    spark,
    landing_glob: str,
    schema,
    checkpoint_dir: str,
    wh: Warehouse,
    sink_table: str = "corpus_docs",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 16,
):
    """Unbounded-window streaming dedup via the digest ledger (corpus
    building).  Broadcast of the ledger is a small-scale convenience —
    at 100 TB drop the broadcast hint and the anti-join shuffles both
    sides on the digest (bucketed ledger -> one-sided shuffle)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_glob)
    )

    def process(batch: DataFrame, epoch_id: int) -> None:
        process_dedup_batch(wh, batch, sink_table, text_col, id_col)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
