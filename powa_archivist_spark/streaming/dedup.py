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

Delivery: the ledger variants use the SAME committed-epoch markers as
ingest.py, so a checkpoint-replayed epoch whose marker exists is a
no-op; only a crash MID-epoch (between the sink append and the ledger
appends) replays **at-least-once** — the sink is written first so rows
are never lost, and a downstream exact dedup on (id) absorbs the
re-append (a transactional table format would collapse the appends
into one txn).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import normalized_text
from ..storage import Warehouse
from .ingest import with_epoch_marker as _with_epoch_marker

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


BANDS_TABLE = "corpus_minhash_bands"
SHINGLE_TABLE = "corpus_shingles"


def process_near_dup_batch(
    wh: Warehouse,
    batch: DataFrame,
    sink_table: str,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> None:
    """One near-dup ledger pass (cross-batch MinHash LSH dedup):

    1. in-batch: minhash_dedup_pairs over the batch, min-id keeps;
    2. cross-batch: survivors' band buckets equi-join the bands ledger
       (the SAME join shape as the batch operator, with the ledger as
       the other side), exact-jaccard verify against the kept docs'
       persisted shingle arrays;
    3. survivors append to the sink, their bands + shingles to the
       ledgers.

    The ledgers grow with the KEPT corpus only; both joins shuffle on
    (band, bucket) / doc id — bounded keys, no cross join.  At 100 TB
    the bands ledger is bucket-partitioned so a batch touches only its
    colliding buckets' files."""
    from ..pipeline.dedup import minhash_bands, shingle_arrays

    sh_b = shingle_arrays(batch, shingle_n, text_col, id_col).persist()
    # signatures + band buckets computed ONCE for the whole batch
    # (round-5: the in-batch pair stage previously re-derived them via
    # minhash_dedup_pairs and the ledger append derived them a second
    # time for the survivors — one full signature pipeline per batch
    # saved); every later stage reuses this cached frame
    batch_bands = minhash_bands(
        batch, num_perm, bands, shingle_n, text_col, id_col,
        shingle_df=sh_b, hash_fn=hash_fn,
    ).persist()

    # in-batch candidates: band-bucket self-join, verified with exact
    # shingle jaccard — identical semantics to minhash_dedup_pairs
    ba = batch_bands.select("band", "bucket", F.col(id_col).alias("a_id"))
    bb = batch_bands.select("band", "bucket", F.col(id_col).alias("b_id"))
    cands_in = (
        ba.join(bb, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    va = sh_b.select(F.col(id_col).alias("a_id"), F.col("sh").alias("a_sh"))
    vb = sh_b.select(F.col(id_col).alias("b_id"), F.col("sh").alias("b_sh"))
    inter_in = F.size(F.array_intersect("a_sh", "b_sh"))
    union_in = F.size("a_sh") + F.size("b_sh") - inter_in
    in_batch_drops = (
        cands_in.join(va, "a_id").join(vb, "b_id")
        .filter((inter_in / union_in) >= threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    survivors = batch.join(in_batch_drops, id_col, "left_anti")
    new_bands = batch_bands.join(
        survivors.select(id_col), id_col, "left_semi"
    )

    if wh.exists(BANDS_TABLE):
        ledger = wh.read(BANDS_TABLE)
        cands = (
            new_bands.select(
                "band", "bucket", F.col(id_col).alias("new_id")
            )
            .join(
                ledger.select(
                    "band", "bucket", F.col(id_col).alias("old_id")
                ),
                ["band", "bucket"],
            )
            .select("new_id", "old_id")
            .distinct()
        )
        a = sh_b.select(F.col(id_col).alias("new_id"), F.col("sh").alias("a_sh"))
        b = wh.read(SHINGLE_TABLE).select(
            F.col(id_col).alias("old_id"), F.col("sh").alias("b_sh")
        )
        inter = F.size(F.array_intersect("a_sh", "b_sh"))
        union = F.size("a_sh") + F.size("b_sh") - inter
        cross_drops = (
            cands.join(a, "new_id")
            .join(b, "old_id")
            .filter((inter / union) >= threshold)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        survivors = survivors.join(cross_drops, id_col, "left_anti")

    survivors = survivors.cache()
    try:
        if survivors.count() == 0:
            return
        wh.append(survivors, sink_table)
        wh.append(
            new_bands.join(survivors.select(id_col), id_col, "left_semi"),
            BANDS_TABLE,
        )
        wh.append(
            sh_b.join(survivors.select(id_col), id_col, "left_semi"),
            SHINGLE_TABLE,
        )
    finally:
        survivors.unpersist()
        batch_bands.unpersist()
        sh_b.unpersist()


def stream_near_dup_ledger(
    spark,
    landing_glob: str,
    schema,
    checkpoint_dir: str,
    wh: Warehouse,
    sink_table: str = "corpus_docs_neardup",
    threshold: float = 0.8,
    max_files_per_trigger: int = 16,
):
    """Streaming near-duplicate corpus builder: each micro-batch dedups
    in-batch AND against everything kept so far (LSH bands + shingle
    verify ledgers)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_glob)
    )

    marker_dir = os.path.join(checkpoint_dir, "epoch_markers")

    def process(batch: DataFrame, epoch_id: int) -> None:
        _with_epoch_marker(
            marker_dir, epoch_id,
            lambda: process_near_dup_batch(wh, batch, sink_table, threshold),
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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

    marker_dir = os.path.join(checkpoint_dir, "epoch_markers")

    def process(batch: DataFrame, epoch_id: int) -> None:
        _with_epoch_marker(
            marker_dir, epoch_id,
            lambda: process_dedup_batch(wh, batch, sink_table, text_col,
                                        id_col),
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
