"""Streaming corpus curation — the continuous-ingest form of the batch
curation composition (pipeline/queries.corpus_curation_e2e): each
micro-batch runs

    quality gate -> cross-batch exact dedup (digest ledger) ->
    deterministic train/val/test split -> sink append,

with rejected docs appended to an auditable reject ledger carrying the
violated-rule reasons.  Every stage is the SAME operator the batch path
uses (textstats.quality_gate, the dedup digest ledger, corpus.
dataset_split), so a corpus built from the stream equals the batch
pipeline over the same data modulo arrival order inside a micro-batch
(first-arriving batch wins per normalized text; min id inside a batch).

Scale shape: gate and split are map-only expressions; the only join per
batch is the digest-ledger anti-join (broadcast by default,
``broadcast_ledger=False`` for the shuffle-side form at 100 TB); the
reject ledger is append-only and carries (id, reasons), not the text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.corpus import dataset_split
from ..pipeline.textstats import quality_gate
from ..storage import Warehouse
from .dedup import dedup_batch_survivors
from .ingest import with_epoch_marker as _with_epoch_marker

REJECT_TABLE = "corpus_rejects"


def process_curation_batch(
    wh: Warehouse,
    batch: DataFrame,
    sink_table: str,
    thresholds: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_ledger: bool = True,
) -> None:
    """One curation pass over a micro-batch (see module docstring)."""
    verdict = quality_gate(batch, text_col, id_col, thresholds)
    rejects = verdict.filter(~F.col("keep")).select(id_col, "reasons")
    passed = batch.join(
        verdict.filter("keep").select(id_col), id_col, "left_semi"
    )
    survivors = dedup_batch_survivors(
        wh, passed, text_col, id_col, broadcast_ledger
    ).cache()
    try:
        labeled = dataset_split(survivors.drop("text_hash"), id_col=id_col)
        wh.append(labeled, sink_table)
        if survivors.limit(1).count() > 0:
            from .dedup import LEDGER_TABLE

            wh.append(survivors.select("text_hash"), LEDGER_TABLE)
        wh.append(rejects, REJECT_TABLE)
    finally:
        survivors.unpersist()


def stream_curation(
    spark,
    landing_glob: str,
    schema,
    checkpoint_dir: str,
    wh: Warehouse,
    sink_table: str = "corpus_curated",
    thresholds: dict | None = None,
    max_files_per_trigger: int = 16,
):
    """Streaming curation pipeline with committed-epoch markers (same
    replay protocol as every foreachBatch sink in this package)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_glob)
    )
    marker_dir = os.path.join(checkpoint_dir, "epoch_markers")

    def process(batch: DataFrame, epoch_id: int) -> None:
        _with_epoch_marker(
            marker_dir, epoch_id,
            lambda: process_curation_batch(wh, batch, sink_table,
                                           thresholds),
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
