"""Structured Streaming ingest of the staging landing zone.

The reference has no stream processing — snapshots are timer-driven
micro-batches (powa.c:331-505), and remote collectors fill UNLOGGED
``*_src_tmp`` staging tables that the snapshot functions drain
(powa--5.2.0.sql:1980-2022, 4102-4104).  The Spark-native seam
(SURVEY.md §2.10): the landing zone becomes a file-stream source and
each micro-batch runs the SAME batch snapshot transform via
``foreachBatch`` — checkpointed source offsets plus optional late-data
tolerance the reference lacks.

Delivery semantics: **at-least-once with ts-level dedup**, not
exactly-once — ``foreachBatch`` can replay a batch after a crash, and
the snapshot operator's idempotency anti-join skips capture rows whose
``ts`` already appears in the server's current slice.  The guard is
keyed on whole ts values: a replayed batch whose ts only PARTIALLY
appended before the crash (multi-file append interrupted mid-write) is
skipped wholesale, so rows of that timestamp that never hit disk stay
lost.  Closing that window needs an atomic per-(srvid, ts) commit —
write-then-rename staging of each micro-batch append, or a
transactional table format — which plain parquet appends can't express;
at 5-minute snapshot cadence a lost partial tick is also visible in the
metas errors ledger on the next pass.

At scale: the landing dir is object storage partitioned by arrival;
``maxFilesPerTrigger`` bounds batch size; the snapshot transform itself
is unchanged batch code (one code path for both modes).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.snapshot import snapshot
from ..specs import DatasourceSpec
from ..storage import Warehouse


def ingest_stream(
    wh: Warehouse,
    spec: DatasourceSpec,
    landing_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and with ``available_now`` drain) a streaming ingest of
    ``landing_dir`` parquet drops into the datasource's current tables.

    Returns the StreamingQuery.  Each micro-batch dispatches the batch
    ``snapshot`` operator once per srvid present in the batch, preserving
    the reference's per-server snapshot semantics."""
    reader = (
        wh.spark.readStream.schema(spec.staging_schema)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    if watermark:
        stream = stream.withWatermark("ts", watermark)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.cache()
        try:
            srvids = [r.srvid for r in batch.select("srvid").distinct().collect()]
            for srvid in sorted(srvids):
                snapshot(
                    wh,
                    spec,
                    srvid,
                    capture=batch.filter(F.col("srvid") == srvid),
                    drop_staging=False,
                )
        finally:
            batch.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query, timeout_s: int = 300) -> None:
    """Block until an availableNow query finishes processing."""
    query.awaitTermination(timeout_s)
