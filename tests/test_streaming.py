"""Streaming ingest: landing-zone drops flow through the SAME batch
snapshot operator via foreachBatch, with checkpointed exactly-once
file-level semantics (a second availableNow run reprocesses nothing).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from powa_archivist_spark.specs import PG_STAT_BGWRITER
from powa_archivist_spark.storage import Warehouse
from powa_archivist_spark.streaming.ingest import drain, ingest_stream

from .conftest import ts

SPEC = PG_STAT_BGWRITER


def _drop(spark, landing, name, rows):
    df = spark.createDataFrame(rows, SPEC.staging_schema)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(landing, name))


def test_stream_ingest_exactly_once(spark, wh):
    landing = tempfile.mkdtemp(prefix="landing_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    root = os.path.join(landing, "drops")
    os.makedirs(root)

    # srvid 1 and 2 in one drop — per-server dispatch inside the batch
    _drop(spark, root, "b0", [
        (1, ts(0), 110, 50, 105, 10, 200),
        (2, ts(0), 210, 50, 205, 10, 400),
    ])
    q = ingest_stream(wh, SPEC, root + "/*", ckpt)
    drain(q)
    cur = wh.read(Warehouse.current(SPEC.name))
    assert cur.count() == 2
    assert {r.srvid for r in cur.select("srvid").collect()} == {1, 2}

    # second drop: only the new file is processed
    _drop(spark, root, "b1", [(1, ts(5), 120, 55, 110, 12, 220)])
    q = ingest_stream(wh, SPEC, root + "/*", ckpt)
    drain(q)
    assert wh.read(Warehouse.current(SPEC.name)).count() == 3

    # re-run with NO new data: checkpoint prevents any reprocessing
    q = ingest_stream(wh, SPEC, root + "/*", ckpt)
    drain(q)
    cur = wh.read(Warehouse.current(SPEC.name))
    assert cur.count() == 3
    # per-srvid series intact and usable by the read operators
    s1 = cur.filter(F.col("srvid") == 1).orderBy("ts").collect()
    assert [r.buffers_alloc for r in s1] == [200, 220]
