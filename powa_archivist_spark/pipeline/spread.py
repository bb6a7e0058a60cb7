"""Scan-parallelism floor for CPU-heavy per-row stages (r13, guide
§2.5 input skew / §6 input splits).

A bounded corpus that arrives as ONE parquet row group is ONE Spark
split — row groups are indivisible to the reader, so
``spark.sql.files.minPartitionNum`` cannot split it either — and every
tokenize / shingle / gram-explode / hash stage that follows runs on a
single core while the rest of the cluster idles.  ``spread`` hash-
repartitions such an input up to cluster parallelism BEFORE the heavy
map work, keyed on the unique id column so the placement is
deterministic under task retries (guide §2.5 on rand-derived keys:
retried round-robin tasks can duplicate or lose rows; a hash of the id
cannot).

At scale this is a no-op: the scan already yields >= parallelism
splits, the probe reads plan metadata (no job), and no exchange is
added.  The probe-then-repartition shape is shared with the ANN
scoring fan-out (pipeline/similarity.py) — this module is the common
home so the text stack can use it without importing similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` up to cluster parallelism when its plan
    currently yields fewer partitions; identity otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))
