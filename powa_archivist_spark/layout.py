"""At-rest bucketed layout — shuffle-free co-located joins.

The reference encodes its physical expectations as btree indexes on the
history tables (powa--5.2.0.sql:700-907: every `*_history` table is keyed
(srvid, <entity>, ts-range)); Postgres then merge/index-joins without
re-sorting.  The Spark-native analog is BUCKETING: write both sides of a
hot join pre-hash-partitioned on the join key into a catalog table, and
every later equi-join on that key runs with ZERO Exchange — the single
biggest shuffle eliminated at 100 TB, where the fact-fact join (e.g.
statements-history x wait-sampling-history on queryid, or a doc table x
its embedding table on doc_id) would otherwise reshuffle petabytes on
every query.

Scale notes:
- pick ``n_buckets`` so one bucket of the LARGER table fits a task
  (~128-512 MB); both sides MUST use the same count or Spark falls back
  to shuffling the smaller side;
- ``sortBy`` the in-bucket order (ts) so merge-ish reads and range scans
  avoid per-task sorts;
- bucket pruning: an equality filter on the bucket key scans 1/n of the
  files (visible as ``SelectedBucketsCount`` in the scan node).

Bucketed writes go through ``saveAsTable`` (the bucket metadata lives in
the session catalog, not the parquet footer), so this module manages
catalog tables, unlike storage.Warehouse's plain directory tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed catalog table (parquet files hash-
    partitioned on ``bucket_cols`` into ``n_buckets``, each file sorted
    by ``sort_cols``)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (the bucket spec rides along, so
    joins/aggs on the bucket key skip their Exchange)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def cobucket_pair(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_table: str,
    right_table: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Materialize two DataFrames co-bucketed on ``key`` (same bucket
    count — the co-location contract) and return the catalog-backed
    reads; equi-joins between them on ``key`` are then exchange-free."""
    spark = left.sparkSession
    write_bucketed(left, left_table, [key], n_buckets, sort_cols)
    write_bucketed(right, right_table, [key], n_buckets, sort_cols)
    return read_bucketed(spark, left_table), read_bucketed(spark, right_table)
