"""Bucketed at-rest layout guardrails (layout.py): co-bucketed tables
join and aggregate with ZERO Exchange — the Spark-native analog of the
reference's btree-indexed history tables (powa--5.2.0.sql:700-907),
and the shuffle eliminated at 100 TB for fact-fact joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from powa_archivist_spark import layout
from powa_archivist_spark.plans import inspect as pi

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cobucketed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    ld, le = layout.cobucket_pair(
        docs, emb, "doc_id", "t_docs_b", "t_emb_b", n_buckets=8
    )
    yield ld, le
    layout.drop_table(spark, "t_docs_b")
    layout.drop_table(spark, "t_emb_b")


def test_cobucketed_join_has_no_exchange(spark, cobucketed):
    ld, le = cobucketed
    # hint past the broadcast path (at real scale neither side broadcasts)
    j = ld.hint("merge").join(le.hint("merge"), "doc_id").select(
        "doc_id", "lang", "label"
    )
    assert pi.exchange_count(j) == 0
    assert pi.sort_merge_join_count(j) == 1
    assert j.count() == ld.count()  # 1:1 keys — and the join actually runs


def test_bucketed_groupby_has_no_exchange(spark, cobucketed):
    ld, _ = cobucketed
    agg = ld.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert pi.exchange_count(agg) == 0
    assert agg.count() == ld.count()


def test_mismatched_bucket_counts_still_correct(spark, cobucketed):
    """A non-bucketed side degrades to a shuffle, never to wrong rows."""
    ld, _ = cobucketed
    plain = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    j = ld.hint("merge").join(plain.hint("merge"), "doc_id")
    assert j.count() == ld.count()
    assert pi.exchange_count(j) >= 1
