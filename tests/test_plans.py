"""Plan-shape guardrails: these pin the physical properties the engine
depends on at scale — filter pushdown to parquet, column pruning,
broadcast dimension joins, range-predicate pushdown on packed history.
A regression here is a performance bug even while results stay correct.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from powa_archivist_spark.functions.packing import pack, unpack
from powa_archivist_spark.plans import inspect as pi
from powa_archivist_spark.queries import (
    EVENTS_SPEC,
    _events_as_series,
    events_range_read,
    q05_nation_volume,
    user_nation_resolution,
)
from powa_archivist_spark.storage import Warehouse

SF = "/root/testdata/sf0.001"


def test_range_read_pushdown_and_pruning(spark):
    df = events_range_read(spark, SF)
    pushed = " ".join(pi.pushed_filters(df))
    assert "ts" in pushed and "event_type" in pushed
    # projection reaches the scan: only the 5 selected columns are read
    (schema,) = pi.read_schemas(df)
    assert set(schema) == {"event_id", "ts", "user_id", "event_type", "value"}


def test_star_join_broadcasts_all_dims(spark):
    df = q05_nation_volume(spark, SF)
    assert pi.broadcast_join_count(df) == 4  # orders/customer/supplier/nation
    assert not pi.has_cartesian(df)
    # one fact-side shuffle for the final groupBy, nothing else
    assert pi.exchange_count(df) <= 2


def test_dim_resolution_broadcasts(spark):
    df = user_nation_resolution(spark, SF)
    assert pi.broadcast_join_count(df) >= 1
    assert pi.sort_merge_join_count(df) == 0


def test_packed_history_range_pushdown(spark, wh):
    """The two-phase unpack-read pushes the range-overlap predicate into
    the parquet scan of the PACKED table — the Spark analog of the
    reference's GiST range index (powa--5.2.0.sql:2123)."""
    packed = pack(_events_as_series(spark, SF), EVENTS_SPEC)
    wh.overwrite(packed, "events_history", partition_by=["srvid"])
    hist = wh.read("events_history")
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-20 00:00:00").cast("timestamp")
    out = unpack(hist, EVENTS_SPEC, lo, hi)
    pushed = " ".join(pi.pushed_filters(out))
    assert "range_start" in pushed and "range_end" in pushed


def test_ivf_assignment_is_aggregation_not_window(spark):
    """IVF cell assignment must collapse the corpus x centroids scoring
    with a map-side-combinable max_by aggregation — a row_number window
    here shuffles and sorts K x the corpus (the round-1 anti-pattern)."""
    from powa_archivist_spark.pipeline import similarity

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    _, assign = similarity.ivf_assign(emb)
    assert pi.window_count(assign) == 0
    assert not pi.has_cartesian(assign)


def test_doc_fingerprint_single_shuffle(spark):
    """explode -> min/max agg: one hash-aggregate shuffle, no nested
    array_min/array_max double materialization."""
    from powa_archivist_spark.pipeline import textstats

    docs = spark.read.parquet(SF + "/documents.parquet")
    df = textstats.doc_fingerprint(docs)
    assert pi.exchange_count(df) == 1


def test_minhash_verify_reuses_cached_shingles(spark):
    """The verify stage must read the shingle frame from cache, not
    recompute the shingling scan per join side."""
    from powa_archivist_spark.pipeline import dedup

    docs = spark.read.parquet(SF + "/documents.parquet")
    df = dedup.minhash_dedup_pairs(docs)
    plan = pi.plan_string(df)
    assert "InMemoryTableScan" in plan


def test_rollup_single_shuffle(spark):
    """Per-db rollup = exactly one hash shuffle (partial aggregation
    map-side); a second exchange would double network at scale."""
    ev = _events_as_series(spark, SF)
    rollup = ev.groupBy("srvid", "user_id").agg(
        F.sum("value_cents").alias("v"), F.count(F.lit(1)).alias("n")
    )
    assert pi.exchange_count(rollup) == 1
    # map-side combine before the shuffle (partial aggregation)
    assert "partial_sum" in pi.plan_string(rollup)


def test_pack_sequences_single_exchange(spark):
    """Window (shard partitioning) + per-bin groupBy share ONE shuffle:
    HashPartitioning(shard) satisfies the (shard, bin_id) clustering, so
    the aggregation runs partition-local after the window."""
    from powa_archivist_spark.pipeline.corpus import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = pack_sequences(docs, seq_len=1024)
    assert pi.exchange_count(df) == 1
    (schema,) = pi.read_schemas(df)
    assert set(schema) == {"doc_id", "text", "lang"}  # pruned scan


def test_corpus_prep_lang_filter_pushed(spark):
    """The funnel's cheapest gate (lang) reaches the parquet scan."""
    from powa_archivist_spark.pipeline.corpus import corpus_prep

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = corpus_prep(docs)
    pushed = " ".join(pi.pushed_filters(df))
    assert "lang" in pushed
    assert not pi.has_cartesian(df)


def test_stratified_sample_no_shuffle(spark):
    """Hash-based sampling is a pure filter: zero exchanges, zero
    windows — re-runnable on appended data without touching the rest."""
    from powa_archivist_spark.pipeline.corpus import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = stratified_sample(docs, {"en": 0.5})
    assert pi.exchange_count(df) == 0
    assert pi.window_count(df) == 0


def test_stat_get_sample_single_window_shuffle(spark, wh):
    """row_number + count + lag all share the per-entity partitioning:
    exactly one exchange in the sampled-rates read."""
    from powa_archivist_spark.queries import events_sampled_rates

    df = events_sampled_rates(spark, SF)
    assert pi.exchange_count(df) == 1
