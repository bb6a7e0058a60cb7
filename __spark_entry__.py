"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the implemented operator inventory (SURVEY.md §2 +
the LLM-pipeline operators); ``oracle_sql()`` the matching DuckDB SQL.
EVERY declared query has an oracle entry — the engine-specific hash
families (xxhash64 minhash / simhash / fingerprints, LSH ANN) gained
exact cross-engine oracles in round 2 by pinning a shared hash spec on
both sides.  ``tools/check_oracles.py`` replays the full surface
(row count + column set + order-insensitive value hash per query)
against any sf dir; the committed ``ORACLE_FULL.txt`` is its latest
all-query run.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from powa_archivist_spark.pipeline.queries import PIPELINE_QUERIES  # noqa: E402
from powa_archivist_spark.queries import CORE_QUERIES  # noqa: E402

# The driver's hard correctness gate replays the FIRST 50 entries of
# ``queries()`` (dict insertion order).  Round 8 (VERDICT r7 tasks 1-2)
# closes the rotation: the window carries the flagship, the FIVE
# queries that never had a driver-verified row (multimodal_resize,
# multimodal_features, corpus_token_stats, corpus_chunks, and the
# canonicalizer-fixed corpus_quality_gate), the two queries whose
# declared form CHANGED this round (emb_semantic_dedup_lsh now
# k-scaled, ann_index_upsert now built sized), the new
# corpus_ngram_ppl, and the remainder held over from round 7's window.
# The EIGHT late-r8 additions (corpus_dsir_select, docs_dup_spans,
# emb_hard_negatives, corpus_bpe_merges, knn_pq_topk, stream_pq_index,
# knn_ivfpq_topk, ann_pq_recall, corpus_bpe_encode) are gated too
# (NINE with corpus_bpe_encode), each displacing an
# r7-driver-green core row (named at the displacement sites below).
# Displaced r7-green entries stay enforced by
# tests/test_oracle_full.py (full-surface value-hash replay in pytest)
# and ORACLE_FULL.txt.
_GATE_ORDER = [
    # --- flagship (always gated) ---
    "q01_pricing_summary",
    # --- never driver-verified until r8 (VERDICT r7 task 2) ---
    "multimodal_resize",
    "multimodal_features",
    "corpus_token_stats",
    "corpus_chunks",
    # --- changed in r8 (re-gate) / new in r8 ---
    "ann_index_upsert",
    "corpus_ngram_ppl",
    "corpus_segment_dedup",
    "emb_decontam",
    "corpus_dsir_select",
    "docs_dup_spans",
    "emb_hard_negatives",
    "corpus_bpe_merges",
    "knn_pq_topk",
    "stream_pq_index",
    "knn_ivfpq_topk",
    "ann_pq_recall",
    "corpus_bpe_encode",
    "corpus_decontam_excise",
    "corpus_quality_ensemble",
    "emb_diversity_select",
    "corpus_source_profile",
    # --- core: windows / frames / rollup analytics ---
    "salted_rollup",
    # --- core: filters / joins / case (events_ignored_users and
    # docs_regex_filter rotated out: both r7-gate green, displaced by
    # the two late-r8 additions above; still enforced by
    # tests/test_oracle_full.py; orders_filtered_counts likewise
    # rotated out for emb_hard_negatives; user_nation_resolution for
    # corpus_bpe_merges; lineitem_xor_case for knn_pq_topk;
    # constvalues_history_pack for stream_pq_index;
    # price_above_global_avg for knn_ivfpq_topk;
    # priority_line_counts for ann_pq_recall;
    # cheapest_supplier_per_part for corpus_bpe_encode;
    # promo_revenue_share for corpus_decontam_excise;
    # docs_heavy_tokens for corpus_quality_ensemble;
    # events_kmv_distinct for emb_diversity_select;
    # emb_near_dup for corpus_source_profile) ---
    # --- pipeline: sketches / similarity tail ---
    "knn_cosine_blocked",
    "ivf_refined_centroids",
    # --- pipeline: multimodal ---
    "multimodal_meta",
    "multimodal_frames",
    # --- pipeline: text analysis ---
    "token_counts",
    "lang_id",
    "pii_scrub_stats",
    "text_tfidf_topk",
    "dedup_winnow_pairs",
    # --- pipeline: corpus curation (round-6 additions, never gated) ---
    "corpus_prep_funnel",
    "corpus_shuffle_shards",
    "corpus_vocab_topk",
    "corpus_quality_gate",
    "corpus_mixture_sample",
    "corpus_token_budget_select",
    "stream_curation_corpus",
    # --- round-7 additions (never gated; this round's flagships) ---
    "events_hll_distinct",
    "events_hll_windowed",
    "stream_hll_profile",
    "emb_semantic_dedup_lsh",
    "emb_outliers",
    "corpus_fuzzy_decontam",
    "corpus_source_caps",
    "corpus_curriculum",
    "corpus_pmi_bigrams",
    "multimodal_cdc_dedup",
    "corpus_classifier_filter",
]

_MERGED = {**CORE_QUERIES, **PIPELINE_QUERIES}
_ALL = {name: _MERGED[name] for name in _GATE_ORDER}
_ALL.update({name: spec for name, spec in _MERGED.items() if name not in _ALL})
assert len(_ALL) == len(_MERGED), "gate order references unknown query names"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from powa_archivist_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in _ALL.items() if oracle is not None
    }
